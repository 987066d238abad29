package graft.multimodal

import graft.SparkSpec

class MediaStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("builds once, serves from parquet after; stale stamp rebuilds") {
    val root = java.nio.file.Files.createTempDirectory("mediastore").toString
    var builds = 0
    def ensure() = {
      // GRAFT_MEDIA_STORE_ROOT is fixed for the JVM, so isolate this run
      // under a unique store NAME instead and assert build-count semantics
      MediaStore.ensure(spark, sf, s"spec-${root.hashCode.abs}") {
        builds += 1
        Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4, 5))).toDF("id", "blob")
      }
    }
    val first = ensure().collect().map(r => r.getLong(0)).sorted
    assert(first.toSeq == Seq(1L, 2L) && builds == 1)
    // second call must NOT rebuild — served from the persisted parquet
    val second = ensure().collect().map(r => r.getLong(0)).sorted
    assert(second.toSeq == Seq(1L, 2L) && builds == 1)
    // a missing/invalid stamp forces a rebuild (the stamp is written
    // AFTER the data, so a torn build can never present as fresh)
    val dest = new java.io.File("target/media-store-v1/" +
      s"spec-${root.hashCode.abs}/" + sf.replaceAll("[^A-Za-z0-9.]+", "_"))
    val stampFile = new java.io.File(dest, "source_stamp.txt")
    assert(stampFile.exists)
    stampFile.delete()
    ensure()
    assert(builds == 2)
  }
}
