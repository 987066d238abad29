package graft.layout

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

class BucketStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def newestMtime(dir: String): Long = {
    val p = Paths.get(dir)
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .map((f: Path) => Files.getLastModifiedTime(f).toMillis).max
    finally s.close()
  }

  test("build-once: fresh stamp skips the rewrite; dropped catalog entry is re-registered over the existing bucket files") {
    val (o1, l1) = BucketStore.ensureBuilt(spark, sf)
    val dest = BucketStore.defaultDir(sf)
    val built = newestMtime(dest)
    val n1 = spark.table(o1).count()

    // same session, fresh stamp → no rewrite
    BucketStore.ensureBuilt(spark, sf)
    assert(newestMtime(dest) == built, "fresh store was rewritten")

    // simulate a new session: catalog entry gone, files remain →
    // register path must re-attach WITH the bucket spec
    spark.sql(s"DROP TABLE IF EXISTS $o1")
    spark.sql(s"DROP TABLE IF EXISTS $l1")
    val (o2, _) = BucketStore.ensureBuilt(spark, sf)
    assert(newestMtime(dest) == built, "re-register rewrote the files")
    assert(spark.table(o2).count() == n1)
    val ddl = spark.sql(s"DESCRIBE TABLE EXTENDED $o2").collect()
      .map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(ddl.contains("Num Buckets") && ddl.contains("8"),
      s"re-registered table lost its bucket spec:\n$ddl")
  }
}
