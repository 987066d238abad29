package graft.similarity

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted-hyperparameter contract (round-13 verdict item 1): ANN
  * store build parameters live in the store's `params.txt`, written by
  * the build and read back by every append/probe — builder and prober
  * can never disagree, and a store without metadata refuses to serve
  * rather than guessing. Plus the packed byte layout's full-ordinal
  * range (0..255), previously a claim exercised only at ksub=8.
  */
class AnnMetaSpec extends SparkSpec {
  import spark.implicits._

  // 16-dim fixture (AnnStoreLifecycleSpec's): 3 loose clusters, ids
  // 0..39; 35 is a near-dup of 2
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(16) { i =>
      val c = seed % 3
      (c - 1).toFloat + 0.08f * ((seed * 31 + i * 7) % 11) + 0.01f * i
    }
  private lazy val all: DataFrame = ((0 until 40).map {
    case 35 => (35L, vec(2).map(x => x + 0.001f))
    case i  => (i.toLong, vec(i))
  }).toDF("vec_id", "embedding")
  private lazy val base = all.filter(col("vec_id") < 32)
  private lazy val batch = all.filter(col("vec_id") >= 32)

  test("AnnMeta round-trips; a store without params.txt refuses loudly") {
    val dest = Files.createTempDirectory("graft-annmeta").toString
    AnnMeta.write(dest, "nCentroids" -> 64, "m" -> 8, "ksub" -> 256)
    assert(AnnMeta.read(dest) ==
      Map("nCentroids" -> 64, "m" -> 8, "ksub" -> 256))
    assert(AnnMeta.readKey(dest, "ksub") == 256)
    val bare = Files.createTempDirectory("graft-annmeta-bare").toString
    val e = intercept[IllegalArgumentException](AnnMeta.read(bare))
    assert(e.getMessage.contains("params.txt") &&
      e.getMessage.contains("rebuild"))
    val mixed = intercept[IllegalArgumentException](
      AnnMeta.readKey(dest, "nprobe"))
    assert(mixed.getMessage.contains("nprobe"))
    // a malformed line names the store and the line (never an opaque
    // MatchError / NumberFormatException without the path context)
    val corrupt = Files.createTempDirectory("graft-annmeta-corrupt").toString
    Files.createDirectories(Paths.get(corrupt))
    Files.writeString(Paths.get(corrupt, AnnMeta.File), "nCentroids=8\nm\n")
    val bad = intercept[IllegalArgumentException](AnnMeta.read(corrupt))
    assert(bad.getMessage.contains(corrupt) && bad.getMessage.contains("'m'"))
    Files.writeString(Paths.get(corrupt, AnnMeta.File), "ksub=many\n")
    val nonInt = intercept[IllegalArgumentException](AnnMeta.read(corrupt))
    assert(nonInt.getMessage.contains("ksub=many"))
  }

  test("PqStore: append and probe follow the BUILDER's params (m=4 on a " +
      "16-dim fixture), not the object defaults") {
    val dest = Files.createTempDirectory("graft-pq-params").toString
    PqStore.buildAt(dest, base, m = 4, ksub = 4)
    assert(AnnMeta.read(dest) == Map("m" -> 4, "ksub" -> 4))
    // the append encodes in the builder's m=4 space: 4-byte codes, not
    // the default 8 (which would also crash on sd mismatch)
    PqStore.appendBatch(spark, dest, batch)
    val lens = spark.read.parquet(s"$dest/codes.parquet")
      .filter(col("vid") >= 32)
      .select(length(col("code"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(4), s"appended code byte-lengths under m=4: $lens")
    // probe serves through the same persisted m and finds the near-dup
    val top = PqStore.topKAt(spark, dest, all, queryId = 2L, k = 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(top.contains(35L), s"m=4 store missed the near-dup: $top")
  }

  test("IvfPqStore.buildAtWithCents: explicit (trained) centroids become " +
      "the persisted coarse quantizer; nCentroids from the frame") {
    val dest = Files.createTempDirectory("graft-ivfpq-cents").toString
    val cents = Similarity.kmeansCentroids(base, "vec_id", "embedding",
      k = 3, iters = 2)
    IvfPqStore.buildAtWithCents(dest, base, cents, m = 4, ksub = 4)
    val meta = AnnMeta.read(dest)
    assert(meta("nCentroids") == 3 && meta("m") == 4 && meta("ksub") == 4)
    // the byid bucket width is index identity too — persisted with the
    // rest so appends and point reads can never disagree with the build
    assert(meta.contains("byidWidth") && meta.contains("byidBuckets"))
    // append assigns against the PERSISTED Lloyd centroids (no seed-id
    // aliasing — no data row is a centroid here) and the near-dup serves
    IvfPqStore.appendBatch(spark, dest, batch)
    val top = IvfPqStore.topKAt(spark, dest, all, queryId = 2L, k = 3,
        rerank = 8)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(top.contains(35L), s"Lloyd-centroid store missed the near-dup: $top")
    // nprobe capped by the store's OWN metadata, not a global constant
    val bad = intercept[IllegalArgumentException](
      IvfPqStore.topKAt(spark, dest, all, queryId = 2L, k = 3, nprobe = 4))
    assert(bad.getMessage.contains("nprobe"))
  }

  test("packed byte codes round-trip the FULL unsigned ordinal range " +
      "(0..255) — the ksub=256 layout claim, exercised") {
    graft.expressions.GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT graft_bytes_u8(graft_u8_bytes(array(0, 1, 127, 128, 200,
        |  254, 255, 64))) AS u""".stripMargin)
      .collect().head.getSeq[Int](0).toSeq
    assert(out == Seq(0, 1, 127, 128, 200, 254, 255, 64),
      s"byte pack/unpack mangled high ordinals: $out")
  }

  test("params survive the whole lifecycle at a non-default config: " +
      "upsert and delete encode in the builder's space, compact purges " +
      "and leaves params.txt intact") {
    val dest = Files.createTempDirectory("graft-pq-lifecycle-params").toString
    PqStore.buildAt(dest, base, m = 4, ksub = 4)
    PqStore.appendBatch(spark, dest, batch)
    // edit 35 far away from 2 — the re-encode must run at the BUILDER's
    // m=4 (a default-m=8 encode would write 8-byte codes and desync sd)
    val moved = Seq((35L, vec(7).map(x => x + 0.002f))).toDF("vec_id", "embedding")
    PqStore.upsertBatch(spark, dest, moved)
    val allEdited = all.filter(col("vec_id") =!= 35L).unionAll(moved)
    val top = PqStore.topKAt(spark, dest, allEdited, queryId = 2L, k = 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(!top.contains(35L), s"edited-away vector still served: $top")
    PqStore.deleteIds(spark, dest, Seq(34L))
    PqStore.compact(spark, dest)
    assert(AnnMeta.read(dest) == Map("m" -> 4, "ksub" -> 4),
      "compact must leave the persisted hyperparameters intact")
    assert(spark.read.parquet(s"$dest/codes.parquet")
      .filter(col("vid") === 34L).count() == 0, "delete not purged")
    val lens = spark.read.parquet(s"$dest/codes.parquet")
      .select(length(col("code"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(4), s"post-compact code byte-lengths under m=4: $lens")
  }

  test("a pre-params store (no params.txt) cannot be probed or appended") {
    val dest = Files.createTempDirectory("graft-pq-preparams").toString
    PqStore.buildAt(dest, base, m = 4, ksub = 4)
    Files.delete(Paths.get(dest, AnnMeta.File))
    val e = intercept[IllegalArgumentException](
      PqStore.topKAt(spark, dest, all, queryId = 2L, k = 3))
    assert(e.getMessage.contains("params.txt"))
  }
}
