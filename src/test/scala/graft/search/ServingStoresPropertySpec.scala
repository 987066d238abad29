package graft.search

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property contract for the serving layouts: a posting-store probe must
  * equal `array_contains` over the source rows, and a timeline probe
  * must equal an FK equality filter — for ANY generated data, any key
  * (present, absent, special characters), and any bucket count. Fixed
  * seeds ([[graft.operators.PropertySpec]] convention).
  */
class ServingStoresPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))

  private val tagGen: Gen[String] = Gen.oneOf(
    "jobs", "perf", "häshtag", "a b", "", "0", "x" * 40, "ünïcode☂")

  private val rowsGen: Gen[List[(Long, List[String])]] =
    Gen.listOfN(40, for {
      id <- Gen.chooseNum(0L, 500L)
      nTags <- Gen.chooseNum(0, 4)
      tags <- Gen.listOfN(nTags, tagGen)
    } yield (id, tags))

  test("postingProbe(tag) ≡ array_contains(source, tag) for any data/key/buckets") {
    samples(Gen.zip(rowsGen, Gen.oneOf(1, 3, 64)), 6).foreach {
      case (rows, buckets) =>
        val df = rows.toDF("id", "tags")
        val dest = java.nio.file.Files
          .createTempDirectory("graft-post-prop").toString
        ServingStores.buildPostings(df, col("tags"), dest, buckets = buckets)
        (samples(tagGen, 6) :+ "never-present").distinct.foreach { tag =>
          val probed = ServingStores.postingProbe(spark, dest, tag)
            .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
          val expected = df.filter(array_contains(col("tags"), tag))
            .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
          assert(probed == expected,
            s"tag '$tag' buckets=$buckets: $probed != $expected")
        }
        StoreAdmin.truncate(dest)
    }
  }

  test("appendPostings: probe over base+appended ≡ array_contains over " +
      "the union; truncate+rebuild unaffected") {
    val base = Seq((1L, List("jobs", "perf")), (2L, List("jobs")))
      .toDF("id", "tags")
    val batch = Seq((3L, List("jobs", "new")), (4L, List("new")))
      .toDF("id", "tags")
    val dest = java.nio.file.Files
      .createTempDirectory("graft-post-append").toString
    ServingStores.buildPostings(base, col("tags"), dest, buckets = 3)
    ServingStores.appendPostings(batch, col("tags"), dest)
    val union = base.unionAll(batch)
    for (tag <- Seq("jobs", "perf", "new", "absent")) {
      val probed = ServingStores.postingProbe(spark, dest, tag)
        .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      val expected = union.filter(array_contains(col("tags"), tag))
        .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(probed == expected, s"tag '$tag': $probed != $expected")
    }
    // append uses the STORE's bucket count, not a caller guess: a probe
    // for an appended-only key still prunes to one bucket directory
    val plan = ServingStores.postingProbe(spark, dest, "new")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"))
    // lifecycle: truncate forgets base AND appended
    StoreAdmin.truncate(dest)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dest)))
  }

  test("compactPostings: append×3 → compact ≡ fresh rebuild (probe rows " +
      "identical), file count bounded back to O(buckets)") {
    val batches = (0 until 4).map(b =>
      Seq((b * 10L + 1, List("jobs", s"b$b")), (b * 10L + 2, List("jobs")))
        .toDF("id", "tags"))
    val dest = java.nio.file.Files
      .createTempDirectory("graft-post-compact").toString
    val fresh = java.nio.file.Files
      .createTempDirectory("graft-post-fresh").toString
    ServingStores.buildPostings(batches.head, col("tags"), dest, buckets = 3)
    batches.tail.foreach(b =>
      ServingStores.appendPostings(b, col("tags"), dest))
    val appendedFiles = ServingStores.dataFileCount(dest)
    ServingStores.compactPostings(spark, dest)
    val compactFiles = ServingStores.dataFileCount(dest)
    assert(compactFiles < appendedFiles,
      s"compaction must shrink the file count ($appendedFiles -> $compactFiles)")
    assert(compactFiles <= 3, s"post-compact files $compactFiles > buckets")
    // compacted store ≡ a store freshly built from the unioned source
    ServingStores.buildPostings(batches.reduce(_ unionAll _), col("tags"),
      fresh, buckets = 3)
    for (tag <- Seq("jobs", "b0", "b3", "absent")) {
      val a = ServingStores.postingProbe(spark, dest, tag)
        .collect().map(_.toString).sorted.toSeq
      val b = ServingStores.postingProbe(spark, fresh, tag)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"tag '$tag': compacted $a != fresh $b")
    }
    // the staleness stamp survives compaction (compaction does not change
    // the source generation the store was built from)
    graft.util.Stamp.write(dest, "stamp-x")
    ServingStores.compactPostings(spark, dest)
    assert(graft.util.Stamp.isFresh(dest, "stamp-x"))
    StoreAdmin.truncate(dest); StoreAdmin.truncate(fresh)
  }

  test("compactHotBuckets: only fragmented buckets are rewritten — cold " +
      "bucket files byte-untouched, hot buckets folded to one file, " +
      "probe ≡ fresh rebuild, stamp survives") {
    // one-bucket-per-key layout so appends fragment ONLY the keys they
    // carry: "hot" appears in every batch, "cold" only in the base
    val batches = (0 until 4).map(b =>
      Seq((b * 10L + 1, List("hot")) ) ++
        (if (b == 0) Seq((100L, List("cold"))) else Nil))
      .map(_.toDF("id", "tags"))
    val dest = java.nio.file.Files
      .createTempDirectory("graft-post-hot").toString
    ServingStores.buildPostings(batches.head, col("tags"), dest,
      buckets = 64)
    batches.tail.foreach(b =>
      ServingStores.appendPostings(b, col("tags"), dest))
    def filesOf(b: Int): Seq[String] = {
      val dir = java.nio.file.Paths.get(dest, s"__bucket=$b")
      if (!java.nio.file.Files.isDirectory(dir)) Seq.empty
      else {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .map(p => s"${p.getFileName}:${java.nio.file.Files.size(p)}")
          .toSeq.sorted
        finally s.close()
      }
    }
    val hotBucket = (0 until 64)
      .filter(b => ServingStores.bucketFileCount(dest, b) >= 2)
    assert(hotBucket.nonEmpty, "fixture built no fragmented bucket")
    val coldBuckets = (0 until 64)
      .filter(b => ServingStores.bucketFileCount(dest, b) == 1)
    val coldBefore = coldBuckets.map(b => b -> filesOf(b)).toMap

    graft.util.Stamp.write(dest, "stamp-hot")
    val compacted = ServingStores.compactHotBuckets(spark, dest,
      minFiles = 2)
    assert(compacted.sorted == hotBucket.sorted,
      s"compacted $compacted, expected $hotBucket")
    hotBucket.foreach(b => assert(
      ServingStores.bucketFileCount(dest, b) == 1,
      s"hot bucket $b not folded to one file"))
    coldBuckets.foreach(b => assert(filesOf(b) == coldBefore(b),
      s"cold bucket $b files changed"))
    assert(graft.util.Stamp.isFresh(dest, "stamp-hot"),
      "stamp did not survive the selective compact")

    // probe ≡ a store freshly built from the unioned source
    val fresh = java.nio.file.Files
      .createTempDirectory("graft-post-hot-fresh").toString
    ServingStores.buildPostings(batches.reduce(_ unionAll _), col("tags"),
      fresh, buckets = 64)
    for (tag <- Seq("hot", "cold", "absent")) {
      val a = ServingStores.postingProbe(spark, dest, tag)
        .collect().map(_.toString).sorted.toSeq
      val b = ServingStores.postingProbe(spark, fresh, tag)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"tag '$tag': selective-compacted $a != fresh $b")
    }
    // nothing hot anymore: second pass is a no-op
    assert(ServingStores.compactHotBuckets(spark, dest, minFiles = 2).isEmpty)

    // timeline flavor: same fold + equivalence through the fk probe
    val base = Seq((1L, 10, "a"), (2L, 20, "b")).toDF("fk", "seq", "v")
    val batch = Seq((1L, 20, "c")).toDF("fk", "seq", "v")
    val tl = java.nio.file.Files
      .createTempDirectory("graft-tl-hot").toString
    ServingStores.buildTimeline(base, "fk", tl,
      sortCols = Seq(col("seq").desc), buckets = 8)
    ServingStores.appendTimeline(batch, "fk", tl,
      sortCols = Seq(col("seq").desc))
    val tlHot = ServingStores.compactHotTimeline(spark, tl, "fk",
      sortCols = Seq(col("seq").desc), minFiles = 2)
    assert(tlHot.nonEmpty)
    val union = base.unionAll(batch)
    (1L to 2L).foreach { k =>
      val probed = ServingStores.timelineProbe(spark, tl, "fk", k)
        .collect().map(_.toString).sorted.toSeq
      val expected = union.filter(col("fk") === k)
        .collect().map(_.toString).sorted.toSeq
      assert(probed == expected, s"fk $k: $probed != $expected")
    }
    StoreAdmin.truncate(dest); StoreAdmin.truncate(fresh)
    StoreAdmin.truncate(tl)
  }

  test("rebucketPostings 3→7→1: probe ≡ array_contains across every " +
      "rebucket; appenders pick up the new count") {
    val base = Seq((1L, List("jobs", "perf")), (2L, List("jobs", "x")),
      (3L, List("perf"))).toDF("id", "tags")
    val dest = java.nio.file.Files
      .createTempDirectory("graft-post-rebucket").toString
    ServingStores.buildPostings(base, col("tags"), dest, buckets = 3)
    def check(src: org.apache.spark.sql.DataFrame): Unit =
      for (tag <- Seq("jobs", "perf", "x", "late", "absent")) {
        val probed = ServingStores.postingProbe(spark, dest, tag)
          .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
        val expected = src.filter(array_contains(col("tags"), tag))
          .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
        assert(probed == expected, s"tag '$tag': $probed != $expected")
      }
    ServingStores.rebucketPostings(spark, dest, 7)
    check(base)
    // an append AFTER the rebucket must split keys with the new count
    val batch = Seq((9L, List("late", "jobs"))).toDF("id", "tags")
    ServingStores.appendPostings(batch, col("tags"), dest)
    check(base.unionAll(batch))
    ServingStores.rebucketPostings(spark, dest, 1)
    check(base.unionAll(batch))
    StoreAdmin.truncate(dest)
  }

  test("timeline lifecycle: append + compact + rebucket ≡ fk filter over " +
      "the union, within-bucket (fk, sort) order restored by compact") {
    val base = Seq((1L, 10, "a"), (1L, 30, "b"), (2L, 20, "c"))
      .toDF("fk", "seq", "v")
    val batch = Seq((1L, 20, "d"), (3L, 5, "e")).toDF("fk", "seq", "v")
    val dest = java.nio.file.Files
      .createTempDirectory("graft-tl-life").toString
    ServingStores.buildTimeline(base, "fk", dest,
      sortCols = Seq(col("seq").desc), buckets = 4)
    ServingStores.appendTimeline(batch, "fk", dest,
      sortCols = Seq(col("seq").desc))
    val union = base.unionAll(batch)
    def check(): Unit = (1L to 4L).foreach { k =>
      val probed = ServingStores.timelineProbe(spark, dest, "fk", k)
        .collect().map(_.toString).sorted.toSeq
      val expected = union.filter(col("fk") === k)
        .collect().map(_.toString).sorted.toSeq
      assert(probed == expected, s"fk $k: $probed != $expected")
    }
    check()
    ServingStores.compactTimeline(spark, dest, "fk",
      sortCols = Seq(col("seq").desc))
    check()
    assert(ServingStores.dataFileCount(dest) <= 4)
    ServingStores.rebucketTimeline(spark, dest, "fk", 2,
      sortCols = Seq(col("seq").desc))
    check()
    StoreAdmin.truncate(dest)
  }

  test("q_hashtag_served / q_user_timeline_served stay value-identical " +
      "when their stores are built by an append+compact cycle instead of " +
      "one shot (round-11 verdict item 1's driver-query criterion)") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-cycle").toString

    // doc postings: 80% base build, 20% appended, then compacted —
    // probed with the EXACT q_hashtag_served query shape
    val docs = graft.util.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        split(col("text"), " ").as("__words"))
    ServingStores.buildPostings(docs.filter(col("doc_id") % 5 =!= 0),
      col("__words"), s"$tmp/postings", dropCols = Seq("__words"))
    ServingStores.appendPostings(docs.filter(col("doc_id") % 5 === 0),
      col("__words"), s"$tmp/postings", dropCols = Seq("__words"))
    ServingStores.compactPostings(spark, s"$tmp/postings")
    def hashtagServed(store: String): Seq[String] =
      ServingStores.postingProbe(spark, store, "spark")
        .orderBy(col("doc_id").asc).limit(1000)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .collect().map(_.toString).toSeq
    assert(hashtagServed(s"$tmp/postings") ==
      hashtagServed(ServingStores.ensureDocPostings(spark, sfDir)))

    // orders timeline: same cycle, probed with the q_user_timeline_served
    // key-set shape
    val orders = graft.util.Tables.orders(spark, sfDir)
    ServingStores.buildTimeline(orders.filter(col("o_orderkey") % 5 =!= 0),
      "o_custkey", s"$tmp/timeline", sortCols = Seq(col("o_orderdate").desc))
    ServingStores.appendTimeline(orders.filter(col("o_orderkey") % 5 === 0),
      "o_custkey", s"$tmp/timeline", sortCols = Seq(col("o_orderdate").desc))
    ServingStores.compactTimeline(spark, s"$tmp/timeline", "o_custkey",
      sortCols = Seq(col("o_orderdate").desc))
    val keys = graft.util.Tables.customer(spark, sfDir)
      .select(col("c_custkey")).limit(3).collect().map(_.getLong(0)).toSeq
    def timelineServed(store: String): Seq[String] =
      ServingStores.timelineProbeMany(spark, store, "o_custkey", keys)
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc).limit(1000)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .collect().map(_.toString).toSeq
    assert(timelineServed(s"$tmp/timeline") ==
      timelineServed(ServingStores.ensureOrdersTimeline(spark, sfDir)))
    StoreAdmin.truncate(s"$tmp/postings")
    StoreAdmin.truncate(s"$tmp/timeline")
  }

  test("degenerate stores: all-empty key arrays build a probeable empty " +
      "store; an empty timeline key set returns a typed empty frame") {
    val noTags = Seq((1L, List.empty[String]), (2L, List.empty[String]))
      .toDF("id", "tags")
    val dest = java.nio.file.Files
      .createTempDirectory("graft-post-empty").toString
    ServingStores.buildPostings(noTags, col("tags"), dest, buckets = 3)
    val probed = ServingStores.postingProbe(spark, dest, "anything")
    assert(probed.columns.toSeq == Seq("id", "tags"))
    assert(probed.count() == 0L)
    StoreAdmin.truncate(dest)

    val facts = Seq((1L, 10)).toDF("fk", "v")
    val tl = java.nio.file.Files
      .createTempDirectory("graft-tl-empty").toString
    ServingStores.buildTimeline(facts, "fk", tl, buckets = 2)
    val none = ServingStores.timelineProbeMany(spark, tl, "fk", Seq.empty)
    assert(none.columns.toSeq == Seq("fk", "v"))
    assert(none.count() == 0L)
    StoreAdmin.truncate(tl)
  }

  test("timelineProbe/Many(fk) ≡ fk filter, multiplicity preserved") {
    val facts = samples(Gen.listOfN(60, for {
      fk <- Gen.chooseNum(0L, 12L)
      v  <- Gen.chooseNum(0, 999)
    } yield (fk, v)), 1).head
    val df = facts.toDF("fk", "v")
    val dest = java.nio.file.Files
      .createTempDirectory("graft-tl-prop").toString
    ServingStores.buildTimeline(df, "fk", dest, buckets = 5)
    (0L to 13L).foreach { k =>
      val probed = ServingStores.timelineProbe(spark, dest, "fk", k)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val expected = df.filter(col("fk") === k)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(probed == expected, s"fk $k: $probed != $expected")
    }
    // multi-key probe = union of single probes (incl. duplicates kept)
    val many = ServingStores.timelineProbeMany(spark, dest, "fk",
        Seq(1L, 5L, 13L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val expMany = df.filter(col("fk").isin(1L, 5L, 13L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(many == expMany)
    StoreAdmin.truncate(dest)
  }
}
