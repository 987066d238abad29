package graft.search

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
