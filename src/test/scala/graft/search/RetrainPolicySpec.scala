package graft.search

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.similarity.IvfStore
import graft.util.StoreLock
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The router-retrain policy's contract ([[RetrainPolicy]]): the
  * appended-mass proxy stays quiet on a store whose router saw every
  * live row, fires once the unseen share crosses the threshold, the
  * triggered rebuild restores the quiet state without changing a
  * single served result, the decision refuses to race a concurrent
  * writer (store lock), and the signal SURVIVES compaction (the reason
  * the train mass is persisted instead of read off `__gen`).
  */
class RetrainPolicySpec extends SparkSpec {
  import spark.implicits._

  // the lifecycle fixture shape: 3 loose clusters, ids 0..39
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(16) { i =>
      val c = seed % 3
      (c - 1).toFloat + 0.08f * ((seed * 31 + i * 7) % 11) + 0.01f * i
    }
  private lazy val all: DataFrame = (0 until 40)
    .map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-retrain-$tag").toString + "/store"

  test("assess: quiet on a clean store, fires past the threshold, and " +
      "the signal survives compaction") {
    val clean = freshDir("clean")
    IvfStore.buildAt(clean, all)
    val d0 = RetrainPolicy.assess(spark, clean)
    assert(d0.trainRows == 40L && d0.liveRows == 40L)
    assert(d0.staleFraction == 0.0 && !d0.retrain)

    val drift = freshDir("drift")
    IvfStore.buildAt(drift, all.filter(col("vec_id") < 32))
    IvfStore.appendBatch(spark, drift, all.filter(col("vec_id") >= 32))
    val d1 = RetrainPolicy.assess(spark, drift)
    assert(d1.trainRows == 32L && d1.liveRows == 40L)
    assert(d1.staleFraction == 0.2 && d1.retrain,
      s"8/40 appended must cross the ${RetrainPolicy.DefaultThreshold} " +
        s"threshold: $d1")

    // compaction folds every row to generation 0 — a __gen-based proxy
    // would read the store as freshly trained; the persisted mass must
    // keep the decision identical
    IvfStore.compact(spark, drift)
    assert(RetrainPolicy.assess(spark, drift) == d1,
      "compaction must not reset the staleness signal")
  }

  test("maybeRetrain: triggers the rebuild, re-records the mass, and " +
      "serves identical results; quiet store never rebuilds") {
    val drift = freshDir("fire")
    IvfStore.buildAt(drift, all.filter(col("vec_id") < 32))
    IvfStore.appendBatch(spark, drift, all.filter(col("vec_id") >= 32))
    val served = rows(IvfStore.topKAt(spark, drift, 2L, 5))

    val before = RetrainPolicy.maybeRetrain(spark, drift)(
      IvfStore.rebuildFromSelf(spark, drift))
    assert(before.retrain, s"drifted fixture must fire: $before")
    val after = RetrainPolicy.assess(spark, drift)
    assert(after.trainRows == 40L && after.staleFraction == 0.0 &&
      !after.retrain, s"retrain must restore the quiet state: $after")
    assert(rows(IvfStore.topKAt(spark, drift, 2L, 5)) == served,
      "the seed-router rebuild changed served results")
    assert(!Files.exists(Paths.get(drift, "retrain-snap-rewrite-tmp")),
      "rebuildFromSelf left its live snapshot behind")

    // quiet store: the rebuild thunk must never run
    val clean = freshDir("quiet")
    IvfStore.buildAt(clean, all)
    var ran = false
    val d = RetrainPolicy.maybeRetrain(spark, clean) { ran = true }
    assert(!d.retrain && !ran, "policy rebuilt a clean store")
  }

  test("maybeRetrain refuses to race a concurrent writer: a held store " +
      "lock fails loudly and the store is untouched") {
    val drift = freshDir("locked")
    IvfStore.buildAt(drift, all.filter(col("vec_id") < 32))
    IvfStore.appendBatch(spark, drift, all.filter(col("vec_id") >= 32))
    StoreLock.acquire(drift, "append")
    try {
      val e = intercept[IllegalStateException](
        RetrainPolicy.maybeRetrain(spark, drift)(
          IvfStore.rebuildFromSelf(spark, drift)))
      assert(e.getMessage.contains("append"),
        s"refusal must name the holder: ${e.getMessage}")
    } finally StoreLock.release(drift)
    // still stale — the refused retrain changed nothing
    assert(RetrainPolicy.assess(spark, drift).retrain)
  }

  test("missing or corrupt train mass is a NAMED error, and the " +
      "maintain hook skips pre-contract stores instead of throwing") {
    val store = freshDir("nomass")
    IvfStore.buildAt(store, all)
    Files.delete(Paths.get(store, RetrainPolicy.File))
    val e = intercept[IllegalArgumentException](
      RetrainPolicy.assess(spark, store))
    assert(e.getMessage.contains(RetrainPolicy.File) &&
      e.getMessage.contains(store))
    Files.writeString(Paths.get(store, RetrainPolicy.File), "not-a-number")
    intercept[IllegalArgumentException](RetrainPolicy.assess(spark, store))
    assert(!RetrainPolicy.hasTrainMass(freshDir("absent")))
  }

  test("StoreAdmin.maintain retrainAt hook: fires on the drifted base " +
      "store, is idempotent, and the default sweep never retrains") {
    // an isolated fake corpus dir keys its own store roots (the
    // maintain-thresholds precedent)
    val fakeSf = Files.createTempDirectory("graft-retrain-maintain").toString
    all.filter(col("vec_id") < 32).coalesce(1)
      .write.mode("overwrite").parquet(s"$fakeSf/embeddings.parquet")
    val dest = IvfStore.ensureBuilt(spark, fakeSf)
    IvfStore.appendBatch(spark, dest, all.filter(col("vec_id") >= 32))
    // the default sweep may fold the 2-generation store but must NOT
    // retrain (retrainAt is opt-in — maintain runs inside hash-gated
    // chains)
    assert(!StoreAdmin.maintain(spark, fakeSf)
      .exists(_.startsWith("retrain")), "default maintain retrained")
    assert(RetrainPolicy.assess(spark, dest).retrain)

    val actions = StoreAdmin.maintain(spark, fakeSf, retrainAt = Some(0.15))
    assert(actions.exists(a => a.startsWith("retrain") && a.contains(dest)),
      s"retrainAt sweep did not fire: $actions")
    assert(!RetrainPolicy.assess(spark, dest).retrain)
    assert(!StoreAdmin.maintain(spark, fakeSf, retrainAt = Some(0.15))
      .exists(_.startsWith("retrain")), "retrain sweep is not idempotent")
    StoreAdmin.truncateAll(fakeSf)
  }
}
