package graft.plans

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def left: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),  // has prior click
    (1L, ts("2024-01-01 08:59:00"), 101L, 2.0),  // before any click → null
    (1L, ts("2024-01-01 09:00:00"), 102L, 3.0),  // EXACTLY at click time → inclusive
    (2L, ts("2024-01-01 10:00:00"), 103L, 4.0),  // key with no right rows
    (3L, ts("2024-01-01 10:00:00"), 104L, 5.0)   // later click only → null
  ).toDF("user_id", "ts", "event_id", "value")

  private def right: DataFrame = Seq(
    (1L, ts("2024-01-01 09:00:00"), 7L),
    (1L, ts("2024-01-01 09:30:00"), 8L),
    (3L, ts("2024-01-01 11:00:00"), 9L)  // after every left ts for key 3
  ).toDF("user_id", "ts", "click_id")

  private def collectMap(df: DataFrame): Map[Long, Option[Long]] =
    df.collect().map(r => r.getLong(2) ->
      (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap

  test("native asof == window asof == hand truth (inclusive bound, nulls)") {
    val native = AsofNative.join(left, right, "user_id", "ts",
      Seq("event_id", "value"), "click_id")
    val window = Relational.asofJoin(left, right, "user_id", "ts",
      Seq("event_id", "value"), "click_id")
    val truth = Map(100L -> Some(8L), 101L -> None, 102L -> Some(7L),
      103L -> None, 104L -> None)
    assert(collectMap(native) == truth)
    assert(collectMap(window) == truth)
    assert(native.columns.toSeq == window.columns.toSeq)
  }

  test("partitioning-invariant: same result from adversarial partitions") {
    val native = AsofNative.join(left.repartition(7), right.repartition(3),
      "user_id", "ts", Seq("event_id", "value"), "click_id")
    assert(collectMap(native) ==
      Map(100L -> Some(8L), 101L -> None, 102L -> Some(7L),
        103L -> None, 104L -> None))
  }

  test("null-key left rows flow through with a null payload") {
    val l = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), 200L, 1.0),
        (Option(1L), ts("2024-01-01 10:00:00"), 201L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = collectMap(AsofNative.join(l, right, "user_id", "ts",
      Seq("event_id", "value"), "click_id"))
    assert(out == Map(200L -> None, 201L -> Some(8L)))
  }

  test("plan: AsofJoinExec with one exchange per side, no union") {
    val p = AsofNative.join(left, right, "user_id", "ts",
      Seq("event_id", "value"), "click_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"native operator not planned:\n$p")
    assert(!p.contains("Union"), s"union leaked into the native plan:\n$p")
    assert(!p.contains("Window"), s"window leaked into the native plan:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 co-partitioning exchanges, got $exchanges:\n$p")
  }

  test("codegen: primitive payload compiles into the whole-stage pipeline") {
    val df = AsofNative.join(left, right, "user_id", "ts",
      Seq("event_id", "value"), "click_id")
    df.collect()  // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // the star prefix marks operators inside a WholeStageCodegen stage
    assert(p.contains("*(") && p.linesIterator.exists(l =>
        l.contains("AsofJoin") && l.contains("*(")),
      s"AsofJoin not inside a codegen stage:\n$p")
  }

  test("non-primitive payload falls back to the interpreted merge, same truth") {
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), "early"),
      (1L, ts("2024-01-01 09:30:00"), "late"),
      (3L, ts("2024-01-01 11:00:00"), "future")
    ).toDF("user_id", "ts", "tag")
    val df = AsofNative.join(left, right = r, "user_id", "ts",
      Seq("event_id", "value"), "tag")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(l => l.contains("AsofJoin") && l.contains("*(")),
      s"string payload must use the interpreted path:\n$p")
    val out = df.collect().map(row => row.getLong(2) ->
      (if (row.isNullAt(4)) None else Some(row.getString(4)))).toMap
    assert(out == Map(100L -> Some("late"), 101L -> None,
      102L -> Some("early"), 103L -> None, 104L -> None))
  }

  test("randomized parity: native == window on 2k rows when the payload is consumed") {
    val rnd = new scala.util.Random(42)
    val l = Seq.tabulate(2000)(i => (rnd.nextInt(50).toLong,
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      i.toLong, rnd.nextDouble()))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Seq.tabulate(1500)(i => (rnd.nextInt(50).toLong,
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      10000L + i))
      .toDF("user_id", "ts", "click_id")
      // the operator contract: right side pre-deduped per (key, time)
      .groupBy("user_id", "ts").agg(max("click_id").as("click_id"))
    def fingerprint(df: DataFrame) =
      df.agg(count(col("click_id")), sum(col("click_id")), sum(col("value")))
        .collect()(0).toSeq
    val n = fingerprint(AsofNative.join(l, r, "user_id", "ts",
      Seq("event_id", "value"), "click_id"))
    val w = fingerprint(Relational.asofJoin(l, r, "user_id", "ts",
      Seq("event_id", "value"), "click_id"))
    assert(n == w, s"native $n != window $w")
  }

  test("rejects unsupported key types loudly") {
    val l = Seq(("a", ts("2024-01-01 10:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Seq(("a", ts("2024-01-01 09:00:00"), 7L))
      .toDF("user_id", "ts", "click_id")
    val e = intercept[IllegalArgumentException] {
      AsofNative.join(l, r, "user_id", "ts", Seq("event_id"), "click_id")
    }
    assert(e.getMessage.contains("LongType"))
  }
}
