package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val tk = udaf(new TopKByValue(k), ExpressionEncoder[(Double, Long)]())
    df.groupBy(col("g")).agg(tk(col("v"), col("id")).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getDouble(0), x.getLong(1))).toList).toMap
  }

  test("exact top-k, ties broken by id asc, deterministic order") {
    val df = Seq(
      ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 7.0, 4L),
      ("b", 1.0, 5L)
    ).toDF("g", "v", "id")
    val out = run(df, 2)
    assert(out("a") == List((9.0, 2L), (9.0, 3L))) // tie → lower id first
    assert(out("b") == List((1.0, 5L)))            // fewer than k kept as-is
  }

  test("partition-invariant: adversarial repartition lands on the same top-k") {
    val rows = (1L to 500L).map(i => ("g", (i % 97).toDouble, i))
    val df = rows.toDF("g", "v", "id")
    val a = run(df, 5)
    val b = run(df.repartition(13), 5)
    assert(a == b)
    assert(a("g").map(_._1) == List(96.0, 96.0, 96.0, 96.0, 96.0))
    assert(a("g").map(_._2) == List(96L, 193L, 290L, 387L, 484L))
  }
}
