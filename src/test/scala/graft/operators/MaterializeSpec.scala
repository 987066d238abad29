package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    ("a", 10.0), ("a", 20.5), ("a", -3.25), ("b", 7.0),
    ("b", 7.0), ("c", 100.0), ("a", 0.0), ("b", -1.5)
  ).toDF("k", "v")

  private def served(df: org.apache.spark.sql.DataFrame) =
    Materialize.serve(Materialize.aggState(df, Seq("k"), "v"), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet

  test("merge of partial states equals full recompute") {
    val base  = rows.filter(col("v") >= 0)
    val delta = rows.filter(col("v") < 0)
    val mv = Materialize.aggState(base, Seq("k"), "v")
    val bs = Materialize.aggState(delta, Seq("k"), "v")
    val merged = Materialize.serve(
      Materialize.merge(mv, bs, Seq("k")), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(merged == served(rows))
  }

  test("merge is associative and order-independent across batches") {
    val b1 = Materialize.aggState(rows.limit(3), Seq("k"), "v")
    val rest = rows.exceptAll(rows.limit(3))
    val b2 = Materialize.aggState(rest.limit(3), Seq("k"), "v")
    val b3 = Materialize.aggState(rest.exceptAll(rest.limit(3)), Seq("k"), "v")
    def fin(mv: org.apache.spark.sql.DataFrame) =
      Materialize.serve(mv, Seq("k")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val leftFold  = Materialize.merge(Materialize.merge(b1, b2, Seq("k")), b3, Seq("k"))
    val rightFold = Materialize.merge(b1, Materialize.merge(b3, b2, Seq("k")), Seq("k"))
    assert(fin(leftFold) == fin(rightFold))
    assert(fin(leftFold) == Materialize.serve(
      Materialize.aggState(rows, Seq("k"), "v"), Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("advance from a PERSISTED MV scans only the store and the batch") {
    val dir = java.nio.file.Files.createTempDirectory("mvspec").toString
    Materialize.aggState(rows.filter(col("v") >= 0), Seq("k"), "v")
      .write.mode("overwrite").parquet(s"$dir/mv")
    val mv = spark.read.parquet(s"$dir/mv")
    val batch = Materialize.aggState(rows.filter(col("v") < 0), Seq("k"), "v")
    val advanced = Materialize.serve(
      Materialize.merge(mv, batch, Seq("k")), Seq("k"))
    val scans = advanced.queryExecution.executedPlan.toString
    assert(scans.contains("mvspec"), "plan must read the persisted MV")
    val out = advanced.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(out == served(rows))
  }

  test("groups present only in one side survive the merge") {
    val mv = Materialize.aggState(Seq(("x", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val bs = Materialize.aggState(Seq(("y", 2.0)).toDF("k", "v"), Seq("k"), "v")
    val out = Materialize.serve(Materialize.merge(mv, bs, Seq("k")), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 1L, "y" -> 1L))
  }
}
