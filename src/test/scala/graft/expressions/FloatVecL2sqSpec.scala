package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FloatVecL2sqSpec extends SparkSpec {
  import spark.implicits._

  /** The portable reference fold graft_l2sq replaces — the exact expression
    * pqModel/pqEncode previously inlined.
    */
  private val foldSql =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"

  test("codegen L2² is bit-identical to the portable fold (double arrays)") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.5, -2.0, 3.25, 0.0), Array(2.0, 0.5, -1.0, 7.125)),
      (Array(0.1, 0.2), Array(0.3, 0.4)),
      // values mirroring PQ residual slices: small magnitudes, many decimals
      (Array(0.007812537, -0.12345), Array(-0.00390625, 0.5))
    ).toDF("a", "b")
    val rows = df.select(
      expr("graft_l2sq(a, b)").as("fast"), expr(foldSql).as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows.length == 3)
  }

  test("float arrays and mixed sides match the widened fold") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5f, -2.0f, 3.25f), Array(2.0, 0.5, -1.0)))
      .toDF("a", "b")
    val r = df.select(
      expr("graft_l2sq(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (acc, x) -> acc + x)")
        .as("fold")).head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("unequal lengths and null inputs yield null — the fold's null-pad") {
    GraftFunctions.register(spark)
    val uneq = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = uneq.select(
      expr("graft_l2sq(a, b)").as("fast"), expr(foldSql).as("fold")).head()
    assert(r.isNullAt(0) && r.isNullAt(1), "both paths must agree on null")
    val nul = Seq((null.asInstanceOf[Array[Double]], Array(1.0))).toDF("a", "b")
    assert(nul.select(expr("graft_l2sq(a, b)")).head().isNullAt(0))
  }

  test("non-array types are rejected at analysis time") {
    GraftFunctions.register(spark)
    val bad = Seq((1L, "nope", Array(1.0f))).toDF("id", "a", "b")
    val e = intercept[Exception](bad.select(expr("graft_l2sq(a, b)")).collect())
    assert(e.getMessage.contains("graft_l2sq") || e.getMessage.contains("DATATYPE"))
  }
}
