package graft.expressions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FloatVecDotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, 0.2f), Array(0.3f, 0.4f)),
    (3L, null.asInstanceOf[Array[Float]], Array(1.0f))
  ).toDF("id", "a", "b")

  test("codegen dot product is bit-identical to the portable fold") {
    GraftFunctions.register(spark)
    val rows = vecs.filter(col("a").isNotNull).select(
      expr("graft_dot(a, b)").as("fast"),
      Similarity.dotd(col("a"), col("b")).as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows.length == 2)
  }

  test("unequal lengths yield null — matching the zip_with fold's null-pad") {
    GraftFunctions.register(spark)
    val uneq = Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("id", "a", "b")
    val r = uneq.select(
      expr("graft_dot(a, b)").as("fast"),
      Similarity.dotd(col("a"), col("b")).as("fold")).head()
    assert(r.isNullAt(0) && r.isNullAt(1), "both paths must agree on null")
  }

  test("null input yields null, not an error") {
    GraftFunctions.register(spark)
    val r = vecs.filter(col("id") === 3).select(expr("graft_dot(a, b)")).head()
    assert(r.isNullAt(0))
  }

  test("double arrays and mixed float/double sides compute the same fold") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5, -2.0, 3.25), Array(2.0f, 0.5f, -1.0f)))
      .toDF("d", "f")
    val Row(mixed: Double, dd: Double) = df.select(
      expr("graft_dot(d, f)"), expr("graft_dot(d, d)")).collect()(0)
    assert(mixed == 1.5 * 2.0 + -2.0 * 0.5 + 3.25 * -1.0)
    assert(dd == 1.5 * 1.5 + 4.0 + 3.25 * 3.25)
  }

  test("non-array types are rejected at analysis time") {
    GraftFunctions.register(spark)
    val bad = Seq((1L, "nope", Array(1.0f))).toDF("id", "a", "b")
    val e = intercept[Exception](bad.select(expr("graft_dot(a, b)")).collect())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("DATATYPE"))
  }
}
