package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Sq8DequantArrSpec extends SparkSpec {
  import spark.implicits._

  /** The Column formulation graft_sq8dq replaces (Similarity.sq8Dequant's
    * previous body, also the shape the q_ann_sq8 oracle replays).
    */
  private def fold = {
    val v = transform(col("a"), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    when(scale === 0.0, v)
      .otherwise(transform(v, x => round(x / scale) * scale))
  }

  test("dequant array is bit-identical to the Column formulation") {
    GraftFunctions.register(spark)
    val df = Seq(
      Tuple1(Array(1.5f, -2.0f, 3.25f, 0.0f)),
      Tuple1(Array(0.1f, 0.2f, -0.30078125f, 7.5f)),
      // exact-half quotient territory: 63.5/127-style values exercise the
      // BigDecimal HALF_UP fallback, not just the rint fast path
      Tuple1(Array(63.5f, 127.0f, -63.5f, 0.5f)),
      Tuple1(Array(0.007812537f, -0.12345f, 0.5f, -0.5f)),
      Tuple1(Array(0.0f, 0.0f, 0.0f, 0.0f)) // scale-0 guard: dequants to itself
    ).toDF("a")
    val rows = df.select(
      expr("graft_sq8dq(a)").as("fast"), fold.as("ref")).collect()
    rows.foreach { r =>
      val fast = r.getSeq[Double](0).map(java.lang.Double.doubleToLongBits)
      val ref = r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)
      assert(fast == ref, s"fast=${r.getSeq[Double](0)} ref=${r.getSeq[Double](1)}")
    }
    assert(rows.length == 5)
  }

  test("double arrays match too, and empty arrays stay empty") {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(Array(1.0000005, -0.25, 3.0))).toDF("a")
    val r = df.select(expr("graft_sq8dq(a)").as("fast"), fold.as("ref")).head()
    assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    val e = Seq(Tuple1(Array.empty[Double])).toDF("a")
      .select(expr("graft_sq8dq(a)")).head()
    assert(e.getSeq[Double](0).isEmpty)
  }

  test("null input yields null") {
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(null.asInstanceOf[Array[Float]])).toDF("a")
      .select(expr("graft_sq8dq(a)")).head()
    assert(r.isNullAt(0))
  }

  test("non-finite elements match the Column formulation, never throw") {
    // r16 advice item 1: BigDecimal.valueOf(NaN/Inf) throws, and a `>`
    // max-abs loop skips NaN where array_max treats it as largest. Both
    // paths must instead reproduce the Column formulation's NaN poisoning.
    GraftFunctions.register(spark)
    val df = Seq(
      Tuple1(Array(Float.NaN, 5.0f, -2.0f)),          // NaN poisons the scale
      Tuple1(Array(1.0f, Float.PositiveInfinity)),    // Inf scale
      Tuple1(Array(Float.NegativeInfinity, 0.25f)),
      Tuple1(Array(Float.NaN))
    ).toDF("a")
    val rows = df.select(
      expr("graft_sq8dq(a)").as("fast"), fold.as("ref")).collect()
    rows.foreach { r =>
      val fast = r.getSeq[Double](0).map(java.lang.Double.doubleToLongBits)
      val ref = r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)
      assert(fast == ref, s"fast=${r.getSeq[Double](0)} ref=${r.getSeq[Double](1)}")
    }
    assert(rows.length == 4)
  }
}
