package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round12LongSpec extends SparkSpec {
  import spark.implicits._

  private def reference(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("equals Spark round semantics on randomized float products") {
    GraftFunctions.register(spark)
    // the covariance workload's exact input shape: products of two floats
    val rnd = new scala.util.Random(42)
    val vals = (1 to 20000).map { _ =>
      (rnd.nextFloat() * 2 - 1).toDouble * (rnd.nextFloat() * 2 - 1).toDouble
    } ++ Seq(0.0, -0.0, 1.0, -1.0, 0.999999999999, 1.999999999999)
    val rows = vals.toDF("v")
      .select(col("v"), expr("graft_round12_long(v)").as("k")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == reference(r.getDouble(0)),
        s"mismatch at v=${r.getDouble(0)}")
    }
  }

  test("guard band: half-integer unscaled boundaries take the exact path") {
    GraftFunctions.register(spark)
    // v = k/8192 makes v*1e12 land exactly on half-integers (odd k):
    // 1/8192 * 1e12 = 122070312.5 — HALF_UP must round away from zero,
    // where a bare rint would round to even
    val vals = Seq(1.0 / 8192, 3.0 / 8192, -1.0 / 8192, -3.0 / 8192,
      5.0 / 8192, 2.5e-13, -2.5e-13, 1.5e-12)
    val rows = vals.toDF("v")
      .select(col("v"), expr("graft_round12_long(v)").as("k")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == reference(r.getDouble(0)),
        s"boundary mismatch at v=${r.getDouble(0)}")
    }
    // sanity: the 1/8192 case really is the away-from-zero branch
    assert(reference(1.0 / 8192) == 122070313L)
    assert(reference(-1.0 / 8192) == -122070313L)
  }

  test("large magnitudes route exact; null propagates; non-double rejected") {
    GraftFunctions.register(spark)
    val rows = Seq(3.5, 1234.000000000001, -987654.123456789)
      .toDF("v").select(col("v"), expr("graft_round12_long(v)").as("k"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == reference(r.getDouble(0))))
    val n = Seq[Option[Double]](None).toDF("v")
      .select(expr("graft_round12_long(v)")).collect()
    assert(n.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("v").select(expr("graft_round12_long(v)")).collect()
    }
    assert(err.getMessage.contains("graft_round12_long") ||
      err.getMessage.toLowerCase.contains("double"))
  }

  test("interpreted eval agrees with codegen") {
    // direct Expression eval (no codegen) against the same reference
    val vals = Seq(0.123456789012345, -1.0 / 8192, 0.25, 1.9999999999995)
    vals.foreach { v =>
      val e = Round12Long(org.apache.spark.sql.catalyst.expressions.Literal(v))
      assert(e.eval(null) == reference(v), s"interpreted mismatch at $v")
    }
  }
}
