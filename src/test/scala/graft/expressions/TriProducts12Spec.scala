package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TriProducts12Spec extends SparkSpec {
  import spark.implicits._

  /** The nested-transform formulation graft_tri12 replaces (covariance's
    * previous flat-product generator), parameterized by dimension.
    */
  private def foldSql(dim: Int): String =
    s"""flatten(transform(sequence(0, ${dim - 1}), i ->
       |  transform(sequence(i, ${dim - 1}), j ->
       |    graft_round12_long(CAST(element_at(v, i + 1) AS DOUBLE) *
       |      CAST(element_at(v, j + 1) AS DOUBLE)))))""".stripMargin

  test("flat product array is element-for-element equal to the nested fold") {
    GraftFunctions.register(spark)
    val df = Seq(
      Tuple1(Array(1.5f, -2.0f, 3.25f, 0.0f)),
      Tuple1(Array(0.1f, 0.2f, -0.30078125f, 7.5f)),
      Tuple1(Array(0.007812537f, -0.12345f, 0.5f, -0.5f))
    ).toDF("v")
    val rows = df.select(
      expr("graft_tri12(v)").as("fast"),
      expr(foldSql(4)).as("fold")).collect()
    rows.foreach { r =>
      val fast = r.getSeq[Long](0)
      val fold = r.getSeq[Long](1)
      assert(fast == fold, s"fast=$fast fold=$fold")
      assert(fast.length == 4 * 5 / 2)
    }
    assert(rows.length == 3)
  }

  test("double arrays match the fold too") {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(Array(1.0000005, -0.25, 3.0))).toDF("v")
    val r = df.select(
      expr("graft_tri12(v)").as("fast"), expr(foldSql(3)).as("fold")).head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("flat order matches the covariance decode map pos = i*d - i(i-1)/2 + (j-i)") {
    GraftFunctions.register(spark)
    val d = 4
    val v = Array(2.0f, 3.0f, 5.0f, 7.0f)
    val out = Seq(Tuple1(v)).toDF("v")
      .select(expr("graft_tri12(v)")).head().getSeq[Long](0)
    for (i <- 0 until d; j <- i until d) {
      val pos = i * d - i * (i - 1) / 2 + (j - i)
      assert(out(pos) == TriProducts12.round12(v(i).toDouble * v(j).toDouble))
    }
  }

  test("null input yields null") {
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(null.asInstanceOf[Array[Float]])).toDF("v")
      .select(expr("graft_tri12(v)")).head()
    assert(r.isNullAt(0))
  }

  test("a null ELEMENT fails loudly (no-null-element invariant)") {
    // r16 advice item 2: the replaced nested-transform produced a null
    // CELL per touched position; silently nulling the whole product array
    // would shift per-cell counts. The invariant is enforced, not assumed.
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(Array[java.lang.Double](1.0, null, 3.0))).toDF("v")
    val e = intercept[Exception] {
      df.select(expr("graft_tri12(v)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("graft_tri12: null element at index 1")))
  }
}
