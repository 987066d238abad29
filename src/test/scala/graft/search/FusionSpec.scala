package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: hand-computed fusion, single-list ids, tie-break order") {
    // keyword ranking: a(1st) b(2nd) c(3rd); vector ranking: b(1st) d(2nd)
    val kw = Seq(("a", 9.0), ("b", 5.0), ("c", 1.0)).toDF("id", "score")
    val vec = Seq(("b", 0.9), ("d", 0.8)).toDF("id", "score")
    val out = Fusion.rrf(Seq("kw" -> kw, "vec" -> vec), "id", "score",
        k = 60, topK = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // b: 1/62 + 1/61; a: 1/61; d: 1/62; c: 1/63
    val expect = Seq(
      ("b", r6(1.0 / 62 + 1.0 / 61), 2L),
      ("a", r6(1.0 / 61), 1L),
      ("d", r6(1.0 / 62), 1L),
      ("c", r6(1.0 / 63), 1L))
    assert(out.toSeq == expect)
  }

  test("rrf: equal scores rank by id ascending (deterministic ties)") {
    val one = Seq(("x", 1.0), ("y", 1.0), ("z", 1.0)).toDF("id", "score")
    val out = Fusion.rrf(Seq("only" -> one), "id", "score", k = 60, topK = 3)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("x", "y", "z"))
  }

  test("rrf: topK bounds the fused output") {
    val a = Seq.tabulate(30)(i => (i.toLong, 100.0 - i)).toDF("id", "score")
    val out = Fusion.rrf(Seq("a" -> a), "id", "score", k = 60, topK = 5).collect()
    assert(out.length == 5 && out.head.getLong(0) == 0L)
  }
}
