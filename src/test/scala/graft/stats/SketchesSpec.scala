package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sketches]] — the KLL / Theta / frequent-items serving tables. The
  * specs drive the full build→persist-shape→merge→serve path on data where
  * the exact answer is computable, so a regression in cell construction,
  * merge algebra, or estimate wiring shows up as a wrong exact comparison,
  * not a tolerance coin flip.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KLL: merged cell sketches serve quantiles within rank tolerance") {
    // 10k values in [0, 10000) split across 10 'day' cells by value range —
    // maximally adversarial for merging (each cell sees a disjoint slice).
    val df = (0 until 10000).map(i => (i / 1000, i.toDouble)).toDF("day", "v")
    val cells = Sketches.kllSketchTable(df, Seq("day"), "v")
    assert(cells.count() == 10)
    val served = Sketches.kllServeQuantiles(cells, Seq(), Seq(0.1, 0.5, 0.9))
    val got = served.select("p", "approx_value").as[(Double, Double)]
      .collect().toMap
    for ((p, v) <- got) {
      val exactRank = (v + 1) / 10000.0 // rank of value v in 0..9999
      assert(math.abs(exactRank - p) <= 0.02, s"p=$p served=$v")
    }
  }

  test("KLL: rank audit flags an out-of-tolerance served value") {
    val raw = (0 until 1000).map(i => ("a", i.toDouble)).toDF("g", "v")
    val goodServed = Seq(("a", 0.5, 499.0)).toDF("g", "p", "approx_value")
    val badServed = Seq(("a", 0.5, 800.0)).toDF("g", "p", "approx_value")
    val ok = Sketches.kllRankAudit(raw, goodServed, Seq("g"), "v", 0.02)
      .select("rank_ok").as[Boolean].head()
    val bad = Sketches.kllRankAudit(raw, badServed, Seq("g"), "v", 0.02)
      .select("rank_ok").as[Boolean].head()
    assert(ok && !bad)
  }

  test("Theta: intersection and difference across cells are exact in the " +
    "exact-mode regime") {
    // A = {0..99} via two cells, B = {50..149} via one cell.
    val rows = (0 until 50).map(i => ("a", 1, i.toLong)) ++
      (50 until 100).map(i => ("a", 2, i.toLong)) ++
      (50 until 150).map(i => ("b", 1, i.toLong))
    val df = rows.toDF("seg", "cell", "id")
    val cells = Sketches.thetaSketchTable(df, Seq("seg", "cell"), "id")
    val a = Sketches.thetaUnion(cells.where($"seg" === "a"))
    val b = Sketches.thetaUnion(cells.where($"seg" === "b"))
    val r = Sketches.thetaSetAlgebra(a, b)
      .select("approx_a", "approx_b", "approx_both", "approx_only_a")
      .as[(Double, Double, Double, Double)].head()
    assert(r == ((100.0, 100.0, 50.0, 50.0)))
  }

  test("Theta: empty intersection estimates zero") {
    val df = (0 until 40).map(i => (if (i < 20) "a" else "b", 1,
      i.toLong)).toDF("seg", "cell", "id")
    val cells = Sketches.thetaSketchTable(df, Seq("seg", "cell"), "id")
    val r = Sketches.thetaSetAlgebra(
        Sketches.thetaUnion(cells.where($"seg" === "a")),
        Sketches.thetaUnion(cells.where($"seg" === "b")))
      .select("approx_both").as[Double].head()
    assert(r == 0.0)
  }

  test("frequent items: a heavy hitter split across cells is served with " +
    "its exact total") {
    // Item 7 appears 60 times spread over 3 cells; 50 distinct light items.
    val rows = (0 until 60).map(i => (i % 3, 7L)) ++
      (0 until 50).map(i => (i % 3, 100L + i))
    val df = rows.toDF("cell", "item")
    val states = Sketches.topKSketchTable(df, Seq("cell"), "item",
      maxItemsTracked = 1024)
    assert(states.count() == 3)
    val served = Sketches.topKServe(states, Seq(), k = 5,
      maxItemsTracked = 1024)
    val top = served.orderBy($"est_count".desc).limit(1)
      .as[(Long, Long)].head()
    assert(top == ((7L, 60L)))
  }

  test("frequent items: serveCapacity covering the tracked-item union " +
    "serves correctly where the default-capacity combine degrades") {
    // sf1-sweep shape in miniature: 30 cells whose per-cell distinct items
    // (200) exceed maxItemsTracked (64), union 600 ≫ 64. Spark's
    // approx_top_k_combine does not evict on overflow — observed failure
    // shapes are an EMPTY combined sketch (the sf1 sweep's
    // zero-served-rows at combine(8192) over 15 000 tracked users) or a
    // serializer MatchError, DEPENDING ON the partial-aggregation layout
    // (small shapes can come through healthy, so the bad path is not
    // deterministically assertable here) — the contract under test is
    // OURS: combining at a capacity ≥ the union must serve the planted
    // heavy hitter within the FI guarantee.
    val rows = (for (c <- 0 until 30; i <- 0 until 200)
      yield (c, ((c * 200 + i) % 600).toLong)) ++
      (0 until 500).map(i => (i % 30, 9999L)) // planted heavy hitter
    val df = rows.toDF("cell", "item")
    val states = Sketches.topKSketchTable(df, Seq("cell"), "item",
      maxItemsTracked = 64).cache()
    assert(states.count() == 30)
    val served = Sketches.topKServe(states, Seq(), k = 5,
      maxItemsTracked = 64, serveCapacity = 1024)
    val top = served.orderBy($"est_count".desc).limit(1)
      .as[(Long, Long)].head()
    // saturated cells overestimate by their eviction offsets (Space-Saving
    // upper bound), so pin the item + the analytic error 3.5·N/M
    assert(top._1 == 9999L)
    assert(math.abs(top._2 - 500L) <= 3.5 * 6500 / 64,
      s"estimate ${top._2} outside the FI guarantee")
    states.unpersist()
  }
}
