package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch serving tables beyond HLL ([[Profile.hllSketchTable]]):
  * KLL quantiles, Theta set algebra, and frequent-items top-k.
  *
  * All three follow the same 100 TB contract as the HLL table: the raw
  * corpus is scanned exactly ONCE at build time into per-(keys, partition)
  * sketch cells of bounded size (KB each, independent of row count), and any
  * query-time rollup of the partition axis merges cell sketches instead of
  * rescanning data. The merge operators are associative and lossless with
  * respect to each sketch's accuracy guarantee, so the nightly build + the
  * interactive serve compose exactly like `CORRECTNESS`'s other served
  * stores (BM25Index / IvfStore / PqStore / hll).
  *
  * Reference anchor: the reference keeps no sketch state at all — every
  * dashboard number is a full Solr facet recount
  * (`Web UI … search-engine.component.ts:32-47` issuing fresh queries per
  * view). These tables are what that recount becomes at 100 TB.
  */
object Sketches {

  // ---------------------------------------------------------------- KLL ---

  /** Per-cell KLL quantile sketches over `valCol` (double). `k = 200` gives
    * ~1.65% two-sided normalized-rank error (DataSketches KLL default).
    * One combinable groupBy — partial sketches merge map-side.
    */
  def kllSketchTable(df: DataFrame, keys: Seq[String], valCol: String,
                     k: Int = 200): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(kll_sketch_agg_double(col(valCol), lit(k)).as("sketch"))

  /** Serve quantiles for each probe rank in `ps` from a persisted sketch
    * table, rolled up to `keys`: merge the cell sketches, then read each
    * quantile. Cost is O(sketch rows), independent of the summarized data.
    * Emits one row per (keys, p): `(keys*, p, approx_value)`.
    */
  def kllServeQuantiles(sketches: DataFrame, keys: Seq[String],
                        ps: Seq[Double]): DataFrame = {
    val merged = sketches.groupBy(keys.map(col): _*)
      .agg(kll_merge_agg_double(col("sketch")).as("merged"))
    val probes = ps.map(p => struct(lit(p).as("p"),
      kll_sketch_get_quantile_double(col("merged"), lit(p)).as("approx_value")))
    merged.select(keys.map(col) :+
        explode(array(probes: _*)).as("q"): _*)
      .select(keys.map(col) :+ col("q.p") :+ col("q.approx_value"): _*)
  }

  /** Rank-audit a served quantile table against the raw data: for each
    * served (keys, p, approx_value), compute the value's exact normalized
    * rank and flag `|rank − p| <= tol` — the tolerance the sketch
    * guarantees. The audit joins the KB-sized served frame (broadcast) to
    * one raw scan; the hash-gate output carries only exact values + flags,
    * so a broken sketch flips a flag and fails the gate.
    */
  def kllRankAudit(raw: DataFrame, served: DataFrame, keys: Seq[String],
                   valCol: String, tol: Double): DataFrame =
    raw.join(broadcast(served), keys)
      .groupBy((keys.map(col) :+ col("p")): _*)
      .agg(count(lit(1)).as("n"),
        (abs(sum(when(col(valCol) <= col("approx_value"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double") - col("p").cast("double"))
          <= tol).as("rank_ok"))
      .select((keys.map(col) :+ col("p") :+ col("n") :+ col("rank_ok")): _*)

  // -------------------------------------------------------------- Theta ---

  /** Per-cell Theta sketches of distinct `valCol` — unlike HLL, Theta
    * supports set INTERSECTION and DIFFERENCE at query time, so segments
    * that were never co-grouped at build time can still be combined
    * ("users who did A on day X and B on day Y"). Below the nominal entry
    * count (default 4096) the sketch is in exact mode.
    */
  def thetaSketchTable(df: DataFrame, keys: Seq[String],
                       valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(theta_sketch_agg(col(valCol)).as("sketch"))

  /** Estimate |A|, |B|, |A ∩ B| and |A \ B| from two single-sketch frames
    * (each one row, `sketch` column) — pure sketch algebra, no raw scan.
    */
  def thetaSetAlgebra(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("sketch").as("sa"))
      .crossJoin(b.select(col("sketch").as("sb")))
      .select(
        theta_sketch_estimate(col("sa")).as("approx_a"),
        theta_sketch_estimate(col("sb")).as("approx_b"),
        theta_sketch_estimate(theta_intersection(col("sa"), col("sb")))
          .as("approx_both"),
        theta_sketch_estimate(theta_difference(col("sa"), col("sb")))
          .as("approx_only_a"))

  /** Roll a theta sketch table up to one sketch via union (e.g. all cells
    * matching a segment predicate). */
  def thetaUnion(sketches: DataFrame): DataFrame =
    sketches.agg(theta_union_agg(col("sketch")).as("sketch"))

  // ------------------------------------------------- frequent items (FI) ---

  /** Per-cell frequent-items states for `itemCol` top-k serving
    * (`approx_top_k_accumulate`). `maxItemsTracked` bounds both cell size
    * and the count-error guarantee (error <= n / maxItemsTracked).
    */
  def topKSketchTable(df: DataFrame, keys: Seq[String], itemCol: String,
                      maxItemsTracked: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(call_function("approx_top_k_accumulate", col(itemCol),
        lit(maxItemsTracked)).as("state"))

  /** Serve the rolled-up top-k item/estimated-count list from a state
    * table: combine cell states down to `keys`, then estimate. Emits
    * `(keys*, item, est_count)` exploded rows.
    *
    * `serveCapacity` sizes the COMBINE map and must cover the UNION of
    * items tracked across the combined cells (≤ cells × maxItemsTracked):
    * Spark's `approx_top_k_combine` does not evict on overflow — it
    * silently yields an EMPTY sketch once the union exceeds its capacity,
    * which the sf1 sweep caught (30 day cells × >8 k distinct users →
    * zero served rows at combine(8192), fine at 16384). Combining at a
    * larger capacity adds NO error — the FI guarantee comes from the
    * per-cell accumulation (Σ 3.5·n_cell/maxItemsTracked = 3.5·N/M) —
    * and serve-side state stays MB-scale (≈16 B/item). Defaults to
    * maxItemsTracked for single-cell rollups.
    */
  def topKServe(states: DataFrame, keys: Seq[String], k: Int,
                maxItemsTracked: Int, serveCapacity: Int = 0): DataFrame = {
    val cap = if (serveCapacity > 0) serveCapacity else maxItemsTracked
    val combined = states.groupBy(keys.map(col): _*)
      .agg(call_function("approx_top_k_combine", col("state"),
        lit(cap)).as("state"))
    combined
      .select(keys.map(col) :+ explode(call_function("approx_top_k_estimate",
        col("state"), lit(k))).as("e"): _*)
      .select(keys.map(col) :+ col("e.item").as("item") :+
        col("e.count").as("est_count"): _*)
  }
}
