package graft.stats

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data-profiling operators a pipeline runs BEFORE the heavy jobs: key-skew
  * audits (pick salting/AQE thresholds from evidence, not guesses), ANALYZE
  * -style column profiles (the stats a cost-based optimizer and a data-
  * quality gate both want), and sketch-based quantiles with a checkable
  * tolerance contract.
  *
  * All of it is plain aggregation algebra: one map-side-combinable groupBy
  * or one global agg per operator — profiles of 100 TB inputs cost one scan.
  */
object Profile {

  /** Heavy-hitter audit for a prospective shuffle key: the top-k keys by
    * row count with their corpus share and rank. THE pre-join skew check —
    * a key holding >1% of 100 TB makes a plain shuffle join spill; this
    * report is what decides salting (`Relational.saltedAgg`) or AQE skew
    * thresholds. Cost: one groupBy(key) (map-side combined) + a broadcast
    * 1-row total + TakeOrdered k rows.
    */
  def skewAudit(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = df.agg(count(lit(1)).cast("double").as("__tot"))
    val topk = counts.orderBy(col("n").desc, col(keyCol).asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col(keyCol).asc)
    topk.crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("share", round(col("n") / col("__tot"), 6))
      .select(col(keyCol), col("n"), col("rnk"), col("share"))
  }

  /** ANALYZE-style column profile, long format: one row per requested
    * column with distinct count, null count, and min/max rendered as
    * strings (so heterogeneous column types share one schema — the same
    * shape catalog stats tables use). NDVs are exact (the sketch variant
    * is `approx_count_distinct`, same plan shape, see `q_approx_distinct`).
    *
    * Plan shape: one independent single-column aggregation per column,
    * unioned — each branch prunes the scan to ITS column and runs a
    * partial (map-side) distinct. The single-agg multi-distinct
    * alternative Expands every row ×(columns+1) before one big shuffle —
    * on a wide profile that inflates shuffle volume by the column count,
    * while the union's branches read disjoint column chunks and shuffle
    * only their own distinct values.
    */
  /** Population-stability-index drift between a reference slice and a
    * current slice of the same numeric column — the dataset-level drift
    * monitor a continuously-ingesting training pipeline runs before
    * admitting a new crawl batch (PSI < 0.1 stable, > 0.25 shifted, by
    * the usual credit-scoring convention).
    *
    * Fixed-width bins (`binWidth`, capped at `nBins`), per-bin
    * proportions ε-floored at 1e-6 (the standard empty-bin smoothing, so
    * ln never sees 0), psi_term = (p − q)·ln(p/q) rounded 6. Returns one
    * row per occupied bin; Σ psi_term is the PSI. Plan: one combinable
    * groupBy per slice, a full-outer bin join, and a 1-row broadcast of
    * the totals — no window, no driver math.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 0, "psiDrift: binWidth and nBins must be positive")
    def binned(df: DataFrame, n: String): DataFrame = df
      .select(least(floor(col(valueCol) / binWidth), lit(nBins - 1))
        .cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).cast("long").as(n))
    val joined = binned(ref, "n_ref")
      .join(binned(cur, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val totals = joined.agg(
      sum(col("n_ref")).cast("double").as("__tr"),
      sum(col("n_cur")).cast("double").as("__tc"))
    val p = greatest(col("n_ref") / col("__tr"), lit(1e-6))
    val q = greatest(col("n_cur") / col("__tc"), lit(1e-6))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(p, 6).as("p_ref"), round(q, 6).as("p_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
  }

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // .reduce on an empty list throws an opaque UnsupportedOperationException
    require(cols.nonEmpty, "columnProfile needs at least one column")
    cols.map { c =>
      df.select(col(c)).agg(
        countDistinct(col(c)).as("ndv"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_null"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("ndv"), col("n_null"),
          col("min_str"), col("max_str"))
    }.reduce(_.unionAll(_))
  }

  /** Sketch quantiles under a tolerance CONTRACT (the `q_approx_distinct`
    * pattern): emits the exact percentile next to a flag asserting the
    * sketch landed within `tol` of it. Sketch internals are engine-specific
    * so the raw estimate can never hash-match an oracle — the exact value +
    * within-tolerance boolean CAN, which keeps the approximate operator
    * under the same correctness gate as everything else.
    */
  def approxQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                      accuracy: Int, tol: Double): DataFrame = {
    val psArr = s"array(${ps.map(p => s"${p}D").mkString(", ")})"
    df.agg(
        expr(s"percentile($valueCol, $psArr)").as("__exact"),
        expr(s"percentile_approx($valueCol, $psArr, $accuracy)").as("__approx"))
      .select(posexplode(arrays_zip(expr(psArr).as("p"),
        col("__exact"), col("__approx"))))
      .select(col("col.p").as("p"),
        round(col("col.__exact"), 6).as("exact_value"),
        // relative error against |exact| — a signed denominator would make
        // the flag vacuously true for negative percentiles; an exactly-zero
        // percentile demands an exactly-zero sketch (no meaningful relative
        // scale exists there)
        when(col("col.__exact") === 0.0, col("col.__approx") === 0.0)
          .otherwise(abs(col("col.__approx") - col("col.__exact")) /
            abs(col("col.__exact")) <= tol)
          .as("within_tol"))
  }

  /** Per-group OLS trend: slope/intercept of y against the 1-based rank of
    * each row inside its group (ordered by `orderCols`) — the "is this
    * user's metric drifting" regression every monitoring pipeline runs.
    * Using the rank as x (not a timestamp) makes every sum integer/decimal
    * EXACT: Σx, Σx² are integers, Σy and Σxy run in DECIMAL, and only the
    * final closed-form slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) happens in
    * doubles — identical IEEE ops on identical inputs in both engines, and
    * the quotient's denominator is large (~n³/12) so round(6) sits nowhere
    * near a systematic half boundary (contrast [[graft.text.TextAnalysis
    * .bigramPerplexity]]'s small-n case).
    * One window pass + one combinable groupBy. Groups with n < 2 or zero
    * x-variance are dropped. Returns (key, n, slope, intercept).
    */
  /** Per-group winsorization audit: the lo/hi percentiles (exact R-7) and
    * how many rows each clip bound would touch — the outlier-capping
    * companion to [[groupRegression]]'s drift signal. The clip comparisons
    * use the UNROUNDED percentile (identical IEEE interpolation in both
    * engines); only the reported bounds are round(6).
    * Plan: one agg for the per-group bounds (a handful of rows, broadcast),
    * then one combinable counting agg over the joined fact — two scans of
    * the group column, no window, no per-row sort.
    */
  def winsorizeStats(df: DataFrame, keyCol: String, valueCol: String,
                     lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo < hi, s"need lo < hi, got $lo >= $hi")
    // Clip counts compare against the ROUNDED bounds (the same 6-dp
    // values the operator publishes): the raw interpolated percentile is
    // a float expression whose last ulp differs between engines, and on
    // a value column with heavy ties a 1-ulp bound shift moves the whole
    // tied mass across the `<` — the sf1 sweep caught exactly that
    // (n_clipped_lo off by 50 on 10×-duplicated data). Rounding parity
    // is already proven suite-wide by the published p_lo/p_hi columns.
    val pct = df.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("__n"),
      round(expr(s"percentile($valueCol, ${lo}D)"), 6).as("__plo"),
      round(expr(s"percentile($valueCol, ${hi}D)"), 6).as("__phi"))
    df.join(broadcast(pct), keyCol)
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"),
        max(col("__plo")).as("p_lo"),
        max(col("__phi")).as("p_hi"),
        sum(when(col(valueCol) < col("__plo"), 1L).otherwise(0L))
          .cast("long").as("n_clipped_lo"),
        sum(when(col(valueCol) > col("__phi"), 1L).otherwise(0L))
          .cast("long").as("n_clipped_hi"))
  }

  def groupRegression(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                      yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val yd = col(yCol).cast("decimal(18,2)")
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val denom = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / denom
    df.withColumn("__x", row_number().over(w).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__x")).cast("long").as("__sx"),
        sum(col("__x") * col("__x")).cast("long").as("__sxx"),
        sum(yd).as("__sy"),
        sum(col("__x") * yd).as("__sxy"))
      .filter(col("__n") >= 2L && denom > 0.0)
      .select(col(keyCol), col("__n").as("n"),
        round(slope, 6).as("slope"),
        round((sy - slope * sx) / n, 6).as("intercept"))
  }

  /** Pre-aggregated distinct-count sketch table: one Apache DataSketches
    * HLL sketch per (keys*, partition) cell — the nightly artifact behind
    * every interactive "unique users" dashboard at 100 TB. Sketches are
    * a few KB regardless of cardinality, and `hll_union_agg` merges them
    * losslessly, so ANY rollup of the partition axis (a day range, all
    * time) is answered from the sketch table alone — the raw corpus is
    * scanned exactly once, at build time. One combinable groupBy.
    */
  def hllSketchTable(df: DataFrame, keys: Seq[String], valCol: String,
                     lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valCol), lit(lgConfigK)).as("sketch"))

  /** Serve a distinct-count rollup from a persisted sketch table: union
    * the cell sketches down to `keys` and estimate. Query-time cost is
    * O(sketch rows), independent of the raw data the sketches summarize.
    */
  def hllServe(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"))

  /** Gini coefficient of per-group volume — the mixture-design
    * inequality dashboard ("how skewed is the corpus across sources?"):
    * 0 = perfectly balanced, →1 = one group holds everything. Uses the
    * exact sorted-rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * (xᵢ ascending), computed ENTIRELY in integer arithmetic over the
    * group sums with one final IEEE division — engine-exact. The
    * group-sums table is |groups|-sized, so the rank-weighted sum runs
    * as a fold over one collected sorted array (no unpartitioned
    * window, no second shuffle). Returns (n_groups, total, gini).
    */
  def giniByGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.groupBy(col(groupCol).as("__g"))
      .agg(sum(col(valCol)).cast("long").as("__x"))
      .agg(expr("transform(array_sort(collect_list(struct(__x, __g))), e -> e.__x)")
        .as("__xs"))
      .select(size(col("__xs")).cast("long").as("n_groups"),
        expr("aggregate(__xs, 0L, (a, v) -> a + v)").as("total"),
        expr("aggregate(transform(__xs, (v, i) -> (CAST(i AS BIGINT) + 1L) * v), 0L, (a, v) -> a + v)")
          .as("__s1"))
      .select(col("n_groups"), col("total"),
        round((lit(2L) * col("__s1") - (col("n_groups") + 1L) * col("total"))
          .cast("double") /
          (col("n_groups") * col("total")).cast("double"), 6).as("gini"))

  /** Benford first-digit audit of a positive numeric column — the
    * classic fabricated-/synthetic-data detector: naturally occurring
    * multi-scale magnitudes follow P(d) = log₁₀(1 + 1/d); data that was
    * generated uniformly, clipped, or hand-edited does not. A curation
    * pipeline runs this per SOURCE and flags feeds whose χ² explodes.
    *
    * Digit extraction is string-based on the integer part (exact for
    * values in [1, 2⁵³) — no log10-of-double boundary risk at powers of
    * ten); rows < 1 are excluded and reported via n_total vs the digit
    * sum. One combinable 9-cell groupBy + a broadcast 1-row total (the
    * [[skewAudit]] idiom — no window, no single-partition sort) —
    * profile cost is one scan at any size. χ² contribution per digit
    * (obs − exp)²/exp with exp = n·P(d); expected-frequency ln/log10
    * chain is identical correctly-rounded IEEE in both engines, round6.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .filter(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = digits.agg(sum(col("n")).cast("double").as("__tot"))
    // Spark lowers log(base, x) to ln(x)/ln(base); the oracle replays
    // that exact quotient rather than DuckDB's native log10
    val exp = log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
    digits
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__tot"), 6).as("freq"),
        round(exp, 6).as("expected"),
        round(pow(col("n").cast("double") - col("__tot") * exp, 2) /
          (col("__tot") * exp), 6).as("chi2"))
  }
}
