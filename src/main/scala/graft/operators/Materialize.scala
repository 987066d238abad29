package graft.operators

import graft.util.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental materialized-view maintenance for algebraic aggregates.
  *
  * The reference recomputes its dashboard aggregations from scratch per run
  * (`Spark/Word_cloud_evaluation.ipynb` re-reads and re-groups the full
  * corpus); at 100 TB a nightly full regroup is the dominant cost of any
  * always-on rollup. The standard fix is a partial-aggregate MV: persist the
  * per-key mergeable STATE (count / exact sum / min / max), and advance it
  * per ingested batch by merging the batch's state — cost is
  * O(MV + batch), never O(corpus). count+sum+min+max are self-mergeable
  * (algebraic in the Gray et al. CUBE taxonomy); avg is derived at serve
  * time, so it never poisons the merge.
  *
  * Sums are carried as exact DECIMAL ([[Num]] rationale): merging partial
  * sums is then associative to the bit, so `merge(state(A), state(B)) ==
  * state(A ∪ B)` exactly — the invariant the q_mv_merge oracle pins by
  * recomputing from scratch in DuckDB.
  *
  * Plan shape: state building is one combinable groupBy per input (map-side
  * partial agg does most of the work); merge is a groupBy over
  * MV ∪ batch-state, where the MV side is key-grouped already — persist the
  * MV bucketed by key and the merge reuses that partitioning instead of
  * reshuffling history.
  */
object Materialize {

  private val stateCols = Seq("n", "s", "mn", "mx")

  /** Per-key mergeable aggregate state of `valCol`: (keys*, n, s, mn, mx)
    * with `s` an exact decimal sum.
    */
  def aggState(df: DataFrame, keys: Seq[String], valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        Num.cnt.as("n"),
        sum(Num.dec2(col(valCol))).as("s"),
        min(col(valCol)).as("mn"),
        max(col(valCol)).as("mx"))

  /** Advance an MV by a batch's state: one key-grouped merge of the two
    * partial states. Associative and commutative — batches may merge in
    * any order, singly or accumulated.
    */
  def merge(mv: DataFrame, batchState: DataFrame, keys: Seq[String]): DataFrame =
    mv.select((keys ++ stateCols).map(col): _*)
      .unionByName(batchState.select((keys ++ stateCols).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).cast("long").as("n"),
        sum(col("s")).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Serve the MV as final aggregates: count / sum / min / max / derived
    * avg (one IEEE division — oracle-identical).
    */
  def serve(mv: DataFrame, keys: Seq[String]): DataFrame =
    mv.select(
      (keys.map(col) ++ Seq(
        col("n").as("n_rows"),
        col("s").cast(DoubleType).as("sum_val"),
        col("mn").as("min_val"),
        col("mx").as("max_val"),
        (col("s").cast(DoubleType) / col("n")).as("avg_val"))): _*)
}
