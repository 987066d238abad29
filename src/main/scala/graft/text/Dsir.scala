package graft.text

import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" — public
  * method): score every raw document by how much more likely its hashed
  * n-gram features are under a target distribution than under the raw pool,
  * then keep the highest-importance documents. The workhorse for "make my
  * 100 TB crawl look like Wikipedia" style curation, complementing the
  * absolute quality filters in [[Curation]] (which score documents in
  * isolation; DSIR scores them against a reference corpus).
  *
  * Features are hashed bigrams: bucket = md5(w₁ ⧺ ' ' ⧺ w₂) mod `buckets`
  * (the engine-portable hash idiom used by every sampling operator here).
  * Both unigram models use add-one smoothing over the bucket vocabulary, so
  * the per-occurrence weight of feature f is
  * `ln((cntTarget(f)+1)/(totTarget+B)) − ln((cntRaw(f)+1)/(totRaw+B))` and a
  * document's importance is the sum over its feature OCCURRENCES (bag
  * semantics, as in the paper).
  *
  * Scale: one corpus scan explodes features; ONE groupBy(feature) builds
  * both models simultaneously (the target side is a conditional sum — no
  * second scan of the target slice); the model is `buckets` rows (fixed,
  * e.g. 10⁴) and is broadcast into the per-document re-join; the final
  * per-document sum is a combinable groupBy on doc id. Nothing grows with
  * corpus size except the two linear scans.
  */
object Dsir {

  /** Hash a feature string into [0, buckets). */
  private def bucket(f: Column, buckets: Int): Column =
    conv(substring(md5(f), 1, 15), 16, 10).cast("long") % buckets

  /** Per-document DSIR importance weights.
    *
    * @param targetPred predicate over `docs` rows defining the target slice
    *                   (e.g. `col("lang") === "en"`); the raw model uses all
    *                   rows.
    * @return (doc id, n_features, dsir_score round6)
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, buckets: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc"), targetPred.as("__tgt"),
        split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    // feats feeds the model build AND the per-doc re-join; the B-row model
    // feeds its own totals AND the weight projection — cut each once so
    // the tokenize + md5-bucket pass and the feature aggregation never
    // re-run (optimization guide §1.2 step 1). Partitioning is preserved
    // by the cut, so the per-doc double-sum order is unchanged.
    val feats = toks
      .select(col("doc"), col("__tgt"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 2)).as("i"))
      .select(col("doc"), col("__tgt"),
        bucket(concat_ws(" ", element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)), buckets).as("feat"))
      .cutLineage()
    val model = feats.groupBy(col("feat"))
      .agg(count(lit(1)).cast("long").as("cnt_raw"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("cnt_tgt"))
      .cutLineage()
    val totals = broadcast(model.agg(
      sum(col("cnt_raw")).as("tot_raw"), sum(col("cnt_tgt")).as("tot_tgt")))
    val weights = broadcast(model.crossJoin(totals)
      .select(col("feat"),
        (log((col("cnt_tgt") + 1).cast("double") /
          (col("tot_tgt") + buckets).cast("double")) -
          log((col("cnt_raw") + 1).cast("double") /
            (col("tot_raw") + buckets).cast("double"))).as("lw")))
    feats.join(weights, "feat")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_features"),
        round(sum(col("lw")), 6).as("dsir_score"))
  }

  /** Top-k most target-like documents by DSIR importance, deterministic
    * (score desc, id asc) order — the selection step.
    */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, buckets: Int, k: Int): DataFrame =
    importanceWeights(docs, idCol, textCol, targetPred, buckets)
      .orderBy(col("dsir_score").desc, col("doc").asc)
      .limit(k)
}
