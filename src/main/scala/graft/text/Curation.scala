package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end training-data curation — the composition a 100 TB pretraining
  * pipeline actually runs, as ONE declarative plan: exact-dedup survivors →
  * language filter → quality filter → token-budget sampling.
  *
  * Stage shapes (each individually oracle-verified by its own query):
  *  - dedup survivors: [[Dedup.exact]] keep-ids (one groupBy(signature));
  *  - language: [[TextAnalysis.langId]] (broadcast lexicon + windowed argmax);
  *  - quality: [[TextAnalysis.quality]] (one groupBy(doc));
  *  - budget: highest-quality docs first until the cumulative token budget
  *    is spent — a running sum over (ttr desc, id).
  *
  * Scale note on the budget stage: the global-order running sum runs over
  * the FILTERED doc METADATA (id, n_tokens, ttr — three narrow columns),
  * never the text, so the single-direction sort is over a tiny fraction of
  * input bytes. At extreme candidate counts replace it with a two-phase
  * quota (range-partition by ttr from a sampled histogram, spend the budget
  * per range) — same semantics up to the boundary partition.
  */
object Curation {

  def curate(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
             lang: String, minTtr: Double, tokenBudget: Long,
             stopwords: Seq[String] = Lexicons.enStop,
             lexicon: Seq[(String, String)] = Lexicons.langLexicon): DataFrame = {
    val keep = Dedup.exact(docs, idCol, textCol).select(col("keep_id").as(idCol))
    curateFrom(spark, docs, keep, idCol, textCol, lang, minTtr, tokenBudget,
      stopwords, lexicon)
  }

  /** [[curate]] with NEAR-dup cluster dedup instead of exact: survivors are
    * the connected-component representatives of [[Dedup.simHashPairs]]
    * resolved by [[Dedup.clusters]] — dropping every non-representative of
    * a near-dup web, not just byte-identical copies. Same downstream
    * stages; the survivor policy (`kept`) is the only change.
    */
  def curateNearDup(spark: SparkSession, docs: DataFrame, idCol: String,
                    textCol: String, lang: String, minTtr: Double,
                    tokenBudget: Long,
                    stopwords: Seq[String] = Lexicons.enStop,
                    lexicon: Seq[(String, String)] = Lexicons.langLexicon): DataFrame = {
    val keep = Dedup.clusters(docs, idCol,
        Dedup.simHashPairs(docs, idCol, textCol, maxHamming = 3))
      .filter(col("kept")).select(col(idCol))
    curateFrom(spark, docs, keep, idCol, textCol, lang, minTtr, tokenBudget,
      stopwords, lexicon)
  }

  private def curateFrom(spark: SparkSession, docs: DataFrame, keep: DataFrame,
                         idCol: String, textCol: String, lang: String,
                         minTtr: Double, tokenBudget: Long,
                         stopwords: Seq[String],
                         lexicon: Seq[(String, String)]): DataFrame = {
    val quality = TextAnalysis.quality(docs, idCol, textCol, stopwords)
    val language = TextAnalysis.langId(spark, docs, idCol, textCol, lexicon)
    val filtered = keep
      .join(quality, idCol)
      .join(language, idCol)
      .filter(col("pred_lang") === lang && col("ttr") >= minTtr)
      .select(col(idCol), col("n_tokens"), col("ttr"))
    val w = Window.orderBy(col("ttr").desc, col(idCol).asc)
    filtered
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= tokenBudget)
  }

  /** Execute a [[mixturePlan]]: per source, take documents in
    * deterministic md5-hash order until the planned token budget is
    * filled. Hash order = an unbiased, reproducible shuffle (same idiom
    * as stratified sampling — no rand()); the cumulative cutoff is exact
    * integer arithmetic over a per-source sorted window. Returns the
    * surviving (source, doc, n_tokens, cum_tokens) rows.
    */
  def mixtureSample(docs: DataFrame, groupCol: String, idCol: String,
                    textCol: String): DataFrame = {
    val plan = mixturePlan(docs, groupCol, textCol)
      .select(col(groupCol), col("planned_tokens"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs
      .select(col(groupCol), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(plan), groupCol)
      .filter(col("cum_tokens") <= col("planned_tokens"))
      .select(col(groupCol), col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Mixture planning: how many tokens to draw per source to approach a
    * uniform target mix — the allocation step before per-source sampling
    * rates are applied. Everything is INTEGER arithmetic (target = total
    * DIV n_sources, planned = min(available, target)), so the plan is
    * engine-exact and free of rate-rounding ambiguity; deficits flag
    * sources that cannot fill their share (the mass a weighting scheme
    * must redistribute). One scan + one combinable groupBy + a 1-row
    * broadcast of the totals.
    */
  def mixturePlan(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ns = docs
      .select(col(groupCol), size(split(col(textCol), " ")).cast("long").as("__n"))
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).cast("long").as("n_tokens"))
    val tot = ns.agg(sum(col("n_tokens")).cast("long").as("__tot"),
      count(lit(1)).cast("long").as("__g"))
    ns.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_tokens"),
        expr("__tot DIV __g").cast("long").as("target_tokens"),
        expr("least(n_tokens, __tot DIV __g)").cast("long").as("planned_tokens"),
        expr("greatest(0L, __tot DIV __g - n_tokens)").cast("long").as("deficit_tokens"))
  }
}
