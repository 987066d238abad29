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
  * Scale note on the budget stage: the running sum is a TWO-PHASE
  * range-partitioned quota, never a global-order window. Rows are bucketed
  * by an approx-percentile ttr histogram (monotone in the (ttr desc, id)
  * sort order, so equal-ttr rows can never straddle a bucket), per-bucket
  * token subtotals become broadcast cumulative offsets, buckets whose
  * offset already exceeds the budget are pruned BEFORE the sort, and the
  * within-bucket running sum + offset reproduces the global cumulative sum
  * exactly (the [[TextAnalysis.packChunks]] partitioned-window idiom).
  * Histogram accuracy only balances buckets — any boundaries give the
  * byte-identical result.
  */
object Curation {

  def curate(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
             lang: String, minTtr: Double, tokenBudget: Long,
             lexicon: Seq[(String, String)] = Lexicons.langLexicon): DataFrame = {
    val keep = Dedup.exact(docs, idCol, textCol).select(col("keep_id").as(idCol))
    curateFrom(spark, docs, keep, idCol, textCol, lang, minTtr, tokenBudget, lexicon)
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
                    lexicon: Seq[(String, String)] = Lexicons.langLexicon): DataFrame =
    curateNearDupPairs(spark, docs,
      Dedup.simHashPairs(docs, idCol, textCol, maxHamming = 3),
      idCol, textCol, lang, minTtr, tokenBudget, lexicon)

  /** [[curateNearDup]] with a PRECOMPUTED near-dup pair list (e.g. mined
    * from the persisted [[graft.dedup.SimHashStore]] signatures) — the
    * serving split: the pipeline that already maintains a signature store
    * should not re-hash the corpus to curate from it.
    */
  def curateNearDupPairs(spark: SparkSession, docs: DataFrame, pairs: DataFrame,
                         idCol: String, textCol: String, lang: String,
                         minTtr: Double, tokenBudget: Long,
                         lexicon: Seq[(String, String)] = Lexicons.langLexicon): DataFrame = {
    val keep = Dedup.clusters(docs, idCol, pairs)
      .filter(col("kept")).select(col(idCol))
    curateFrom(spark, docs, keep, idCol, textCol, lang, minTtr, tokenBudget, lexicon)
  }

  private def curateFrom(spark: SparkSession, docs: DataFrame, keep: DataFrame,
                         idCol: String, textCol: String, lang: String,
                         minTtr: Double, tokenBudget: Long,
                         lexicon: Seq[(String, String)]): DataFrame = {
    val filtered = keep
      .join(qualityLangOnePass(docs, idCol, textCol, lexicon), idCol)
      .filter(col("pred_lang") === lang && col("ttr") >= minTtr)
      .select(col(idCol), col("n_tokens"), col("ttr"))
    budgetCutoff(filtered, idCol, tokCol = "n_tokens", ordCol = "ttr",
      budget = tokenBudget)
  }

  /** The quality (ttr) and language-ID stats curation needs, in ONE
    * aggregation over ONE tokenize — composing the standalone
    * [[TextAnalysis.quality]] + [[TextAnalysis.langId]] operators scans
    * and explodes the corpus TWICE, a full extra pass over 100 TB of
    * text. Per-language match counts become conditional sums over the
    * broadcast-literal lexicon (a term listed under several languages
    * counts for each, same as the join formulation); the argmax is an
    * `array_max` over (matches, -langIndex) structs — max matches, ties
    * to the alphabetically-first language, zero matches ⇒ 'und' —
    * reproducing [[TextAnalysis.langId]]'s windowed-argmax contract
    * without the window or the second scan.
    */
  private def qualityLangOnePass(docs: DataFrame, idCol: String, textCol: String,
                                 lexicon: Seq[(String, String)]): DataFrame = {
    val langs = lexicon.map(_._2).distinct.sorted
    val terms = langs.map(l => l -> lexicon.filter(_._2 == l).map(_._1))
    val matchSums = terms.map { case (l, ts) =>
      sum(when(col("term").isin(ts: _*), 1L).otherwise(0L)).cast("long").as(s"__m_$l")
    }
    val best = array_max(array(terms.zipWithIndex.map { case ((l, _), i) =>
      struct(col(s"__m_$l").as("m"), lit(-i).as("ni"))
    }: _*))
    val aggCols = Seq(
      count(lit(1)).cast("long").as("n_tokens"),
      round(countDistinct(col("term")).cast("double") /
        count(lit(1)).cast("double"), 6).as("ttr")) ++ matchSums
    TextAnalysis.tokens(docs, idCol, textCol)
      .groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("__best", best)
      .withColumn("pred_lang",
        when(col("__best.m") === 0L, lit("und"))
          .otherwise(element_at(lit(langs.toArray), (-col("__best.ni")).cast("int") + 1)))
      .select(col(idCol), col("n_tokens"), col("ttr"), col("pred_lang"))
  }

  /** Spend `budget` over `rows` in (ordCol DESC, idCol ASC) order: keep the
    * maximal prefix whose running `tokCol` sum stays ≤ budget, with the
    * exact global cumulative sum attached as `cum_tokens`. The standalone
    * two-phase range-partitioned quota — the budget stage of [[curate]],
    * public because "take the best items until the budget is spent" is its
    * own recurring pipeline operator:
    *
    *  1. an approx-percentile histogram of `ordCol` assigns each row a
    *     range id (= #boundaries above its value — non-increasing in
    *     ordCol, so range order strictly refines the sort order and
    *     equal-ordCol rows can never straddle a range);
    *  2. per-range token subtotals become broadcast cumulative offsets
    *     (non-equi self-join over ≤ nRanges rows — no global window
    *     anywhere, the suite-wide plan guard holds);
    *  3. ranges whose offset already exceeds the budget are pruned BEFORE
    *     the sort, and the within-range partitioned running sum + offset
    *     reproduces the global cumulative sum exactly.
    *
    * Histogram accuracy only balances the ranges; ANY boundaries give the
    * byte-identical result (property-tested against the naive global
    * window on random inputs incl. heavy ties).
    */
  def budgetCutoff(rows: DataFrame, idCol: String, tokCol: String,
                   ordCol: String, budget: Long, nRanges: Int = 32): DataFrame = {
    val outCols = rows.columns.map(col).toSeq :+ col("cum_tokens")
    val probs = array((1 until nRanges).map(i => lit(i.toDouble / nRanges)): _*)
    val bounds = rows.agg(
      percentile_approx(col(ordCol), probs, lit(1000)).as("__bounds"))
    // Column-API lambda (not string interpolation) so ordCol names that
    // need quoting or collide with SQL keywords still resolve correctly
    val ranged = rows.crossJoin(broadcast(bounds))
      .withColumn("__rng",
        size(filter(col("__bounds"), b => b > col(ordCol))).cast("long"))
      .drop("__bounds")
    val perRange = ranged.groupBy(col("__rng"))
      .agg(sum(col(tokCol)).cast("long").as("__rng_tokens"))
    val offsets = perRange.alias("a")
      .join(broadcast(perRange.alias("b")),
        col("b.__rng") < col("a.__rng"), "left")
      .groupBy(col("a.__rng").as("__rng"))
      .agg(coalesce(sum(col("b.__rng_tokens")), lit(0L)).as("__tokens_before"))
    val w = Window.partitionBy(col("__rng"))
      .orderBy(col(ordCol).desc, col(idCol).asc)
    ranged
      .join(broadcast(offsets), "__rng")
      .filter(col("__tokens_before") <= budget)
      .withColumn("cum_tokens",
        col("__tokens_before") + sum(col(tokCol)).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(outCols: _*)
  }

  /** Execute a [[mixturePlan]]: per source, take documents in
    * deterministic md5-hash order until the planned token budget is
    * filled. Hash order = an unbiased, reproducible shuffle (same idiom
    * as stratified sampling — no rand()); the cumulative cutoff is exact
    * integer arithmetic. Returns the surviving
    * (source, doc, n_tokens, cum_tokens) rows.
    *
    * Scale shape: the per-source running sum is the [[budgetCutoff]]
    * two-phase range-partitioned quota, NOT a per-source global window —
    * with ~10 sources at 100 TB a `Window.partitionBy(source)` funnels the
    * whole corpus through 10 window partitions, the exact skew
    * `budgetCutoff` was built to kill. Here the range id needs no
    * histogram pass: md5 is uniform by construction, so the first hash
    * byte buckets rows into `nRanges` equal ranges, and lowercase-hex
    * lexicographic order refines (prefix-byte, full-hash) order, so
    * equal-range rows can never straddle a boundary. Per-(source, range)
    * subtotals become cumulative offsets (a window over the ≤
    * sources×nRanges aggregate rows, not the corpus), ranges whose offset
    * already exceeds the source's plan are pruned BEFORE the sort, and
    * within-range running sum + offset reproduces the per-source
    * cumulative sum exactly (property-tested against the naive window).
    */
  def mixtureSample(docs: DataFrame, groupCol: String, idCol: String,
                    textCol: String, nRanges: Int = 32): DataFrame = {
    require(nRanges >= 1 && nRanges <= 256,
      "nRanges must be in [1, 256] (ranges come from the first hash byte)")
    val plan = mixturePlan(docs, groupCol, textCol)
      .select(col(groupCol), col("planned_tokens"))
    val toks = docs
      .select(col(groupCol), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__rng",
        expr(s"CAST(conv(substring(__h, 1, 2), 16, 10) AS BIGINT) * $nRanges DIV 256"))
    val offsets = toks.groupBy(col(groupCol), col("__rng"))
      .agg(sum(col("n_tokens")).cast("long").as("__rt"))
      .withColumn("__tokens_before", coalesce(
        sum(col("__rt")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__rng").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__rng"), col("__tokens_before"))
    val w = Window.partitionBy(col(groupCol), col("__rng"))
      .orderBy(col("__h").asc, col(idCol).asc)
    toks
      .join(broadcast(offsets), Seq(groupCol, "__rng"))
      .join(broadcast(plan), groupCol)
      .filter(col("__tokens_before") <= col("planned_tokens"))
      .withColumn("cum_tokens",
        col("__tokens_before") + sum(col("n_tokens")).over(w))
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
  /** Weighted mixture planning — [[mixturePlan]] with NON-uniform integer
    * weights ("parts", the ratio notation mixing configs actually use):
    * target_s = total · parts_s DIV Σparts. INTEGER arithmetic throughout,
    * so the plan stays engine-exact — double weight fractions would make
    * planned counts rounding-ambiguous across engines. `parts` is a small
    * (groupCol, parts: long) dim table, broadcast; sources absent from it
    * get parts = 0 (target 0 ⇒ excluded, zero deficit). Same plan shape
    * as the uniform variant: one scan + one combinable groupBy + 1-row
    * broadcast totals.
    */
  def mixturePlanWeighted(docs: DataFrame, groupCol: String, textCol: String,
                          parts: DataFrame): DataFrame = {
    val ns = docs
      .select(col(groupCol), size(split(col(textCol), " ")).cast("long").as("__n"))
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).cast("long").as("n_tokens"))
    val wp = ns
      .join(broadcast(parts), Seq(groupCol), "left")
      .select(col(groupCol), col("n_tokens"),
        coalesce(col("parts"), lit(0L)).cast("long").as("parts"))
    val tot = wp.agg(sum(col("n_tokens")).cast("long").as("__tot"),
      sum(col("parts")).cast("long").as("__p"))
    wp.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_tokens"), col("parts"),
        expr("__tot * parts DIV __p").cast("long").as("target_tokens"),
        expr("least(n_tokens, __tot * parts DIV __p)").cast("long").as("planned_tokens"),
        expr("greatest(0L, __tot * parts DIV __p - n_tokens)").cast("long").as("deficit_tokens"))
  }

  /** α-weighted mixture plan at α = 1/2 — the multilingual sampling rule
    * (sample ∝ n^α with α < 1 to up-weight low-resource sources; α = 0.5
    * is the canonical choice in public multilingual-pretraining recipes).
    * parts_s = floor(sqrt(n_tokens_s)): IEEE-754 sqrt is correctly
    * rounded, so the integer parts — and therefore the whole integer
    * allocation — stay engine-exact. A general-α variant would route
    * through pow(), whose last-ulp behaviour differs across libm
    * implementations; that cross-engine ambiguity is why the shipped knob
    * is the exactly-computable α = 1/2. Same output shape and integer
    * allocation as [[mixturePlanWeighted]], one scan + one groupBy +
    * 1-row broadcast totals.
    */
  def mixturePlanAlpha(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ns = docs
      .select(col(groupCol), size(split(col(textCol), " ")).cast("long").as("__n"))
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).cast("long").as("n_tokens"))
    val wp = ns.select(col(groupCol), col("n_tokens"),
      floor(sqrt(col("n_tokens").cast("double"))).cast("long").as("parts"))
    val tot = wp.agg(sum(col("n_tokens")).cast("long").as("__tot"),
      sum(col("parts")).cast("long").as("__p"))
    wp.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_tokens"), col("parts"),
        expr("__tot * parts DIV __p").cast("long").as("target_tokens"),
        expr("least(n_tokens, __tot * parts DIV __p)").cast("long").as("planned_tokens"),
        expr("greatest(0L, __tot * parts DIV __p - n_tokens)").cast("long").as("deficit_tokens"))
  }

  /** Deterministic source-interleaved global ordering — the "global
    * shuffle" a pretraining pipeline runs before sequence packing, as rank
    * algebra instead of `ORDER BY rand()`: each doc is ranked inside its
    * source by a content-hash key (PARTITIONED window — scales; the
    * suite-wide no-unpartitioned-window guard holds), and the global order
    * is the lexicographic (intl_rank, intl_key) sort — consecutive
    * positions rotate across sources, so no training batch sees a long
    * single-source run. Reproducible by construction: same input, same
    * order, under any partitioning (md5 key, id tiebreak). The global
    * POSITION is deliberately left as the two sort keys rather than a
    * materialized row number — numbering globally would be exactly the
    * single-partition sort this operator exists to avoid; a distributed
    * sort on the keys realizes the order at write time.
    */
  def interleaveOrder(docs: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("intl_key").asc, col(idCol).asc)
    docs
      .withColumn("intl_key", md5(col(idCol).cast("string")))
      .withColumn("intl_rank", row_number().over(w).cast("long"))
  }

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
