package graft.search

import graft.util.CacheLedger.CacheOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** BM25 relevance scoring as DataFrame algebra — the Spark-native
  * re-expression of the reference's Solr/Lucene ranking
  * (`Ranking Model/src/main/java/Main/SolrRanker.java:66-91`, BM25 similarity
  * selected at `SolrTemplates/SolrFieldType.java:48-51`).
  *
  * Instead of an inverted index, the postings/stats relations are computed as
  * plain aggregations (SURVEY.md §7.3):
  *
  *   postings(doc, term, tf)   — tokenize + explode + groupBy(doc, term)
  *   docstats(doc, len)        — groupBy(doc)
  *   termstats(term, df)       — groupBy(term) over the query terms only
  *   corpus(n, avglen)         — global agg, 1 row
  *
  * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
  * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's BM25 idf).
  *
  * Scale shape: the only shuffles are groupBy(doc[,term]) over *query-term
  * postings* (tiny — terms are filtered before aggregation) plus the full
  * doc-length scan; termstats/corpus are broadcast. At 100 TB, doc lengths
  * would be precomputed once and reused across queries — `docStats` is
  * exposed separately for exactly that.
  */
object BM25 {

  val K1 = 1.2
  val B  = 0.75

  /** Analyzer: lowercase, strip non-alphanumerics, split on whitespace —
    * the semantics of the reference's Solr query/index analyzers
    * (`SolrSetup.java:105`, ClassicTokenizer + lowercase), without which
    * "hiring!" never matches the query term "hiring".
    */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(split(regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", ""), "\\s+"))
          .as("term"))
      .filter(length(col("term")) > 0)

  /** [[tokens]] with the token's ordinal in the analyzed stream:
    * (doc, pos, term), pos 0-based over the post-filter stream (empty
    * tokens from leading/doubled separators never consume a position, so
    * "adjacent" always means pos+1). This is the per-token view Lucene's
    * positional postings are built from.
    */
  def tokensWithPos(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(filter(
          split(regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", ""), "\\s+"),
          t => length(t) > 0)))
      .toDF("doc", "pos", "term")

  /** Full postings relation (doc, term, tf) — the precomputed "inverted
    * index" for a serving deployment: persist/bucket it by term and reuse
    * across many queries, exactly as Solr reuses its index. For a single
    * ad-hoc query [[scoreTopK]] deliberately does NOT build it — filtering
    * tokens to the query terms *before* any aggregation is far cheaper than
    * materializing all postings (measured 4× at sf0.1).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** (doc, len) — reusable across queries; persist/bucket at scale. */
  def docStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("double").as("len"))

  /** Query-side analyzer: same normalization as document [[tokens]]
    * (lowercase, strip non-alphanumerics) — otherwise "Hiring" never matches
    * the normalized token "hiring". Dedup keeps df correct for repeated
    * terms; the [a-z0-9]-only result also makes stack() literal
    * interpolation injection-proof by construction.
    */
  def analyze(queryTerms: Seq[String]): Seq[String] =
    queryTerms.map(_.toLowerCase.replaceAll("[^a-z0-9]", ""))
      .filter(_.nonEmpty).distinct

  /** UAX#29-flavored token pattern — the reference indexes with Lucene's
    * ClassicTokenizer / UAX29URLEmailTokenizer
    * (`SolrTemplates/SolrFieldType.java:39-45`), under which URLs, emails
    * and @mentions/#hashtags survive as SINGLE tokens — exactly the shapes
    * a Twitter corpus is full of and the whitespace analyzer shatters.
    * Re-expressed as a leftmost-first regex alternation (public Unicode
    * UAX#29 word-boundary spec + Lucene's URL/email extension):
    * URL | email | mention/hashtag | word (interior apostrophes kept,
    * trailing possessive 's stripped afterwards = ClassicFilter).
    * RE2-compatible (no lookaround/backreferences) so the DuckDB oracle
    * runs the byte-identical pattern.
    */
  val UaxPattern: String =
    "(https?://[^\\s]+" +
      "|[a-z0-9._%+-]+@[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?" +
      "|[@#][a-z0-9_]+" +
      "|[a-z0-9]+(?:'[a-z0-9]+)*)"

  /** [[tokens]] with the UAX#29-style analyzer — selectable per field via
    * [[scoreAllUax]]/[[scoreTopKUax]].
    */
  def tokensUax(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(regexp_extract_all(lower(col(textCol)), lit(UaxPattern), lit(1)))
          .as("__raw"))
      .select(col("doc"), regexp_replace(col("__raw"), "'s$", "").as("term"))
      .filter(length(col("term")) > 0)

  /** Query-side UAX analyzer: lowercase, keep the first UAX token of each
    * input term (so "https://spark.apache.org/docs" stays whole), strip the
    * possessive — mirroring [[tokensUax]] exactly.
    */
  def analyzeUax(queryTerms: Seq[String]): Seq[String] = {
    val p = java.util.regex.Pattern.compile(UaxPattern)
    queryTerms.map(_.toLowerCase).flatMap { t =>
      val m = p.matcher(t)
      if (m.find()) Some(m.group(1).replaceAll("'s$", "")) else None
    }.filter(_.nonEmpty).distinct
  }

  /** Lucene ClassicTokenizer + ClassicFilter parity — the OTHER analyzer
    * the reference's field-type template offers
    * (`SolrTemplates/SolrFieldType.java:41`, solr.ClassicTokenizerFactory).
    * The classic grammar's documented behaviors (public Lucene
    * ClassicTokenizerImpl.jflex), re-expressed as a leftmost-first
    * alternation + a per-token rewrite, so both engines run the identical
    * pipeline:
    *  - EMAIL and COMPANY ("at&t") tokens survive whole;
    *  - ACRONYM ("u.s.a.") survives, with its dots removed by the filter;
    *  - HOST ("spark.apache.org") survives whole — dots are NOT split;
    *  - hyphen/underscore/slash/comma compounds split into their parts
    *    UNLESS they contain a digit ("wi-fi" → wi, fi; "x-100", "1,000"
    *    stay whole — the classic NUM rule);
    *  - the possessive 's folds onto its stem (ClassicFilter).
    * Ordering in the alternation is what makes it leftmost-correct:
    * EMAIL before HOST (an email ends in a host), ACRONYM before HOST
    * (single letters + dots), HOST before the compound class.
    */
  val ClassicPattern: String =
    "([a-z0-9]+(?:[._-][a-z0-9]+)*@[a-z0-9]+(?:[.-][a-z0-9]+)+" +
      "|[a-z]+[&@][a-z]+" +
      "|[a-z](?:\\.[a-z])+\\.?" +
      "|[a-z0-9]+(?:\\.[a-z0-9]+)+" +
      "|[a-z0-9]+(?:[-_/,][a-z0-9]+)+" +
      "|[a-z0-9]+(?:'[a-z0-9]+)*)"

  private val ClassicAcronymRe = "^[a-z](?:\\.[a-z])+\\.?$"
  private val ClassicCompoundRe = "^[a-z0-9]+(?:[-_/,][a-z0-9]+)+$"

  /** [[tokens]] with the classic analyzer: extract with [[ClassicPattern]],
    * then the filter pass — acronyms lose their dots, digit-free compounds
    * split into parts, possessives fold. One extract + one explode + one
    * conditional re-explode; all codegen string ops, no UDF.
    */
  def tokensClassic(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(regexp_extract_all(lower(col(textCol)), lit(ClassicPattern), lit(1)))
          .as("__raw"))
      .select(col("doc"), explode(
        when(col("__raw").rlike(ClassicAcronymRe),
          array(regexp_replace(col("__raw"), "\\.", "")))
        .when(col("__raw").rlike(ClassicCompoundRe) && !col("__raw").rlike("[0-9]"),
          split(col("__raw"), "[-_/,]"))
        .otherwise(array(regexp_replace(col("__raw"), "'s$", "")))).as("term"))
      .filter(length(col("term")) > 0)

  /** Query-side classic analyzer, mirroring [[tokensClassic]] exactly. */
  def analyzeClassic(queryTerms: Seq[String]): Seq[String] = {
    val p = java.util.regex.Pattern.compile(ClassicPattern)
    queryTerms.map(_.toLowerCase).flatMap { t =>
      val m = p.matcher(t)
      if (!m.find()) Nil
      else {
        val raw = m.group(1)
        if (raw.matches(ClassicAcronymRe)) Seq(raw.replace(".", ""))
        else if (raw.matches(ClassicCompoundRe) && !raw.exists(_.isDigit))
          raw.split("[-_/,]").toSeq
        else Seq(raw.replaceAll("'s$", ""))
      }
    }.filter(_.nonEmpty).distinct
  }

  /** [[scoreAll]] under the classic analyzer. */
  def scoreAllClassic(docs: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String]): DataFrame =
    scoreAllTokens(tokensClassic(docs, idCol, textCol), analyzeClassic(queryTerms))

  def scoreTopKClassic(docs: DataFrame, idCol: String, textCol: String,
                       queryTerms: Seq[String], k: Int): DataFrame =
    scoreAllClassic(docs, idCol, textCol, queryTerms)
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)

  /** Lucene's BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)). */
  def idfExpr(n: Column, df: Column): Column =
    log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))

  /** BM25 tf normalization: tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)). */
  def tfNormExpr(tf: Column, len: Column, avglen: Column): Column =
    tf * lit(K1 + 1) / (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * len / avglen))

  /** Per-field BM25 scores for every matching doc (no ranking cut):
    * (doc, score), score rounded to 6 decimals (absorbs libm ln ulp
    * differences). Field statistics (df, len, avglen, N) are computed over
    * this field only — per-field stats, as Lucene keeps them.
    */
  def scoreAll(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String]): DataFrame =
    scoreAllTokens(tokens(docs, idCol, textCol), analyze(queryTerms))

  /** [[scoreAll]] under the UAX#29-style analyzer — URLs/emails/@mentions
    * match as single terms, possessives fold onto their stem.
    */
  def scoreAllUax(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String]): DataFrame =
    scoreAllTokens(tokensUax(docs, idCol, textCol), analyzeUax(queryTerms))

  /** Shared scoring core over an analyzed (doc, term) token stream.
    * ONE tokenize pass + ONE groupBy(doc): the doc length and every
    * query-term tf come out of the same aggregation as conditional
    * counts, then unpivot to (doc, term, tf). Halves the scan/shuffle of
    * the separate doc-length + tf formulation.
    */
  private def scoreAllTokens(toks: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "no query terms survive analysis")
    val termAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1).otherwise(0)).cast("double").as(s"__tf_$i")
    }
    val wide = toks.groupBy(col("doc"))
      .agg(count(lit(1)).cast("double").as("len"), termAggs: _*)
    val corpus = wide.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(col("len")) / count(lit(1)).cast("double")).as("avglen"))
    // UAX terms may carry quotes/backslashes — escape for the stack()
    // literal (the classic analyzer's [a-z0-9]-only terms pass unchanged)
    val stackArgs = terms.zipWithIndex
      .map { case (t, i) =>
        val esc = t.replace("\\", "\\\\").replace("'", "\\'")
        s"'$esc', __tf_$i"
      }.mkString(", ")
    val tf = wide.select(col("doc"), col("len"),
        expr(s"stack(${terms.size}, $stackArgs) AS (term, tf)"))
      .filter(col("tf") > 0)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    // len already rides along with tf from the wide aggregation — no
    // doc-length re-join needed.
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc"))
      .agg(round(sum(idfExpr(col("n"), col("df")) *
        tfNormExpr(col("tf"), col("len"), col("avglen"))), 6).as("score"))
  }

  /** Top-k docs for a bag-of-terms query over ONE text field. Deterministic:
    * rounded score ordering, ties broken by doc id.
    */
  def scoreTopK(docs: DataFrame, idCol: String, textCol: String,
                queryTerms: Seq[String], k: Int): DataFrame =
    scoreAll(docs, idCol, textCol, queryTerms)
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)

  /** More-Like-This — Solr's MLT handler as one plan: the seed doc's most
    * interesting terms (top `nTerms` by tf·idf within the seed,
    * deterministic term tiebreak) become the query, and the corpus is
    * BM25-ranked on them with the seed excluded. The term set is DATA — a
    * broadcast `nTerms`-row frame feeding a term equi-join — so nothing
    * collects to the driver and the chain stays one lazy plan. One
    * tokenize pass feeds tf, doc-length, df, seed-term selection, and the
    * final scoring; at scale tf/df/dl are exactly the [[BM25Index]]
    * postings tables, so the served variant is a three-join over the
    * prebuilt index.
    */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
                   seedId: Long, nTerms: Int, k: Int,
                   minDf: Double = 1.0): DataFrame = {
    require(nTerms > 0 && k > 0, "nTerms and k must be positive")
    val toks = tokens(docs, idCol, textCol).persistBounded()
    val dl = toks.groupBy(col("doc")).agg(count(lit(1)).cast("double").as("len"))
    val corpus = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum(col("len")) / count(lit(1)).cast("double")).as("avglen"))
    val tfAll = toks.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tfAll.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    // Solr MLT's mlt.mindf: terms too rare in the corpus are noise, not
    // signal — excluded from the interesting-term budget
    val seedTerms = tfAll.filter(col("doc") === seedId)
      .join(dfreq, "term")
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(corpus))
      .withColumn("tfidf", round(col("tf") * idfExpr(col("n"), col("df")), 6))
      .orderBy(col("tfidf").desc, col("term").asc)
      .limit(nTerms)
      .select(col("term"))
    tfAll.join(broadcast(seedTerms), "term")
      .filter(col("doc") =!= seedId)
      .join(dfreq, "term")
      .join(dl, "doc")
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc"))
      .agg(round(sum(idfExpr(col("n"), col("df")) *
        tfNormExpr(col("tf"), col("len"), col("avglen"))), 6).as("score"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** Docs whose ANALYZED token stream contains `phrase` consecutively —
    * Solr/Lucene's quoted-phrase match. The probe is the analyzer
    * normalization (lower, strip non-alphanumerics, collapse whitespace)
    * plus a space-padded substring Contains: semantically "consecutive
    * analyzed tokens", executed as one codegen'd predicate that rides the
    * scan — no positional self-join, no shuffle. (A positions index would
    * serve high-QPS phrase queries; for analytics the scan-speed predicate
    * is the right 100 TB shape.)
    */
  def phraseMatches(docs: DataFrame, textCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val needle = phrase.map(_.toLowerCase).mkString(" ")
    val norm = regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", ""), "\\s+", " ")
    docs.filter(concat(lit(" "), norm, lit(" ")).contains(s" $needle "))
  }

  /** Quoted-phrase query: phrase containment filter, then BM25 over the
    * phrase terms with statistics on the match set (the phrase-filtered
    * corpus — documented choice; Lucene scores phrases from positional
    * postings against full-corpus stats, which needs the positions index
    * above).
    */
  def scoreTopKPhrase(docs: DataFrame, idCol: String, textCol: String,
                      phrase: Seq[String], k: Int): DataFrame =
    scoreTopK(phraseMatches(docs, textCol, phrase), idCol, textCol, phrase, k)

  /** [[scoreTopK]] under the UAX#29-style analyzer. */
  def scoreTopKUax(docs: DataFrame, idCol: String, textCol: String,
                   queryTerms: Seq[String], k: Int): DataFrame =
    scoreAllUax(docs, idCol, textCol, queryTerms)
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)

  /** Multi-field top-k — the reference's `tweetText:<q> OR tweetMediaText:
    * <q>` (`Ranking Model/src/main/java/Main/SolrRanker.java:76`; the media
    * field is declared at `SolrTemplates/SolrSetup.java:128-130`). Lucene
    * scores each field's subquery with that field's own statistics and the
    * boolean OR sums them; docs matching in EITHER field rank. Same here:
    * per-field [[scoreAll]], full-outer join on doc, missing field = 0.
    */
  def scoreTopKFields(docs: DataFrame, idCol: String, textCols: Seq[String],
                      queryTerms: Seq[String], k: Int): DataFrame =
    scoreTopKFieldsBoosted(docs, idCol, textCols.map(_ -> 1.0), queryTerms, k)

  /** [[scoreTopKFields]] with per-field boosts — Solr/edismax's
    * `qf=tweetText^2 tweetMediaText^1`: each field's BM25 subscore is
    * multiplied by its boost before the OR-sum, exactly Lucene's
    * BoostQuery-around-per-field-query composition. Boost application is
    * one multiply per (doc, field) pair that matched — plan shape is
    * unchanged from the unboosted query.
    */
  def scoreTopKFieldsBoosted(docs: DataFrame, idCol: String,
                             fieldBoosts: Seq[(String, Double)],
                             queryTerms: Seq[String], k: Int): DataFrame = {
    require(fieldBoosts.nonEmpty, "at least one field")
    val combined = fieldBoosts.map { case (f, boost) =>
        scoreAll(docs, idCol, f, queryTerms)
          .select(col("doc"), (col("score") * lit(boost)).as("score"))
      }
      .reduce { (a, b) =>
        a.select(col("doc"), col("score").as("__sa"))
          .join(b.select(col("doc"), col("score").as("__sb")), Seq("doc"), "full_outer")
          .select(col("doc"),
            (coalesce(col("__sa"), lit(0.0)) + coalesce(col("__sb"), lit(0.0))).as("score"))
      }
    combined.select(col("doc"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** Solr function-query boosting (`bf=<additive boost>` on the edismax
    * handler): final score = BM25 + f(doc fields), with f supplied as a
    * Column over `docs`' columns. The boost is a codegen'd projection on
    * the match set — it never touches non-matching docs (Lucene evaluates
    * the ValueSource only for candidate docs the same way). Deterministic
    * as long as `boost` is (round-6 applied after the sum).
    */
  def scoreTopKBoosted(docs: DataFrame, idCol: String, textCol: String,
                       queryTerms: Seq[String], boost: Column, k: Int): DataFrame =
    scoreAll(docs, idCol, textCol, queryTerms)
      .join(docs.select(col(idCol).as("doc"), boost.as("__bf")), "doc")
      .select(col("doc"), round(col("score") + col("__bf"), 6).as("score"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)

  /** Solr filter query (`fq=` alongside `q=`): the filter restricts the
    * RESULT SET but does not participate in scoring — BM25 statistics
    * (df, N, avglen) stay corpus-wide, exactly Solr's q/fq split (an fq is
    * a cached bitset intersected post-scoring). Contrast
    * [[scoreTopKPhrase]], where the phrase IS the query and stats follow
    * the match set.
    */
  def scoreTopKFiltered(docs: DataFrame, idCol: String, textCol: String,
                        queryTerms: Seq[String], fq: Column, k: Int): DataFrame =
    scoreAll(docs, idCol, textCol, queryTerms)
      .join(docs.filter(fq).select(col(idCol).as("doc")), "doc")
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
}
