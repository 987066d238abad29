package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Top-k docs for a bag-of-terms query. Deterministic: score rounded to 6
    * decimals (absorbs libm ln ulp differences), ties broken by doc id.
    */
  def scoreTopK(docs: DataFrame, idCol: String, textCol: String,
                queryTerms: Seq[String], k: Int): DataFrame = {
    // Query terms go through the same analyzer as documents (lowercase,
    // strip non-alphanumerics) — otherwise "Hiring" never matches the
    // normalized token "hiring". Dedup keeps df correct for repeated
    // terms; the [a-z0-9]-only result also makes the stack() literal
    // interpolation below injection-proof by construction.
    val terms = queryTerms
      .map(_.toLowerCase.replaceAll("[^a-z0-9]", ""))
      .filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "no query terms survive analysis")
    // ONE tokenize pass + ONE groupBy(doc): the doc length and every
    // query-term tf come out of the same aggregation as conditional
    // counts, then unpivot to (doc, term, tf). Halves the scan/shuffle of
    // the separate doc-length + tf formulation.
    val toks = tokens(docs, idCol, textCol)
    val termAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1).otherwise(0)).cast("double").as(s"__tf_$i")
    }
    val wide = toks.groupBy(col("doc"))
      .agg(count(lit(1)).cast("double").as("len"), termAggs: _*)
    val corpus = wide.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(col("len")) / count(lit(1)).cast("double")).as("avglen"))
    val stackArgs = terms.zipWithIndex
      .map { case (t, i) => s"'$t', __tf_$i" }.mkString(", ")
    val tf = wide.select(col("doc"), col("len"),
        expr(s"stack(${terms.size}, $stackArgs) AS (term, tf)"))
      .filter(col("tf") > 0)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(K1 + 1) /
      (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("len") / col("avglen")))
    // len already rides along with tf from the wide aggregation — no
    // doc-length re-join needed.
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc"))
      .agg(round(sum(idf * tfNorm), 6).as("score"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }
}
