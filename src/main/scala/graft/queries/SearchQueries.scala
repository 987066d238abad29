package graft.queries

import graft.search.BM25
import graft.util.{Num, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's three online query shapes (SURVEY.md §3.3) as Spark
  * queries: BM25 keyword relevance, hashtag exact-match, user timeline —
  * each one relational join/agg algebra instead of Solr round-trips.
  */
object SearchQueries extends QueryPack {

  /** Fixed two-term query: double summation over 2 per-term scores is
    * order-independent (IEEE addition is commutative), keeping the score
    * bit-identical to the oracle under any partitioning.
    */
  val QueryTerms: Seq[String] = Seq("spark", "query")

  /** Shared BM25 CTE prefix for the oracle SQL (DuckDB). Mirrors
    * [[graft.search.BM25.scoreTopK]] shape for shape.
    */
  private val bm25Cte =
    """WITH toks AS (SELECT doc, term FROM (
      |    SELECT doc_id AS doc, unnest(string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+')) AS term
      |    FROM documents) WHERE length(term) > 0),
      |dl AS (SELECT doc, CAST(COUNT(*) AS DOUBLE) AS len FROM toks GROUP BY doc),
      |corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |  SUM(len) / CAST(COUNT(*) AS DOUBLE) AS avglen FROM dl),
      |tf AS (SELECT doc, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
      |  WHERE term IN ('spark', 'query') GROUP BY doc, term),
      |dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |scored AS (
      |  SELECT t.doc, round(SUM(
      |    ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) *
      |    (t.tf * 2.2 / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avglen)))
      |  ), 6) AS score
      |  FROM tf t JOIN dfreq d USING (term) JOIN dl USING (doc) CROSS JOIN corpus c
      |  GROUP BY t.doc),
      |top10 AS (SELECT doc, score FROM scored ORDER BY score DESC, doc ASC LIMIT 10)
      |""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Keyword relevance search, rows=10 (`SolrRanker.java:66-91`).
    "q_keyword_bm25" -> ((s, dir) =>
      BM25.scoreTopK(Tables.documents(s, dir), "doc_id", "text", QueryTerms, k = 10)),

    // …then joined to its "users" side — the reference resolves each result
    // tweet's author with N+1 Solr point lookups (`SolrRanker.java:58-64`);
    // here it is one broadcast join against per-source stats.
    "q_keyword_join_source" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val top = BM25.scoreTopK(docs, "doc_id", "text", QueryTerms, k = 10)
      val srcStats = docs.groupBy(col("source"))
        .agg(Num.cnt.as("src_docs"), sum(col("n_chars")).cast("long").as("src_chars"))
      top.join(docs.select(col("doc_id").as("doc"), col("source")), "doc")
        .join(broadcast(srcStats), "source")
        .select(col("doc"), col("score"), col("source"), col("src_docs"), col("src_chars"))
    }),

    // Hashtag exact-match, rows=1000 (`SolrRanker.java:93-118`):
    // `array_contains` over the token array ~ `tweetHashtags:'<tag>'`.
    "q_hashtag_search" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(array_contains(split(col("text"), " "), "spark"))
        .orderBy(col("doc_id").asc)
        .limit(1000)
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // User timeline: name lookup → FK expansion → sorted limit 1000
    // (`SolrRanker.java:129-159`), customer/orders standing in for
    // users/tweets per FIXTURES.md §4.
    "q_user_timeline" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_name") === "Customer#000000042")
      Tables.orders(s, dir)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1000)
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_keyword_bm25" -> (bm25Cte + "SELECT doc, score FROM top10"),

    "q_keyword_join_source" -> (bm25Cte +
      """, src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS src_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS src_chars FROM documents GROUP BY source)
        |SELECT t.doc, t.score, d.source, s.src_docs, s.src_chars
        |FROM top10 t JOIN documents d ON t.doc = d.doc_id
        |JOIN src s ON d.source = s.source""".stripMargin),

    "q_hashtag_search" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE list_contains(str_split(text, ' '), 'spark')
        |ORDER BY doc_id ASC LIMIT 1000""".stripMargin,

    "q_user_timeline" ->
      """SELECT c_name, o_orderkey, o_orderdate, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_name = 'Customer#000000042'
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1000""".stripMargin
  )
}
