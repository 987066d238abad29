package graft.queries

import graft.stats.Profile
import graft.util.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-profiling coverage ([[graft.stats.Profile]]): key-skew audit,
  * ANALYZE-style column profiles, tolerance-checked sketch quantiles.
  */
object StatsQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pre-shuffle skew audit on the events join key.
    "q_skew_audit" -> ((s, dir) =>
      Profile.skewAudit(Tables.events(s, dir), "user_id", k = 10)),

    // Catalog stats for three heterogeneous lineitem columns in one pass.
    "q_table_stats" -> ((s, dir) =>
      Profile.columnProfile(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_quantity", "l_returnflag"))),

    // Sketch quantiles under the tolerance contract (exact value + flag
    // asserting the sketch is within 5%): the q_approx_distinct pattern.
    "q_approx_quantiles" -> ((s, dir) =>
      Profile.approxQuantiles(Tables.documents(s, dir), "n_chars",
        ps = Seq(0.5, 0.9, 0.99), accuracy = 10000, tol = 0.05))
  )

  override def oracleSql: Map[String, String] = Map(
    "q_skew_audit" ->
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM events GROUP BY user_id),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM events),
        |topk AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 10)
        |SELECT user_id, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS BIGINT) AS rnk,
        |  round(n / t, 6) AS share
        |FROM topk CROSS JOIN tot""".stripMargin,

    "q_table_stats" ->
      """SELECT 'l_orderkey' AS "column", CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_str, CAST(MAX(l_orderkey) AS VARCHAR) AS max_str
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
        |FROM lineitem""".stripMargin,

    // quantile_cont == Spark's exact `percentile` (both R-7 linear
    // interpolation); the sketch flag is asserted TRUE (tolerance
    // contract — a broken sketch flips the flag and fails the hash gate).
    "q_approx_quantiles" -> Seq(0.5, 0.9, 0.99).map(p =>
      s"""SELECT CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(n_chars, $p), 6) AS exact_value,
         |  TRUE AS within_tol
         |FROM documents""".stripMargin).mkString("\nUNION ALL\n")
  )
}
