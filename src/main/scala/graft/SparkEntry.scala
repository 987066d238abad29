package graft

import graft.queries.{CoreQueries, DedupQueries, SearchQueries, SimilarityQueries, StatsQueries, StreamQueries, TextQueries}
import graft.util.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query pack; each pack covers one slice of the reference's
  * operator inventory (SURVEY.md §2) plus the training-data-pipeline
  * extensions (dedup / similarity / text analysis / multimodal).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    CoreQueries,
    TextQueries,
    SearchQueries,
    DedupQueries,
    SimilarityQueries,
    StreamQueries,
    StatsQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + aggregation — exercises scan, broadcast join, shuffle agg.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
