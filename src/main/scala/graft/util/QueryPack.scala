package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-verifiable queries: each query is a function
  * (session, sf-dir) → DataFrame, optionally paired with ANSI SQL that DuckDB
  * can run over the same parquet tables (the correctness oracle).
  *
  * Column names MUST match between the Spark result and the oracle SQL — the
  * driver sorts columns by name before hashing values.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
