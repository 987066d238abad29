package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Mirrors the reference's scan surface (SURVEY.md §2.1): parquet scans
  * (`Spark/Word_cloud_evaluation.ipynb` cell 4) are the canonical input here;
  * JSON/CSV scans live in [[graft.sources]].
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  /** events.parquet's `ts` physical type has changed across testdata
    * generations — TIMESTAMP(NANOS) originally, TIMESTAMP(MICROS)/NTZ now —
    * so branch on the type Spark actually reads rather than assuming one:
    *
    *  - `LongType`: raw int64 nanos (via the legacy `nanosAsLong` conf).
    *    Truncate to micros with integer division — ns-since-epoch (~1.7e18)
    *    exceeds double precision, so `DIV`, never `/`. DuckDB's ns→µs cast
    *    truncates the same way, keeping oracle parity.
    *  - `TimestampNTZType`: cast to the session-TZ timestamp. The session TZ
    *    is pinned UTC (build.sbt), and DuckDB reads the same column naively,
    *    so wall-clock values — and oracle hashes — are identical.
    *  - `TimestampType`: pass through.
    *
    * TIMESTAMP(NANOS) fails schema inference outright unless `nanosAsLong`
    * is set, so only flip that conf on the retry path — never as an
    * unconditional session mutation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df =
      try apply(spark, dir, "events")
      catch {
        case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          apply(spark, dir, "events")
      }
    df.schema("ts").dataType match {
      case LongType        => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _               => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
