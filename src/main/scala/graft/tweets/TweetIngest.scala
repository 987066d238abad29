package graft.tweets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live-stream ingest — the reference's DataCollector is a Tweepy
  * `StreamListener` that receives one tweet JSON document per push and
  * appends it to the current batch file (`DataCollector/datacollector.py`).
  * The non-public part is only the Twitter credentials; the public shape —
  * a long-lived connection delivering newline-delimited tweet JSON — is
  * exactly Structured Streaming's socket source.
  *
  * Two ingest forms, one pipeline:
  *  - [[socketStream]]: live socket of NDJSON tweets (this file);
  *  - the ordered-file replay (`StreamingPipelineSpec`), the reference's
  *    actual at-rest layout, for reprocessing.
  * Both feed [[TweetNormalize.processStreaming]] unchanged — ingest is a
  * parse, the pipeline does not care where bytes came from.
  *
  * Scale note: the socket source is single-connection (Spark's own demo
  * source) — at production rate the same NDJSON lines land on a
  * partitioned log (Kafka) and ONLY this parse layer changes
  * (`format("kafka")` + `$"value".cast("string")`); normalize, hiring
  * filter, and watermarked dedup are already per-key parallel.
  */
object TweetIngest {

  /** Parse a stream/frame of raw JSON lines (`value: string`) into the
    * nested tweet schema. A malformed line parses to null and is dropped —
    * a poison tweet must never kill the ingest job (the reference's
    * listener equally swallows per-document errors to keep the stream up).
    */
  def fromJsonLines(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value"), TweetSchema.raw).as("t"))
      .filter(col("t").isNotNull && col("t.id").isNotNull)
      .select("t.*")

  /** Live socket ingest: NDJSON tweets on host:port → raw tweet frame. */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    fromJsonLines(spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port.toString)
      .load())

  /** The full live pipeline: socket → normalize → hiring filter →
    * watermarked dedup (SURVEY.md §2.10's streaming column).
    */
  def socketPipeline(spark: SparkSession, host: String, port: Int,
                     watermark: String = "1 day",
                     dedupKeys: Seq[String] = Seq("org_id")): DataFrame =
    TweetNormalize.processStreaming(socketStream(spark, host, port), watermark,
      dedupKeys)
}
