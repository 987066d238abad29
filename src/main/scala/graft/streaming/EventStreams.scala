package graft.streaming

import graft.util.Num
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Structured Streaming jobs over the events stream (SURVEY.md §2.10 — the
  * reference has no true streaming; its 2-hour file replay becomes a file
  * source / these transforms run identically on batch and streaming frames).
  *
  * Each transform takes a DataFrame that may be batch (`spark.read`) or
  * streaming (`spark.readStream`): same plan, incremental execution with
  * watermark-bounded state in the streaming case. The batch outputs are
  * oracle-verified in [[graft.queries.StreamQueries]]; the streaming specs
  * assert streaming == batch after all data arrives.
  */
object EventStreams {

  /** Tumbling event-time window per event type. State: one row per
    * (window, type) until the watermark passes the window end.
    */
  def tumblingCounts(events: DataFrame, watermark: Boolean = false): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(Num.cnt.as("n"), Num.sumd(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Gap-based session windows per user (30-minute inactivity gap) — the
    * built-in `session_window` keeps this fully declarative; state is merged
    * sessions per user, closed by the watermark.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: Boolean = false): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(Num.cnt.as("n_events"), Num.sumd(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
  }

  /** Streaming dedup: first observation of each event_id wins. In streaming
    * mode the state is bounded via `dropDuplicatesWithinWatermark` — plain
    * `dropDuplicates(id)` after a watermark still keeps one state row per
    * id forever (the watermark only evicts when the event-time column is in
    * the dedup key). Batch semantics: plain dropDuplicates.
    */
  def dedupFirstSeen(events: DataFrame, watermark: Boolean = false): DataFrame =
    if (watermark)
      events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")
}
