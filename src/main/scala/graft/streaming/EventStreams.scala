package graft.streaming

import graft.util.Checkpoints.CheckpointOps
import graft.util.Num
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

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

  /** Top event-type trigram paths inside gap-delimited sessions — sequence
    * mining over the clickstream ("view>click>purchase"). Session break
    * detection, session numbering, and BOTH lookahead legs are windows over
    * the SAME (user_id)-ordered partitioning, so everything up to the path
    * count rides one exchange; crossing a session boundary is rejected by
    * `lead(sess, 2) == sess` (sess is nondecreasing within a user, so the
    * 2-step check subsumes the 1-step one) instead of re-partitioning by
    * (user, sess). The count is a combinable groupBy on ≤ |types|³ keys and
    * top-k is TakeOrdered. Gap arithmetic is exact integer microseconds —
    * `ts` has sub-second precision, so no truncating second casts.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
                   k: Int = 15): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val tri = events
      .withColumn("brk", when(lag(col("ts"), 1).over(w).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
          >= gapUs, 1).otherwise(0))
      .withColumn("sess", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .withColumn("s3", lead(col("sess"), 2).over(w))
      .where(col("s3") === col("sess"))
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
    tri.groupBy(col("path")).agg(Num.cnt.as("n"))
      .orderBy(col("n").desc, col("path").asc).limit(k)
  }

  /** Typed event row / per-user running state for the custom stateful
    * operator below.
    */
  case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom arbitrary-state operator: per-user running totals via
    * `flatMapGroupsWithState` — the escape hatch for state machines the
    * declarative windows can't express (preference order: window /
    * session_window first; this API only when state transitions are truly
    * custom). Emits an updated running row per user per micro-batch.
    *
    * State lifecycle note: this variant's state is UNBOUNDED (one row per
    * user forever) — production uses [[runningTotalsEvicting]]
    * (`EventTimeTimeout` + watermark). A processing-time timeout is
    * deliberately not used anywhere — it makes the engine schedule
    * continuous empty micro-batches to poll timeouts, which also never
    * lets `processAllAvailable()` settle in tests.
    *
    * Works on a streaming Dataset[Event]; for batch equivalence compare
    * against a plain groupBy(user).agg (spec does exactly that).
    */
  def runningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserRunning(userId,
            prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Timed event row for the watermark-evicting stateful operator. */
  case class TimedEvent(event_id: Long, user_id: Long, event_type: String,
                        value: Double, ts: java.sql.Timestamp)

  /** Output of [[runningTotalsEvicting]]: `closed=false` rows are per-batch
    * running updates; the single `closed=true` row per user is emitted when
    * the watermark passes the user's last event + gap and the state is
    * EVICTED (the bounded-state guarantee [[runningTotals]] lacks).
    */
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double,
                       closed: Boolean)

  /** State carried by [[runningTotalsEvicting]] (not part of its output):
    * totals plus the max event time seen, so a late-but-admitted event can
    * never move the timeout backwards. Public because Spark's encoder
    * codegen requires an accessible constructor.
    */
  case class RunningState(n_events: Long, total_value: Double,
                          max_ts_ms: Long)

  /** [[runningTotals]] with bounded state: `EventTimeTimeout` + watermark.
    * Each update re-arms the user's timeout at (max event time seen so far
    * + gap) — the max is carried in the state, so an out-of-order event
    * that is admitted by the watermark cannot shrink the timeout and close
    * the session early. Once the watermark passes it, the timed-out
    * invocation emits the final `closed=true` row and removes the state —
    * idle users cost nothing, exactly like the declarative windows'
    * watermark eviction. A later event for the same user starts a FRESH
    * state (a new session), the only sound semantics once the old state is
    * gone.
    */
  def runningTotalsEvicting(events: Dataset[TimedEvent],
                            delay: String = "10 minutes",
                            gapMs: Long = 30L * 60 * 1000): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RunningState, UserTotal](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[TimedEvent], state: GroupState[RunningState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserTotal(userId, s.n_events, s.total_value, closed = true))
          } else {
            val prev = state.getOption.getOrElse(RunningState(0L, 0.0, Long.MinValue))
            val batch = rows.toSeq
            val next = RunningState(
              prev.n_events + batch.size,
              prev.total_value + batch.map(_.value).sum,
              math.max(prev.max_ts_ms, batch.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutTimestamp(next.max_ts_ms + gapMs)
            Iterator.single(UserTotal(userId, next.n_events, next.total_value, closed = false))
          }
      }
  }

  /** Stream-stream interval join: each click joined to the same user's
    * views in the lookback window [click_ts − lookback, click_ts). The ONLY
    * sound stream-stream join shape: the time-range predicate is what lets
    * Spark bound both state stores — each side's watermark plus the
    * interval condition tells the engine when a buffered row can never
    * match again and is evicted. An equi-join on user_id alone would buffer
    * both streams forever.
    *
    * Both inputs may be batch (same plan, no state) or streaming (pass
    * `watermark = true`; inner-join output is emitted as matches arrive).
    * Batch output == streaming output after all data arrives
    * (StreamingPipelineSpec); the batch plan is oracle-verified as
    * `q_interval_join`.
    */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
                    lookback: String = "10 minutes",
                    watermark: Boolean = false,
                    joinType: String = "inner"): DataFrame = {
    val c0 = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val v0 = views.select(col("user_id").as("v_user_id"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val (c, v) =
      if (watermark)
        (c0.withWatermark("click_ts", "1 hour"),
         v0.withWatermark("view_ts", "1 hour"))
      else (c0, v0)
    // "left_outer" is the harder streaming shape: an unmatched click's
    // null-extended row can only emit once the watermark proves no
    // in-window view can still arrive — which is exactly why the interval
    // condition is mandatory (it bounds how long that proof takes).
    c.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookback") &&
          col("view_ts") < col("click_ts"), joinType)
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Cohort retention matrix: users are cohorted by their first active
    * date; each (cohort_date, day_offset) cell counts the distinct users
    * of that cohort active that many days later — the standard product
    * analytics retention triangle. Plan shape: one combinable
    * groupBy(user) for first-seen, one distinct over (user, date), one
    * user-keyed join (co-partitioned with the groupBy), and one final
    * combinable groupBy over the tiny (cohort, offset) key space. Nothing
    * all-pairs, nothing windowed over the full stream.
    */
  def retention(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    events.select(col("user_id"), to_date(col("ts")).as("__d")).distinct()
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_date"),
        datediff(col("__d"), col("cohort_date")).cast("long").as("day_offset"))
      // the input is distinct per (user, date) and cohort_date is unique
      // per user, so each user hits a (cohort, offset) cell exactly once:
      // a plain count is provably equal to count-distinct and keeps the
      // final aggregation single-stage map-side combinable (countDistinct
      // would re-shuffle the activity set keyed by user first)
      .agg(count(lit(1)).cast("long").as("n_users"))
  }

  /** Per-key daily resample with LOCF gap fill (last observation carried
    * forward): aggregate `value` to (key, day), expand each key to its full
    * min..max day range via `sequence`, and fill the empty days with the
    * most recent observed day's value — the standard time-series
    * regularization step before any fixed-step model (forecasting, EWMA on
    * a uniform grid, day-over-day deltas).
    *
    * Plan: ONE corpus scan and ONE key-partitioned exchange, total —
    * there is no grid⟕observations self-join at all. LOCF and grid
    * generation are the SAME operation seen right: each observed day
    * owns the run of calendar days up to (exclusive) the next observed
    * day, so one `lead(day)` window over the (key, day) aggregate and
    * one `explode(sequence(day, next-1))` emit the densified grid with
    * the carried value built in. The explicit repartition by key feeds
    * the aggregate (partitioning by a subset of the grouping keys
    * satisfies its clustering) and the lead window alike; the explode
    * output is O(keys × days) — the caller's intended grid, never wider
    * than the calendar. The join/cache formulation costs a second
    * exchange or a second scan of the aggregate; this one is linear,
    * single-shuffle, and PlanHealthSpec asserts it stays that way.
    *
    * Returns (user_id, day, day_value round6, filled) — `filled` marks
    * carried rows so downstream quality checks can weight them.
    */
  def gapFillDaily(events: DataFrame, userMod: Int): DataFrame = {
    val daily = events.filter(col("user_id") % userMod === 0)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("value")).as("__v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    daily
      .withColumn("__next", lead(col("day"), 1).over(w))
      .select(col("user_id"), col("day").as("__obs"), col("__v"),
        explode(sequence(col("day"),
          coalesce(date_sub(col("__next"), 1), col("day")))).as("day"))
      .select(col("user_id"), col("day"),
        round(col("__v"), 6).as("day_value"),
        (col("day") =!= col("__obs")).as("filled"))
  }

  /** Per-key EWMA (exponentially weighted moving average) of `valueCol`,
    * events ordered by (ts, event_id): a deterministic sequential fold —
    * ewma ← α·x + (1−α)·ewma, seeded with the first value. The fold runs
    * inside a per-key collected array (array_sort + aggregate), so the
    * result is partitioning-independent and bit-identical to the oracle's
    * list_reduce. Per-key state is that key's event list — bounded for
    * entity keys; for unbounded streams use the windowed aggregations.
    * Returns (user_id, n_events, ewma round6).
    */
  def ewma(events: DataFrame, alpha: Double): DataFrame = {
    val beta = 1.0 - alpha
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        expr("transform(array_sort(collect_list(struct(ts, event_id, value))), e -> e.value)")
          .as("__vals"))
      .select(col("user_id"), col("n_events"),
        round(expr(
          s"""aggregate(slice(__vals, 2, size(__vals) - 1),
             |  CAST(__vals[0] AS DOUBLE),
             |  (acc, x) -> ${alpha}D * x + ${beta}D * acc)""".stripMargin), 6)
          .as("ewma"))
  }

  /** Windowed EWMA — [[ewma]] with bounded state for unbounded streams:
    * the sequential fold runs per (user, tumbling window), so per-key state
    * is one window's event list instead of the full history, and under
    * `readStream` a watermark on `ts` lets Structured Streaming evict each
    * window's state once it closes (the same agg expression is
    * watermark-compatible: one groupBy on window(ts) + key). Same
    * deterministic order contract as [[ewma]]: (ts, event_id) sort inside
    * the collected array, fold seeded with the first value, round6.
    * Returns (window_start, user_id, n_events, ewma).
    */
  def ewmaWindowed(events: DataFrame, alpha: Double,
                   win: String = "1 hour"): DataFrame = {
    val beta = 1.0 - alpha
    events
      // group on the window STRUCT, not window().start: projecting the
      // start field inside the grouping key strips the event-time/watermark
      // metadata, and Spark then rejects append mode ("streaming output
      // mode ... without watermark") and never evicts state — the struct
      // keeps the aggregation watermark-evictable; start is selected after
      .groupBy(window(col("ts"), win).as("__w"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        expr("transform(array_sort(collect_list(struct(ts, event_id, value))), e -> e.value)")
          .as("__vals"))
      .select(col("__w").getField("start").as("window_start"),
        col("user_id"), col("n_events"),
        round(expr(
          s"""aggregate(slice(__vals, 2, size(__vals) - 1),
             |  CAST(__vals[0] AS DOUBLE),
             |  (acc, x) -> ${alpha}D * x + ${beta}D * acc)""".stripMargin), 6)
          .as("ewma"))
  }

  /** Conversion funnel: per user, how many `from` events were followed by
    * at least one `to` event within `horizon`. The left interval join is
    * the same bounded shape as [[clickViewJoin]]; the per-(user, from-event)
    * max-flag collapse then the per-user rollup are both map-side
    * combinable. Returns (user_id, n_from, n_converted).
    */
  def conversionFunnel(events: DataFrame, from: String, to: String,
                       horizon: String = "1 hour"): DataFrame = {
    val f = events.filter(col("event_type") === from)
      .select(col("user_id"), col("event_id").as("from_id"), col("ts").as("from_ts"))
    val t = events.filter(col("event_type") === to)
      .select(col("user_id").as("__tu"), col("ts").as("to_ts"))
    f.join(t,
        col("user_id") === col("__tu") &&
          col("to_ts") > col("from_ts") &&
          col("to_ts") <= col("from_ts") + expr(s"INTERVAL $horizon"), "left")
      .groupBy(col("user_id"), col("from_id"))
      .agg(max(when(col("__tu").isNotNull, 1L).otherwise(0L)).as("__conv"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_from"),
        sum(col("__conv")).cast("long").as("n_converted"))
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

  /** Windowed z-score anomalies — the STREAMING-compatible reformulation
    * of [[anomalies]]: each event is scored against the mean/std of its
    * user's PREVIOUS tumbling hour. Closed-window stats are static once
    * the watermark passes, so under readStream this is a windowed agg
    * (bounded state, watermark-evictable) stream-joined to the next
    * window's events — no per-row ROWS frame, which Structured Streaming
    * cannot incrementalize. Same decimal moment sums and IEEE closed form
    * as [[anomalies]]; same out-of-sample contract (scores never include
    * the scored event). Returns flagged (event_id, user_id, value,
    * win_mean, z).
    */
  def anomaliesWindowed(events: DataFrame, minN: Int = 5,
                        zThreshold: Double = 2.0,
                        windowUnit: String = "day"): DataFrame = {
    require(Set("hour", "day").contains(windowUnit), s"unsupported unit $windowUnit")
    val vd = Num.dec2(col("value"))
    val stats = events
      .groupBy(col("user_id"), date_trunc(windowUnit, col("ts")).as("__h"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(vd).cast("double").as("__s1"),
        sum(vd * vd).cast("double").as("__s2"))
      .filter(col("__n") >= lit(minN.toLong))
      .select(col("user_id"),
        (col("__h") + expr(s"INTERVAL 1 $windowUnit")).as("__scored_h"),
        (col("__s1") / col("__n").cast("double")).as("__mean"),
        ((col("__s2") - col("__s1") * col("__s1") / col("__n").cast("double")) /
          (col("__n").cast("double") - lit(1.0))).as("__varr"))
      .filter(col("__varr") > lit(0.0))
    events
      .select(col("event_id"), col("user_id"), col("value"),
        date_trunc(windowUnit, col("ts")).as("__scored_h"))
      .join(stats, Seq("user_id", "__scored_h"))
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("__mean"), 6).as("win_mean"),
        round((col("value") - col("__mean")) / sqrt(col("__varr")), 6).as("z"))
      .filter(abs(col("z")) >= lit(zThreshold))
  }

  /** Exponentially time-decayed sum per user: Σ value·e^(−λ·age_days),
    * age measured in integer MICROSECONDS from the corpus max timestamp
    * (exact in both engines — epoch subtraction never touches doubles)
    * before one IEEE division + exp. The recency-weighted engagement
    * score every ranking/abuse pipeline keeps. Per-row contributions are
    * round(9)→DECIMAL before the sum (exp is irrational — no systematic
    * round-half alignment), and the output is the exact decimal sum.
    * Plan: 1-row broadcast of the max timestamp, then one combinable
    * groupBy(user) — a single scan, no window.
    */
  def decayedSum(events: DataFrame, lambdaPerDay: Double): DataFrame = {
    require(lambdaPerDay >= 0, s"need lambdaPerDay >= 0, got $lambdaPerDay")
    val maxTs = events.agg(max(unix_micros(col("ts"))).as("__max_us"))
    events
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("__us"))
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        round(col("value") * exp(lit(-lambdaPerDay) *
          ((col("__max_us") - col("__us")).cast("double") / lit(86400000000.0))), 9)
          .cast("decimal(28,9)").as("__c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("__c")).cast("double").as("decayed_sum"))
  }

  /** Tabular CUSUM change detection (Page 1954): per user, the one-sided
    * cumulative sums s⁺ ← max(0, s⁺ + (x − μ − κ)) and s⁻ ← max(0, s⁻ +
    * (μ − κ − x)) accumulate sustained drift from the user's own mean;
    * crossing `h` raises an alarm and resets the statistic. Complements
    * [[anomalies]]: the z-gate catches single spikes, CUSUM catches slow
    * level shifts no single point of which is anomalous.
    *
    * Same deterministic-fold contract as [[ewma]]: the per-key event list
    * is sorted by (ts, event_id) and folded sequentially, so the result is
    * partitioning-independent and bit-identical to the oracle's
    * list_reduce. Only INTEGER outputs (alarm count) are emitted — the
    * fold statistics themselves are small-denominator rationals that would
    * hit the round-half coin flip if rounded (see BigramPerplexity).
    * Returns (user_id, n_events, n_alarms).
    */
  def cusum(events: DataFrame, kappa: Double, h: Double): DataFrame = {
    require(kappa >= 0 && h > 0, s"need kappa >= 0 and h > 0, got $kappa/$h")
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        (sum(Num.dec2(col("value"))).cast("double") /
          count(lit(1)).cast("double")).as("__mu"),
        expr("transform(array_sort(collect_list(struct(ts, event_id, value))), e -> e.value)")
          .as("__vals"))
      .select(col("user_id"), col("n_events"),
        expr(
          s"""aggregate(__vals, array(0D, 0D, 0D), (acc, x) ->
             |  CASE WHEN greatest(0D, acc[0] + (x - __mu - ${kappa}D)) > ${h}D
             |         OR greatest(0D, acc[1] + (__mu - ${kappa}D - x)) > ${h}D
             |    THEN array(0D, 0D, acc[2] + 1D)
             |    ELSE array(greatest(0D, acc[0] + (x - __mu - ${kappa}D)),
             |               greatest(0D, acc[1] + (__mu - ${kappa}D - x)),
             |               acc[2])
             |  END)[2]""".stripMargin).cast("long").as("n_alarms"))
  }

  /** Rolling z-score anomaly detection: per user, each event's value is
    * scored against the mean/stddev of its previous `lookback` events
    * (current row excluded — the score is a true out-of-sample surprise),
    * and rows with |z| ≥ `zThreshold` are flagged. The standard streaming
    * outlier gate for metric/telemetry pipelines.
    *
    * Engine parity: the window sums run in DECIMAL (sum and sum-of-squares
    * of 2-decimal values are exact, order-independent); mean/variance/z are
    * then single IEEE ops on identical doubles, rounded to 6. Variance uses
    * the sums form (S2 − S1²/n)/(n−1) so one window pass feeds both moments.
    *
    * Scale: one shuffle on user_id, per-partition sorted ROWS frames — the
    * frame is bounded (`lookback` rows), so executor memory per key is O(1)
    * and the operator streams. Skewed users are bounded by the frame too.
    * Returns (event_id, user_id, value, win_mean, z) for flagged rows only.
    */
  def anomalies(events: DataFrame, lookback: Int = 20, minN: Int = 10,
                zThreshold: Double = 2.5): DataFrame = {
    require(lookback >= minN && minN >= 2,
      s"need lookback >= minN >= 2, got lookback=$lookback minN=$minN")
    val win = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-lookback, -1)
    val vd = Num.dec2(col("value"))
    val s1 = sum(vd).over(win).cast("double")
    val s2 = sum(vd * vd).over(win).cast("double")
    val n = count(lit(1)).over(win).cast("double")
    val mean = col("__s1") / col("__n")
    val varr = (col("__s2") - col("__s1") * col("__s1") / col("__n")) /
      (col("__n") - lit(1.0))
    events
      .select(col("event_id"), col("user_id"), col("value"),
        s1.as("__s1"), s2.as("__s2"), n.as("__n"))
      .filter(col("__n") >= lit(minN.toDouble))
      .select(col("event_id"), col("user_id"), col("value"),
        mean.as("__mean"), varr.as("__varr"))
      .filter(col("__varr") > lit(0.0))
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("__mean"), 6).as("win_mean"),
        round((col("value") - col("__mean")) / sqrt(col("__varr")), 6).as("z"))
      .filter(abs(col("z")) >= lit(zThreshold))
  }

  /** MAD (median-absolute-deviation) outliers per event_type — the ROBUST
    * twin of [[anomalies]]' z-score: medians shrug off the very outliers a
    * mean/stddev gate lets poison its own threshold (one 10⁶-valued event
    * inflates σ enough to hide every real anomaly; it moves the median not
    * at all). Flag |x − med| > k · 1.4826 · MAD, the consistent-σ scaling.
    *
    * Two exact `percentile` aggregations on the event_type key (a handful
    * of groups — the per-group sort is the honest cost of exact medians;
    * swap percentile_approx in when ±ε is acceptable at 100 TB) and two
    * broadcast joins back. Threshold compares UNROUNDED doubles in both
    * engines; reported med/mad round(6) per the parity contract.
    */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("__med"))
    val dev = events.join(broadcast(med), "event_type")
      .withColumn("__ad", abs(col("value") - col("__med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("__ad") > lit(k) * lit(1.4826) * col("__mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("__med"), 6).as("med"), round(col("__mad"), 6).as("mad"))
  }

  /** First/last-touch attribution: for each `to` event (conversion), the
    * FIRST and LAST `from` event (touchpoint) by the same user within
    * `lookback` before it — the marketing-attribution primitive (and the
    * label-generation join for conversion models). One bounded interval
    * join ([[clickViewJoin]]'s shape — watermark-compatible) + one
    * combinable per-conversion groupBy. Touch identity rides a sortable
    * `(micros, id)` key encoding, so first/last are plain min/max —
    * deterministic under ties and engine-neutral (no argmin/argmax
    * semantics to align). Conversions with no touchpoint are kept with
    * nulls (left join — attribution must report the unattributed share).
    */
  def attribution(events: DataFrame, from: String, to: String,
                  lookback: String): DataFrame = {
    val key = concat(
      lpad(unix_micros(col("__fts")).cast("string"), 20, "0"),
      lpad(col("__fid").cast("string"), 12, "0"))
    val f = events.filter(col("event_type") === from)
      .select(col("user_id"), col("ts").as("__fts"), col("event_id").as("__fid"))
    val t = events.filter(col("event_type") === to)
      .select(col("user_id"), col("ts").as("conv_ts"),
        col("event_id").as("conv_id"))
    t.join(f,
        t("user_id") === f("user_id") &&
          col("__fts") < col("conv_ts") &&
          col("__fts") >= col("conv_ts") - expr(s"INTERVAL $lookback"),
        "left")
      .groupBy(t("user_id").as("user_id"), col("conv_id"), col("conv_ts"))
      .agg(count(col("__fid")).as("n_touches"),
        min(key).as("__first"), max(key).as("__last"))
      .select(col("user_id"), col("conv_id"),
        col("n_touches"),
        substring(col("__first"), 21, 12).cast("long").as("first_touch_id"),
        substring(col("__last"), 21, 12).cast("long").as("last_touch_id"))
  }

  /** Stream-static enrichment: a (possibly streaming) event frame joined
    * to a static dimension on `key` — Spark plans the static side as a
    * broadcast re-resolved per micro-batch, so a dimension refresh is
    * picked up without restarting the query and the stream side never
    * shuffles for the join. Left join: events with no dimension row
    * flow through with nulls (never drop facts at an enrichment step).
    * The streaming face of the reference's point-lookup join
    * (`SolrRanker.java:58-64` tweet→user). Spec proves streaming ==
    * batch on the same data.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Strict-order multi-stage funnel: how many users have a `stages(0)`
    * event, then a `stages(1)` event strictly after it, then … — the
    * earliest-chain formulation (user reaches stage k iff the stages
    * appear as a time-subsequence; minimizing each step's timestamp is
    * optimal, so the per-stage conditional-min chain is exact). Each
    * step is one user-keyed equi-join + combinable min — K−1 key
    * shuffles total, no window, no per-user event collection.
    * [[conversionFunnel]] is the 2-stage horizon-bounded variant.
    *
    * Returns one row per stage: (stage, event_type, n_users, conv_rate)
    * with conv_rate relative to stage 1 (1-row broadcast attach).
    */
  def funnelStages(events: DataFrame, stages: Seq[String]): DataFrame = {
    val perStage = Seq.newBuilder[DataFrame]
    var cur = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    perStage += cur
    stages.tail.foreach { st =>
      cur = events.filter(col("event_type") === st)
        .join(cur.select(col("user_id"), col("t").as("prev_t")), Seq("user_id"))
        .where(col("ts") > col("prev_t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      perStage += cur
    }
    val counts = perStage.result().zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(stages(i)).as("event_type"),
          col("n_users"))
    }.reduce(_ unionAll _)
    val base = counts.where(col("stage") === 1)
      .select(col("n_users").as("__n0"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("event_type"), col("n_users"),
        round(col("n_users").cast("double") / col("__n0").cast("double"), 6)
          .as("conv_rate"))
  }

  /** Train/test temporal-split leakage audit: split events at `cut`, then
    * measure the user overlap between the two sides — the entity-level
    * leakage a time-based ML split must report before anyone trains on
    * it (an overlapping user's test events are partially memorizable).
    * ONE user-keyed aggregation builds per-user membership flags; the
    * 1-row rollup is map-side combinable. Returns
    * (n_train_users, n_test_users, n_overlap_users, n_leaked_test_events,
    * overlap_pct).
    */
  def splitLeakage(events: DataFrame, cut: Column): DataFrame = {
    val flags = events.groupBy(col("user_id"))
      .agg(
        max(when(col("ts") < cut, 1).otherwise(0)).as("in_train"),
        max(when(col("ts") >= cut, 1).otherwise(0)).as("in_test"),
        sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("n_test_ev"))
    flags.agg(
        sum(col("in_train")).cast("long").as("n_train_users"),
        sum(col("in_test")).cast("long").as("n_test_users"),
        sum(col("in_train") * col("in_test")).cast("long")
          .as("n_overlap_users"),
        sum(when(col("in_train") * col("in_test") === 1, col("n_test_ev"))
          .otherwise(0L)).cast("long").as("n_leaked_test_events"))
      .select(col("n_train_users"), col("n_test_users"),
        col("n_overlap_users"), col("n_leaked_test_events"),
        round(col("n_overlap_users").cast("double") /
          col("n_test_users").cast("double"), 6).as("overlap_pct"))
  }

  /** First-order Markov transition matrix of event types: P(dst | src)
    * over consecutive same-user events. One user-partitioned exchange
    * carries the lead(); the (src, dst) count and the per-src
    * normalization both run over the type-pair result (|types|² rows —
    * driver-table-sized however big the corpus is, so the second window
    * is free). Probability is one long/long IEEE division, engine-exact.
    *
    * The recommender / next-event-prediction baseline and the
    * click-model input; [[sessionPaths]] is the order-3 sparse variant.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .where(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
    pairs.groupBy(col("src"), col("dst")).agg(Num.cnt.as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("src")).cast("double"), 6))
  }

  /** Day-of-week seasonal index per event type: mean(value | dow) /
    * mean(value) — the multiplicative seasonality profile a gap-fill or
    * anomaly gate normalizes by. Exact decimal sums (order-independent),
    * one combinable groupBy over (type, dow); the per-type totals are
    * rebuilt by summing the 7 dow cells (|types|×7 rows — a free window),
    * so every mean is derived from the SAME exact sums on both engines.
    * dow is computed arithmetically (epoch days + 3 mod 7, 0 = Monday) —
    * engine-neutral, unlike dayofweek() whose origin differs per engine.
    */
  def dowSeasonality(events: DataFrame): DataFrame = {
    val dow = expr(
      "(datediff(to_date(ts), to_date('1970-01-01')) + 3) % 7").cast("long")
    val cell = events
      .groupBy(col("event_type"), dow.as("dow"))
      .agg(sum(Num.dec2(col("value"))).as("__s"), Num.cnt.as("n"))
    val wt = Window.partitionBy("event_type")
    cell.select(col("event_type"), col("dow"), col("n"),
        round(col("__s").cast("double") / col("n").cast("double"), 6)
          .as("dow_mean"),
        round((col("__s").cast("double") / col("n").cast("double")) /
          (sum(col("__s")).over(wt).cast("double") /
            sum(col("n")).over(wt).cast("double")), 6).as("seasonal_index"))
  }

  /** Autocorrelation function of the daily mean-value series per event
    * type, lags 1..maxLag — the seasonality/trend detector run before
    * choosing a forecasting model. The daily means come from exact
    * decimal sums; the ACF itself is a sequential fold over the
    * day-ordered series array (the [[ewma]] order contract: both engines
    * run the identical left-to-right IEEE ops), so the result is
    * engine-exact to round6. Per-type state is the day-indexed series
    * (~corpus days — bounded), not the raw events.
    *
    * acf(k) = Σ_{t>k} (x_t−μ)(x_{t−k}−μ) / Σ_t (x_t−μ)², μ = series mean.
    */
  def acf(events: DataFrame, maxLag: Int = 3): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(Num.dec2(col("value"))).cast("double") /
        count(lit(1)).cast("double")).as("x"))
    val series = daily
      .groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(day, x))), e -> e.x)")
        .as("__xs"))
      .withColumn("__n", size(col("__xs")))
      .withColumn("__mu", expr(
        "aggregate(__xs, 0D, (a, v) -> a + v) / CAST(__n AS DOUBLE)"))
      .withColumn("__den", expr(
        "aggregate(__xs, 0D, (a, v) -> a + (v - __mu) * (v - __mu))"))
    series
      .select(col("event_type"), col("__n").cast("long").as("n_days"),
        posexplode(expr(
          s"""transform(sequence(1, $maxLag), k ->
             |  aggregate(zip_with(slice(__xs, k + 1, __n - k),
             |      slice(__xs, 1, __n - k),
             |      (a, b) -> (a - __mu) * (b - __mu)),
             |    0D, (acc, v) -> acc + v) / __den)""".stripMargin))
          .as(Seq("__p", "__a")))
      .select(col("event_type"), col("n_days"),
        (col("__p") + 1).cast("long").as("lag"),
        // + 0.0 canonicalizes −0.0 (a zero-sum lag) — covariance convention
        (round(col("__a"), 6) + lit(0.0)).as("acf"))
  }

  /** Experiment health panel: sample-ratio-mismatch χ² + minimum
    * detectable effect — the two checks an A/B pipeline runs BEFORE
    * reading any lift ([[cupedLift]]/[[didEstimate]] are meaningless on
    * a broken assignment or an underpowered test):
    *
    *  - SRM: χ² of the arm sizes against the designed 50/50 split,
    *    (n₀−E)²/E + (n₁−E)²/E with E = n/2; `srm` flags χ² > 3.841
    *    (the 1-dof 5% critical value) — the single most common silent
    *    experiment-infrastructure failure.
    *  - MDE: (z_{α/2} + z_β)·√(s²·(1/n₀+1/n₁)) at the conventional
    *    α = 5%, power = 80% (1.96 + 0.84 — literals, no quantile
    *    function needed), s² the WITHIN-ARM pooled per-user metric
    *    variance (Σₐ SSₐ)/(n−2) — the standard two-sample power
    *    formula's s²; the grand variance would fold any between-arm
    *    mean separation into s² and inflate the reported MDE under a
    *    real effect. Reported absolute and relative to the pooled mean.
    *
    * Engine parity: per-user totals are exact decimals; n/Σy/Σy² and
    * each arm's (nₐ, Σyₐ, Σyₐ²) are exact aggregates; every double op
    * (χ², per-arm SS, pooled variance, √, divisions) happens once from
    * those exact scalars in a FIXED order — ctrl SS + treat SS, never a
    * row-order-dependent double sum; round6. One user groupBy + one
    * 2-row arm rollup + one broadcast moment aggregate — one shuffle at
    * any scale.
    */
  def abHealth(events: DataFrame): DataFrame = {
    val per = events
      .groupBy(col("user_id"))
      .agg(sum(Num.dec2(col("value"))).as("__y"))
      .select(col("user_id"), (col("user_id") % 2).as("__arm"), col("__y"))
    // single pass: arm-level moments (2 rows, checkpointed) roll up to
    // the pooled scalars as exact decimal sums-of-sums
    val arm = per
      .groupBy(col("__arm"))
      .agg(count(lit(1)).cast("long").as("__na"),
        sum(col("__y")).as("__sya"),
        sum(col("__y") * col("__y")).as("__syya"))
      .cutLineage()
    val moments = broadcast(arm.agg(
      sum(col("__na")).as("__n"),
      sum(col("__sya")).as("__sy")))
    arm
      .agg(sum(when(col("__arm") === 0, col("__na")).otherwise(0L)).as("n_ctrl"),
        sum(when(col("__arm") === 1, col("__na")).otherwise(0L)).as("n_treat"),
        // per-arm exact moments pinned to NAMED columns so the pooled
        // SS adds ctrl + treat in one fixed order (bit-determinism)
        sum(when(col("__arm") === 0, col("__sya"))).as("__sy0"),
        sum(when(col("__arm") === 1, col("__sya"))).as("__sy1"),
        sum(when(col("__arm") === 0, col("__syya"))).as("__syy0"),
        sum(when(col("__arm") === 1, col("__syya"))).as("__syy1"))
      .crossJoin(moments)
      .withColumn("__e", col("__n").cast("double") / lit(2.0))
      .withColumn("__chi2",
        pow(col("n_ctrl").cast("double") - col("__e"), 2) / col("__e") +
          pow(col("n_treat").cast("double") - col("__e"), 2) / col("__e"))
      .withColumn("__mean",
        col("__sy").cast("double") / col("__n").cast("double"))
      // degenerate-experiment guard: one user per arm makes the n−2
      // denominator 0/0 = NaN, and an empty arm nulls its moment columns;
      // both cases emit a DELIBERATE NULL variance (and the MDE follows
      // null through its arithmetic) instead of NaN/garbage
      .withColumn("__var", expr(
        """CASE WHEN n_ctrl >= 2 AND n_treat >= 2 THEN
          |((CAST(__syy0 AS DOUBLE) - CAST(__sy0 AS DOUBLE)
          |    * CAST(__sy0 AS DOUBLE) / CAST(n_ctrl AS DOUBLE))
          | + (CAST(__syy1 AS DOUBLE) - CAST(__sy1 AS DOUBLE)
          |    * CAST(__sy1 AS DOUBLE) / CAST(n_treat AS DOUBLE)))
          |  / CAST(__n - 2 AS DOUBLE) END""".stripMargin))
      .withColumn("__mde", lit(1.96 + 0.84) *
        sqrt(col("__var") * (lit(1.0) / col("n_ctrl").cast("double") +
          lit(1.0) / col("n_treat").cast("double"))))
      .select(col("n_ctrl"), col("n_treat"),
        round(col("__chi2"), 6).as("srm_chi2"),
        (col("__chi2") > lit(3.841)).as("srm"),
        round(col("__mean"), 6).as("mean_y"),
        round(col("__var"), 6).as("var_y"),
        round(col("__mde"), 6).as("mde_abs"),
        round(col("__mde") / col("__mean"), 6).as("mde_rel"))
  }

  /** Rolling-origin 1-step backtest of the [[holtForecast]] model — the
    * evaluation half of the forecasting story: for every day t ≥ 3 the
    * model state fitted on days 1..t−1 forecasts day t (l + b, h=1),
    * and MAE/RMSE over the errors say whether the trend model earns its
    * keep vs yesterday's value. (Errors start at t = 3: Holt's classic
    * init b₁ = x₂ − x₁ peeks at x₂, so t = 2 would score in-sample.)
    *
    * The per-origin state is a prefix of the SAME sequential fold
    * [[holtForecast]] runs (O(days²) lambda ops inside one bounded
    * array — the [[mannKendall]] pair-array budget); the error list is
    * then folded IN DAY ORDER, so both engines sum identical doubles in
    * identical order (the oracle replays states from its recursive CTE
    * and folds `list(e ORDER BY t)`). Types with < 3 days are dropped
    * (no out-of-sample origin exists). Returns
    * (event_type, n_evals, mae, rmse).
    */
  def holtBacktest(events: DataFrame, alpha: Double = 0.3,
                   beta: Double = 0.2): DataFrame = {
    val (a, ca, b, cb) = (alpha, 1.0 - alpha, beta, 1.0 - beta)
    val merge =
      s"""(acc, x) -> named_struct(
         |    'l', ${a}D * x + ${ca}D * (acc.l + acc.b),
         |    'b', ${b}D * ((${a}D * x + ${ca}D * (acc.l + acc.b)) - acc.l)
         |      + ${cb}D * acc.b)""".stripMargin
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(Num.dec2(col("value"))).cast("double") /
        count(lit(1)).cast("double")).as("x"))
    daily
      .groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(day, x))), e -> e.x)")
        .as("__xs"))
      .withColumn("__n", size(col("__xs")))
      .filter(col("__n") >= 3)
      // fold ONCE per origin t (states array), then zip against the
      // actuals — one aggregate per origin instead of two (.l and .b
      // each re-running the identical O(t) fold; ADVICE r10)
      .withColumn("__sts", expr(
        s"""transform(sequence(3, __n), t ->
           |  aggregate(slice(__xs, 2, t - 2),
           |    named_struct('l', __xs[0], 'b', __xs[1] - __xs[0]),
           |    $merge))""".stripMargin))
      .withColumn("__errs", expr(
        "zip_with(__sts, slice(__xs, 3, __n - 2), " +
          "(st, xv) -> abs(xv - (st.l + st.b)))"))
      .withColumn("__m", (col("__n") - 2).cast("double"))
      .select(col("event_type"), (col("__n") - 2).cast("long").as("n_evals"),
        round(expr("aggregate(__errs, 0D, (s, e) -> s + e)") / col("__m"), 6)
          .as("mae"),
        round(sqrt(expr("aggregate(__errs, 0D, (s, e) -> s + e * e)") /
          col("__m")), 6).as("rmse"))
  }

  /** Difference-in-differences estimate over the same pre/post cut as
    * [[cupedLift]]: the quasi-experimental estimator for when the arms
    * were NOT randomized (a staged rollout, a geo split) — each arm's
    * own pre-period mean absorbs its level difference, and
    * did = (post₁ − pre₁) − (post₀ − pre₀) is the treatment effect
    * under the parallel-trends assumption. One combinable 4-cell
    * aggregate (arm × period) from exact decimal sums; every mean and
    * the estimate are single final double divisions — engine-exact,
    * round6. Returns one row: the four cell means, each arm's delta,
    * and the DiD estimate.
    */
  def didEstimate(events: DataFrame, preDays: Int = 7): DataFrame = {
    val cut = broadcast(events.agg(
      date_add(min(to_date(col("ts"))), preDays).as("__cut")))
    val cells = events.crossJoin(cut)
      .groupBy((col("user_id") % 2).as("__arm"),
        (to_date(col("ts")) >= col("__cut")).as("__post"))
      .agg(sum(Num.dec2(col("value"))).as("__s"), count(lit(1)).as("__n"))
      .select(col("__arm"), col("__post"),
        (col("__s").cast("double") / col("__n").cast("double")).as("__m"))
    // 4 cells → 1 row; max(when(...)) selects each cell (exactly one
    // row matches per predicate, so max is selection, not aggregation)
    def cell(arm: Int, post: Boolean) =
      max(when(col("__arm") === arm && col("__post") === post, col("__m")))
    cells.agg(
        cell(0, post = false).as("__p0"), cell(0, post = true).as("__q0"),
        cell(1, post = false).as("__p1"), cell(1, post = true).as("__q1"))
      .select(round(col("__p0"), 6).as("pre_ctrl"),
        round(col("__q0"), 6).as("post_ctrl"),
        round(col("__p1"), 6).as("pre_treat"),
        round(col("__q1"), 6).as("post_treat"),
        round(col("__q0") - col("__p0"), 6).as("delta_ctrl"),
        round(col("__q1") - col("__p1"), 6).as("delta_treat"),
        round((col("__q1") - col("__p1")) - (col("__q0") - col("__p0")), 6)
          .as("did"))
  }

  /** CUPED-adjusted A/B lift (Deng et al., WSDM 2013 — public method):
    * the experiment-analysis reducer that uses each user's PRE-PERIOD
    * value as a control variate — Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X)
    * pooled across arms — cutting metric variance by the squared
    * pre/post correlation without biasing the lift. The arm split is
    * deterministic (user_id parity stands in for the assignment hash).
    *
    * Engine parity: per-user X (pre-window value sum) and Y (post) are
    * exact decimals; θ and X̄ derive from pooled exact sums (Σx, Σy,
    * Σxy, Σx², n — decimal products of decimals, still exact); and the
    * per-arm adjusted mean is computed ALGEBRAICALLY as
    * Ȳ_arm − θ·(X̄_arm − X̄) — never by summing per-user doubles, so no
    * partition-order dependence anywhere. All divisions happen once, in
    * double, in the same order in both engines; round6. One user-keyed
    * groupBy + a broadcast 5-value pooled aggregate + a 2-row arm
    * aggregate — one shuffle over users at any scale. Degenerate
    * var(X) = 0 yields θ = 0 (adjustment disabled), not NaN.
    */
  def cupedLift(events: DataFrame, preDays: Int = 7): DataFrame = {
    val cut = broadcast(events.agg(
      date_add(min(to_date(col("ts"))), preDays).as("__cut")))
    val zero = lit(0).cast("decimal(18,2)")
    val per = events.crossJoin(cut)
      .groupBy(col("user_id"))
      .agg(
        sum(when(to_date(col("ts")) < col("__cut"), Num.dec2(col("value")))
          .otherwise(zero)).as("__x"),
        sum(when(to_date(col("ts")) >= col("__cut"), Num.dec2(col("value")))
          .otherwise(zero)).as("__y"))
    // ALL moments accumulate per arm first (2 rows, checkpointed so the
    // heavy user aggregate runs once); the pooled scalars are the exact
    // decimal sums of the two arm rows — identical values to a direct
    // pooled aggregate, one events pass instead of two
    val arm = per
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("__x")).as("__sxa"), sum(col("__y")).as("__sya"),
        sum(col("__x") * col("__y")).as("__sxya"),
        sum(col("__x") * col("__x")).as("__sxxa"))
      .cutLineage()
    val pooled = broadcast(arm.agg(
      sum(col("n_users")).as("__n"),
      sum(col("__sxa")).as("__sx"), sum(col("__sya")).as("__sy"),
      sum(col("__sxya")).as("__sxy"), sum(col("__sxxa")).as("__sxx")))
    arm
      .crossJoin(pooled)
      .withColumn("__nd", col("__n").cast("double"))
      .withColumn("__theta", expr(
        """CASE WHEN CAST(__sxx AS DOUBLE) - CAST(__sx AS DOUBLE)
          |       * CAST(__sx AS DOUBLE) / __nd = 0D THEN 0D
          |ELSE (CAST(__sxy AS DOUBLE) - CAST(__sx AS DOUBLE)
          |       * CAST(__sy AS DOUBLE) / __nd)
          |   / (CAST(__sxx AS DOUBLE) - CAST(__sx AS DOUBLE)
          |       * CAST(__sx AS DOUBLE) / __nd) END""".stripMargin))
      .withColumn("__mx", col("__sxa").cast("double") / col("n_users").cast("double"))
      .withColumn("__my", col("__sya").cast("double") / col("n_users").cast("double"))
      .select(col("arm"), col("n_users"),
        round(col("__mx"), 6).as("mean_x"),
        round(col("__my"), 6).as("mean_y"),
        round(col("__theta"), 6).as("theta"),
        round(col("__my") - col("__theta") *
          (col("__mx") - col("__sx").cast("double") / col("__nd")), 6)
          .as("mean_y_adj"))
  }

  /** Kaplan–Meier survival curve over user lifetimes — the retention
    * statistic [[retention]]'s cohort triangle cannot give: the triangle
    * counts activity per offset, KM estimates P(user still active after
    * t days) while handling RIGHT-CENSORING correctly (users whose last
    * event falls in the final `censorDays` of the corpus aren't dead —
    * they just haven't been observed long enough; counting them as
    * churned biases every retention metric downward).
    *
    * Lifetime = last-day − first-day per user; a lifetime is an EVENT
    * (churn) if it ended before the censor horizon, else censored.
    * Standard product-limit estimator over distinct lifetimes t
    * ascending: S(t) = Π_{u ≤ t} (1 − d_u / n_u), n_u = users with
    * lifetime ≥ u (at risk), d_u = churns at u.
    *
    * Shape: one user groupBy (min/max day), one combinable lifetime
    * groupBy (≤ corpus-days rows), then the curve built INSIDE one
    * collected day-ordered array — risk sets as integer prefix sums,
    * factors and the prefix product as the [[ewma]]-family sequential
    * folds (O(days²) lambda ops on a bounded array; no window, no
    * second shuffle). The oracle replays the same folds via window
    * `list()` + `list_reduce`. All integers until the final 1 − d/n
    * divisions; round6 survival.
    */
  def kaplanMeier(events: DataFrame, censorDays: Int = 7): DataFrame = {
    // one events pass: the corpus max day IS the max of the per-user
    // last days, so the horizon derives from the (checkpointed,
    // users-sized) lifetime table instead of a second corpus scan
    val um = events
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("__f"), max(to_date(col("ts"))).as("__l"))
      .cutLineage()
    val horizon = broadcast(um.agg(
      date_sub(max(col("__l")), censorDays).as("__h")))
    val lives = um
      .crossJoin(horizon)
      .select(datediff(col("__l"), col("__f")).cast("long").as("t"),
        (col("__l") > col("__h")).as("__cens"))
    lives
      .groupBy(col("t"))
      .agg(sum(when(col("__cens"), 0L).otherwise(1L)).as("d"),
        sum(when(col("__cens"), 1L).otherwise(0L)).as("c"),
        count(lit(1)).as("__n"))
      .agg(expr("array_sort(collect_list(struct(t, d, c, __n)))").as("__a"))
      .withColumn("__tot", expr("aggregate(__a, 0L, (a, e) -> a + e.__n)"))
      // at-risk count per index: total minus the users with shorter
      // lifetimes (integer prefix sums — exact, order-free)
      .withColumn("__nr", expr(
        """transform(__a, (e, i) ->
          |  __tot - aggregate(slice(__a, 1, i), 0L, (a, x) -> a + x.__n))""".stripMargin))
      .withColumn("__f", expr(
        """zip_with(__a, __nr, (e, n) ->
          |  1D - CAST(e.d AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
      .withColumn("__s", expr(
        """transform(__f, (f, i) ->
          |  aggregate(slice(__f, 1, i + 1), 1D, (a, x) -> a * x))""".stripMargin))
      .select(posexplode(expr(
        "zip_with(__a, zip_with(__nr, __s, (n, s) -> struct(n AS nr, s AS sv))," +
          " (e, x) -> struct(e.t AS t, x.nr AS nr, e.d AS d, e.c AS c, x.sv AS sv))"))
        .as(Seq("__p", "__e")))
      .select(col("__e.t").as("t"), col("__e.nr").as("n_risk"),
        col("__e.d").as("d_events"), col("__e.c").as("n_censored"),
        round(col("__e.sv"), 6).as("survival"))
  }

  /** Mann–Kendall trend test + Theil–Sen slope of the per-type daily
    * mean-value series — the ROBUST trend monitor ([[holtForecast]]'s
    * nonparametric sibling): MK asks "is there a monotone trend?"
    * without assuming a distribution, Theil–Sen estimates its magnitude
    * as the median pairwise slope (unaffected by outlier days that
    * wreck an OLS fit like [[graft.stats.Profile.groupRegression]]).
    *
    *   S       = Σ_{i<j} sign(x_j − x_i)                (exact long)
    *   Var(S)  = [n(n−1)(2n+5) − Σ_p t_p(t_p−1)(2t_p+5)] / 18
    *             (tie-corrected; the tie term is computed per ELEMENT as
    *             Σ_i (c_i−1)(2c_i+5), c_i = multiplicity of x_i — each
    *             group of t equal values contributes t identical terms,
    *             summing to the textbook per-group formula)
    *   Z       = (S∓1)/√Var(S), 0 at S=0 — the continuity-corrected
    *             normal approximation; |Z| > 1.96 ⇒ trend at 5%
    *   slope   = median over pairs of (x_j − x_i)/(d_j − d_i), day gaps
    *             in real days (gap-robust), median taken EXPLICITLY
    *             (middle element, or mean of the two middles) so both
    *             engines pick identical values
    *
    * Everything integer until the final divisions ([[acf]] parity
    * family); per-type state is the day-indexed series plus its
    * C(days,2) pair arrays — bounded by corpus days, independent of
    * event count. Types with <2 days are dropped (no pair exists).
    */
  def mannKendall(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(Num.dec2(col("value"))).cast("double") /
        count(lit(1)).cast("double")).as("x"))
    daily
      .groupBy(col("event_type"))
      .agg(expr(
        """array_sort(collect_list(struct(
          |  datediff(day, to_date('1970-01-01')) AS d, x)))""".stripMargin)
        .as("__s"))
      .withColumn("__n", size(col("__s")))
      .filter(col("__n") >= 2)
      .withColumn("__sgn", expr(
        """aggregate(flatten(transform(sequence(1, __n - 1), i ->
          |  transform(sequence(i + 1, __n), j ->
          |    CASE WHEN __s[j - 1].x > __s[i - 1].x THEN 1L
          |         WHEN __s[j - 1].x < __s[i - 1].x THEN -1L
          |         ELSE 0L END))), 0L, (a, v) -> a + v)""".stripMargin))
      .withColumn("__ties", expr(
        """aggregate(transform(__s, e ->
          |  size(filter(__s, o -> o.x = e.x))), 0L,
          |  (a, c) -> a + CAST((c - 1) * (2 * c + 5) AS BIGINT))""".stripMargin))
      .withColumn("__var", expr(
        """CAST(CAST(__n AS BIGINT) * (__n - 1) * (2 * __n + 5) - __ties
          |  AS DOUBLE) / 18D""".stripMargin))
      .withColumn("__sl", expr(
        """array_sort(flatten(transform(sequence(1, __n - 1), i ->
          |  transform(sequence(i + 1, __n), j ->
          |    (__s[j - 1].x - __s[i - 1].x) /
          |    CAST(__s[j - 1].d - __s[i - 1].d AS DOUBLE)))))""".stripMargin))
      .withColumn("__m", size(col("__sl")))
      .withColumn("__z", expr(
        """CASE WHEN __var <= 0D THEN 0D
          |     WHEN __sgn > 0 THEN CAST(__sgn - 1 AS DOUBLE) / sqrt(__var)
          |     WHEN __sgn < 0 THEN CAST(__sgn + 1 AS DOUBLE) / sqrt(__var)
          |     ELSE 0D END""".stripMargin))
      .select(col("event_type"), col("__n").cast("long").as("n_days"),
        col("__sgn").as("s"), col("__var").as("var_s"),
        (round(col("__z"), 6) + lit(0.0)).as("z"),
        (round(expr(
          """CASE WHEN __m % 2 = 1 THEN __sl[(__m - 1) DIV 2]
            |ELSE (__sl[__m DIV 2 - 1] + __sl[__m DIV 2]) / 2D END""".stripMargin),
          6) + lit(0.0)).as("sen_slope"),
        expr(
          """CASE WHEN round(__z, 6) > 1.96D THEN 'increasing'
            |     WHEN round(__z, 6) < -1.96D THEN 'decreasing'
            |     ELSE 'no_trend' END""".stripMargin).as("trend"))
  }

  /** Holt double-exponential smoothing (level + trend) of the per-type
    * daily mean-value series — the forecasting model one rung above
    * [[ewma]]: EWMA flattens a trending series (its forecast is a
    * constant), Holt carries a trend term so the h-step-ahead forecast
    * l + h·b tracks drift — capacity planning / ingest-volume projection
    * over the same daily aggregates the anomaly gates read.
    *
    * Standard form (Holt 1957): l₁ = x₁, b₁ = x₂ − x₁; for t ≥ 2
    * lₜ = α·xₜ + (1−α)(lₜ₋₁ + bₜ₋₁), bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁.
    *
    * Determinism contract ([[ewma]]/[[acf]] family): the recursion is a
    * sequential fold over the day-ordered series array with struct state
    * (l, b) — Spark's `aggregate` HOF takes an arbitrary zero type, so
    * the two-field state folds in one pass; bₜ re-states the lₜ
    * expression verbatim (a struct field cannot reference a sibling),
    * which both engines evaluate identically. The oracle replays the
    * SAME ops as a recursive CTE — NOT a struct-state `list_reduce`,
    * which DuckDB evaluates by mutating the accumulator field-by-field
    * (field 'b' would see the already-updated 'l'; measured, not
    * hypothesized). Per-type state is the day-indexed series (~corpus
    * days, bounded); types with <2 days are dropped in both engines
    * (no trend is definable).
    */
  def holtForecast(events: DataFrame, alpha: Double = 0.3,
                   beta: Double = 0.2, horizon: Int = 7): DataFrame = {
    // 1-α / 1-β interpolate to their exact short decimal reprs for the
    // suite's parameter choices (1.0-0.3 == 0.7 bit-exactly) — the ewma
    // precedent; the oracle embeds the same literals.
    val (a, ca, b, cb) = (alpha, 1.0 - alpha, beta, 1.0 - beta)
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(Num.dec2(col("value"))).cast("double") /
        count(lit(1)).cast("double")).as("x"))
    daily
      .groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(day, x))), e -> e.x)")
        .as("__xs"))
      .withColumn("__n", size(col("__xs")))
      .filter(col("__n") >= 2)
      .withColumn("__st", expr(
        s"""aggregate(slice(__xs, 2, __n - 1),
           |  named_struct('l', __xs[0], 'b', __xs[1] - __xs[0]),
           |  (acc, x) -> named_struct(
           |    'l', ${a}D * x + ${ca}D * (acc.l + acc.b),
           |    'b', ${b}D * ((${a}D * x + ${ca}D * (acc.l + acc.b)) - acc.l)
           |      + ${cb}D * acc.b))""".stripMargin))
      .select(col("event_type"), col("__n").cast("long").as("n_days"),
        (round(col("__st.l"), 6) + lit(0.0)).as("level"),
        (round(col("__st.b"), 6) + lit(0.0)).as("trend"),
        (round(col("__st.l") + lit(horizon.toDouble) * col("__st.b"), 6)
          + lit(0.0)).as("forecast"))
  }
}
