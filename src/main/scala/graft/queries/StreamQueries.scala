package graft.queries

import graft.operators.Relational
import graft.streaming.EventStreams
import graft.util.{Num, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-time windowed aggregations over `events` — the batch-mode semantics
  * of the engine's Structured Streaming jobs ([[graft.streaming]]), verified
  * against DuckDB. The streaming variants run the same plan incrementally
  * with a watermark; batch output == streaming output after all data arrives
  * (tested in the streaming specs).
  */
object StreamQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour event-time window (same plan as the streaming job).
    "q_window_tumbling" -> ((s, dir) =>
      EventStreams.tumblingCounts(Tables.events(s, dir))),

    // Gap-based session windows (30-min inactivity) via session_window.
    "q_session_window" -> ((s, dir) =>
      EventStreams.sessions(Tables.events(s, dir))),

    // Clickstream sequence mining: top event-type trigram paths within
    // 30-minute sessions — one user-partitioned exchange end-to-end.
    "q_event_paths" -> ((s, dir) =>
      EventStreams.sessionPaths(Tables.events(s, dir))),

    // Distribution-rank window functions per type partition:
    // percent_rank and cume_dist are exact integer-ratio divisions, so
    // they are engine-deterministic without decimal routing.
    "q_window_cume" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_type"), col("event_id"), col("value"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("pct_rank").desc, col("event_id").asc)
        .limit(50)
    }),

    // Gaps-and-islands: contiguous active-DAY runs per user via the
    // day − row_number() grouping constant — the id-domain twin of the
    // time-gap sessionizer (q_session_window); one user-partitioned
    // exchange end-to-end.
    "q_islands" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("__grp",
          datediff(col("day"), lit("1970-01-01").cast("date")) -
            row_number().over(w))
        .groupBy(col("user_id"), col("__grp"))
        .agg(min(col("day")).as("island_start"),
          max(col("day")).as("island_end"), Num.cnt.as("n_days"))
        .groupBy(col("user_id"))
        .agg(Num.cnt.as("n_islands"), max(col("n_days")).as("longest_island"))
    }),

    // Typed-Aggregator top-k per group: each map task forwards AT MOST
    // k pairs per group (the shuffle is O(groups·k), input-size-free) —
    // the Aggregator/UDAF answer to the window formulation whose
    // shuffle carries every row. Rank derived by posexplode of the
    // sorted finish array — no window anywhere.
    "q_topk_agg" -> ((s, dir) => {
      val tk = udaf(new graft.operators.TopKByValue(3),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(tk(col("value"), col("event_id")).as("__top"))
        .select(col("event_type"), posexplode(col("__top")).as(Seq("__p", "__e")))
        .select(col("event_type"), (col("__p") + 1).cast("long").as("rank"),
          col("__e._1").as("value"), col("__e._2").as("event_id"))
    }),

    // Corrupt-record quarantine (dead-letter routing): a deterministic
    // slice of props payloads is corrupted in-flight, parse failures are
    // ROUTED (never dropped, never job-failing) and both lanes are
    // audited — the ETL admission pattern. from_json in PERMISSIVE mode
    // yields an all-null struct for malformed input, so the lane test is
    // on the REQUIRED FIELD (which also quarantines valid-JSON rows
    // missing the contract key — the stricter, correct admission rule).
    "q_quarantine" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("__raw", when(col("user_id") % 13 === 0,
          concat(lit("x"), col("props"))).otherwise(col("props")))
        .withColumn("__k",
          from_json(col("__raw"), lit("k BIGINT")).getField("k"))
      ev.select(
          when(col("__k").isNotNull, "good").otherwise("quarantined")
            .as("lane"),
          col("event_id"), col("user_id"), col("__k"))
        .groupBy(col("lane"))
        .agg(Num.cnt.as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("__k")).cast("long").as("sum_k"))
    }),

    // First/last-touch attribution: each purchase credited to the first
    // and last click in its 2-hour lookback; unattributed kept with
    // nulls. Interval join + combinable per-conversion groupBy.
    "q_attribution" -> ((s, dir) =>
      EventStreams.attribution(Tables.events(s, dir),
        from = "click", to = "purchase", lookback = "2 hours")),

    // Strict-order 3-stage funnel view→click→purchase: per-stage user
    // counts + conversion vs stage 1; conditional-min chain, no window.
    "q_funnel3" -> ((s, dir) =>
      EventStreams.funnelStages(Tables.events(s, dir),
        Seq("view", "click", "purchase"))),

    // Temporal train/test split leakage audit at the snapshot-diff cut:
    // user overlap across the split + leaked test-event count.
    "q_split_leakage" -> ((s, dir) =>
      EventStreams.splitLeakage(Tables.events(s, dir),
        lit("2024-01-16").cast("timestamp"))),

    // First-order Markov transition matrix P(dst | src) over consecutive
    // same-user events — one user-partitioned exchange, then |types|²-row
    // normalization.
    "q_markov" -> ((s, dir) =>
      EventStreams.markovTransitions(Tables.events(s, dir))),

    // Day-of-week multiplicative seasonal index per event type; exact
    // decimal sums, engine-neutral arithmetic dow.
    "q_seasonality" -> ((s, dir) =>
      EventStreams.dowSeasonality(Tables.events(s, dir))),

    // Autocorrelation (lags 1–3) of the daily mean-value series per event
    // type — sequential-fold order contract like q_ewma.
    "q_acf" -> ((s, dir) =>
      EventStreams.acf(Tables.events(s, dir), maxLag = 3)),

    // Holt level+trend smoothing of the same daily series, 7-day-ahead
    // forecast — the trend-aware rung above q_ewma. Struct-state fold;
    // oracle replays the recursion as a recursive CTE (see the operator
    // doc for why NOT DuckDB list_reduce).
    "q_holt" -> ((s, dir) =>
      EventStreams.holtForecast(Tables.events(s, dir),
        alpha = 0.3, beta = 0.2, horizon = 7)),

    // Mann–Kendall monotone-trend test + Theil–Sen median slope over the
    // same daily series — the nonparametric/robust trend monitor; exact
    // integer S and tie-corrected variance, explicit median.
    "q_trend_mk" -> ((s, dir) =>
      EventStreams.mannKendall(Tables.events(s, dir))),

    // Kaplan–Meier survival over PURCHASE lifetimes (first→last purchase
    // per user; stopped-purchasing = churn, right-censored in the final
    // 7 corpus days) — the all-events lifetime is degenerate on this
    // corpus (every user active daily ⇒ everyone censored); purchases
    // are sparse, so the curve has real deaths at many t. Integer risk
    // sets + sequential product fold, no window shuffle.
    "q_survival" -> ((s, dir) =>
      EventStreams.kaplanMeier(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        censorDays = 7)),

    // CUPED-adjusted A/B lift: pre-period value as control variate,
    // pooled theta from exact decimal sums, per-arm adjusted mean
    // derived algebraically (no per-user double summation anywhere).
    "q_cuped" -> ((s, dir) =>
      EventStreams.cupedLift(Tables.events(s, dir), preDays = 7)),

    // Difference-in-differences over the same pre/post cut — the
    // non-randomized-rollout estimator; 4 exact cells, one row out.
    "q_did" -> ((s, dir) =>
      EventStreams.didEstimate(Tables.events(s, dir), preDays = 7)),

    // Rolling-origin 1-step backtest of the Holt model: MAE/RMSE of
    // out-of-sample daily forecasts per type — prefix-state folds,
    // errors folded in day order on both engines.
    "q_holt_backtest" -> ((s, dir) =>
      EventStreams.holtBacktest(Tables.events(s, dir),
        alpha = 0.3, beta = 0.2)),

    // Experiment health panel: SRM chi-square on the arm split + the
    // minimum detectable effect at alpha=5%/power=80% — the checks
    // that gate reading any lift. One row out.
    "q_ab_health" -> ((s, dir) =>
      EventStreams.abHealth(Tables.events(s, dir))),

    // Sliding 1-hour window, 30-minute step: each event lands in 2 windows.
    "q_window_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(Num.cnt.as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))),

    // Stream-stream interval join in batch: clicks × same-user views within
    // a 2-hour lookback (the watermark-bounded streaming variant is the
    // same plan — see EventStreams.clickViewJoin).
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      EventStreams.clickViewJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"),
        lookback = "2 hours")
    }),

    // Per-user EWMA of event values (α=0.2) — time-series smoothing as a
    // deterministic sequential fold: events sorted by (ts, event_id) inside
    // a per-user collected array, folded with the same left-to-right
    // semantics as the oracle's list_reduce. Per-user state is the user's
    // own event list (bounded); the unbounded-stream variant is the
    // windowed aggregation family above.
    "q_ewma" -> ((s, dir) =>
      EventStreams.ewma(Tables.events(s, dir), alpha = 0.2)),

    // Cohort retention matrix: distinct users per (first-seen cohort date,
    // day offset).
    "q_retention" -> ((s, dir) =>
      EventStreams.retention(Tables.events(s, dir))),

    // Windowed EWMA: the same fold per (user, 1-hour tumbling window) —
    // bounded state, watermark-evictable under readStream.
    "q_ewma_windowed" -> ((s, dir) =>
      EventStreams.ewmaWindowed(Tables.events(s, dir), alpha = 0.2)),

    // Conversion funnel: clicks followed by a purchase within 1 hour,
    // rolled up per user (bounded left interval join + two combinable aggs).
    "q_funnel" -> ((s, dir) =>
      EventStreams.conversionFunnel(Tables.events(s, dir),
        from = "click", to = "purchase", horizon = "1 hour")),

    // Streaming-compatible z-score: each event vs its user's PREVIOUS
    // tumbling day (closed-window stats join; ~2.5 events/user/day here).
    "q_anomaly_windowed" -> ((s, dir) =>
      EventStreams.anomaliesWindowed(Tables.events(s, dir),
        minN = 5, zThreshold = 2.0, windowUnit = "day")),

    // Recency-weighted engagement: exponentially decayed value sum per
    // user (half-life ~ 7 days at lambda=0.1/day).
    "q_decayed" -> ((s, dir) =>
      EventStreams.decayedSum(Tables.events(s, dir), lambdaPerDay = 0.1)),

    // CUSUM level-shift alarms per user (kappa=10 slack, h=60 threshold).
    "q_cusum" -> ((s, dir) =>
      EventStreams.cusum(Tables.events(s, dir), kappa = 10.0, h = 60.0)),

    // Rolling z-score anomalies: each value scored against its user's
    // previous 20 events; |z| >= 2.5 flagged.
    "q_anomaly" -> ((s, dir) =>
      EventStreams.anomalies(Tables.events(s, dir),
        lookback = 20, minN = 10, zThreshold = 2.5)),

    // Robust MAD outliers per event_type — the median-based twin of
    // q_anomaly's z-score (outlier-poisoning-proof threshold).
    "q_anomaly_mad" -> ((s, dir) =>
      EventStreams.madOutliers(Tables.events(s, dir), k = 3.0)),

    // Streaming-dedup semantics in batch: latest event per user
    // (`dropDuplicates` + watermark in the streaming variant).
    "q_event_latest" -> ((s, dir) =>
      Relational.dedupKeepFirst(
        Tables.events(s, dir),
        key = Seq(col("user_id")),
        order = Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))),

    // Daily resample + LOCF gap fill for a hash-sampled user slice —
    // time-series regularization onto a uniform grid.
    "q_gapfill" -> ((s, dir) =>
      EventStreams.gapFillDaily(Tables.events(s, dir), userMod = 13))
  )

  override def oracleSql: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands: break when the gap to the previous event is >= the
    // session gap (Spark's session end bound is exclusive), session_end =
    // last event + gap.
    "q_window_cume" ->
      """SELECT event_type, event_id, value,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY pct_rank DESC, event_id ASC LIMIT 50""".stripMargin,

    "q_islands" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |    date_diff('day', DATE '1970-01-01', day) -
        |      row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d),
        |i AS (SELECT user_id, grp, min(day) AS island_start,
        |    max(day) AS island_end, CAST(count(*) AS BIGINT) AS n_days
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(max(n_days) AS BIGINT) AS longest_island
        |FROM i GROUP BY user_id""".stripMargin,

    "q_topk_agg" ->
      """WITH r AS (SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id ASC) AS rnk
        |  FROM events)
        |SELECT event_type, CAST(rnk AS BIGINT) AS rank, value, event_id
        |FROM r WHERE rnk <= 3""".stripMargin,

    "q_quarantine" ->
      """WITH r AS (SELECT event_id, user_id,
        |    CASE WHEN user_id % 13 = 0 THEN 'x' || props ELSE props END AS raw
        |  FROM events),
        |p AS (SELECT event_id, user_id,
        |    CASE WHEN json_valid(raw)
        |      THEN TRY_CAST(json_extract_string(raw, '$.k') AS BIGINT) END AS k
        |  FROM r),
        |l AS (SELECT *,
        |    CASE WHEN k IS NOT NULL THEN 'good' ELSE 'quarantined' END AS lane
        |  FROM p)
        |SELECT lane, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM l GROUP BY lane""".stripMargin,

    "q_attribution" ->
      """WITH f AS (SELECT user_id, ts AS fts, event_id AS fid FROM events
        |    WHERE event_type = 'click'),
        |t AS (SELECT user_id, ts AS conv_ts, event_id AS conv_id FROM events
        |    WHERE event_type = 'purchase'),
        |j AS (SELECT t.user_id, t.conv_id, t.conv_ts, f.fid,
        |    CASE WHEN f.fid IS NULL THEN NULL ELSE
        |      lpad(CAST(epoch_us(f.fts) AS VARCHAR), 20, '0') ||
        |      lpad(CAST(f.fid AS VARCHAR), 12, '0') END AS k
        |  FROM t LEFT JOIN f ON t.user_id = f.user_id
        |    AND f.fts < t.conv_ts AND f.fts >= t.conv_ts - INTERVAL '2 hours')
        |SELECT user_id, conv_id,
        |  CAST(count(fid) AS BIGINT) AS n_touches,
        |  CAST(substring(min(k), 21, 12) AS BIGINT) AS first_touch_id,
        |  CAST(substring(max(k), 21, 12) AS BIGINT) AS last_touch_id
        |FROM j GROUP BY user_id, conv_id, conv_ts""".stripMargin,

    "q_funnel3" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id),
        |c AS (SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |    CAST(count(*) AS BIGINT) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT stage, event_type, n_users,
        |  round(CAST(n_users AS DOUBLE) /
        |    CAST((SELECT count(*) FROM s1) AS DOUBLE), 6) AS conv_rate
        |FROM c""".stripMargin,

    "q_split_leakage" ->
      """WITH f AS (SELECT user_id,
        |    max(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS in_train,
        |    max(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS in_test,
        |    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n_test_ev
        |  FROM events GROUP BY user_id)
        |SELECT CAST(SUM(in_train) AS BIGINT) AS n_train_users,
        |  CAST(SUM(in_test) AS BIGINT) AS n_test_users,
        |  CAST(SUM(in_train * in_test) AS BIGINT) AS n_overlap_users,
        |  CAST(SUM(CASE WHEN in_train * in_test = 1 THEN n_test_ev ELSE 0 END) AS BIGINT)
        |    AS n_leaked_test_events,
        |  round(CAST(SUM(in_train * in_test) AS DOUBLE) /
        |    CAST(SUM(in_test) AS DOUBLE), 6) AS overlap_pct
        |FROM f""".stripMargin,

    "q_markov" ->
      """WITH p AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM events),
        |c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
        |FROM c""".stripMargin,

    "q_seasonality" ->
      """WITH cell AS (SELECT event_type,
        |    CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 AS BIGINT) AS dow,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, n,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dow_mean,
        |  round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
        |    (CAST(SUM(s) OVER (PARTITION BY event_type) AS DOUBLE) /
        |     CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)), 6) AS seasonal_index
        |FROM cell""".stripMargin,

    "q_acf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(x ORDER BY day) AS xs FROM daily GROUP BY event_type),
        |m AS (SELECT event_type, xs, len(xs) AS n,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), xs), (a, v) -> a + v)
        |      / CAST(len(xs) AS DOUBLE) AS mu
        |  FROM s),
        |d AS (SELECT *, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(xs, v -> (v - mu) * (v - mu))), (a, v) -> a + v) AS den
        |  FROM m)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS lag,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_zip(xs[k+1:n], xs[1:n-k]),
        |      z -> (z[1] - mu) * (z[2] - mu))), (a, v) -> a + v) / den, 6)
        |    + CAST(0 AS DOUBLE) AS acf
        |FROM d, (SELECT unnest([1, 2, 3]) AS k) ks""".stripMargin,

    // Same per-step IEEE ops as the engine's fold, replayed as a
    // recursive CTE over the day-ranked series; the duplicated l-update
    // inside the b expression mirrors the engine's struct construction.
    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    x, count(*) OVER (PARTITION BY event_type) AS n FROM daily),
        |holt AS (
        |  SELECT s1.event_type, 1 AS t, s1.x AS l, s2.x - s1.x AS b
        |  FROM ser s1 JOIN ser s2 ON s1.event_type = s2.event_type AND s1.t = 1 AND s2.t = 2
        |  UNION ALL
        |  SELECT h.event_type, h.t + 1,
        |    CAST(0.3 AS DOUBLE) * s.x + CAST(0.7 AS DOUBLE) * (h.l + h.b),
        |    CAST(0.2 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * s.x
        |        + CAST(0.7 AS DOUBLE) * (h.l + h.b)) - h.l)
        |      + CAST(0.8 AS DOUBLE) * h.b
        |  FROM holt h JOIN ser s ON s.event_type = h.event_type AND s.t = h.t + 1)
        |SELECT h.event_type, CAST(c.n AS BIGINT) AS n_days,
        |  round(h.l, 6) + CAST(0 AS DOUBLE) AS level,
        |  round(h.b, 6) + CAST(0 AS DOUBLE) AS trend,
        |  round(h.l + CAST(7 AS DOUBLE) * h.b, 6) + CAST(0 AS DOUBLE) AS forecast
        |FROM holt h
        |JOIN (SELECT event_type, max(n) AS n FROM ser GROUP BY 1) c
        |  ON h.event_type = c.event_type AND h.t = c.n""".stripMargin,

    "q_did" ->
      """WITH cut AS (SELECT CAST(min(ts) AS DATE) + 7 AS cd FROM events),
        |c AS (SELECT user_id % 2 AS arm, CAST(ts AS DATE) >= cut.cd AS post,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS m
        |  FROM events, cut GROUP BY 1, 2),
        |w AS (SELECT
        |    MAX(CASE WHEN arm = 0 AND NOT post THEN m END) AS p0,
        |    MAX(CASE WHEN arm = 0 AND post THEN m END) AS q0,
        |    MAX(CASE WHEN arm = 1 AND NOT post THEN m END) AS p1,
        |    MAX(CASE WHEN arm = 1 AND post THEN m END) AS q1
        |  FROM c)
        |SELECT round(p0, 6) AS pre_ctrl, round(q0, 6) AS post_ctrl,
        |  round(p1, 6) AS pre_treat, round(q1, 6) AS post_treat,
        |  round(q0 - p0, 6) AS delta_ctrl, round(q1 - p1, 6) AS delta_treat,
        |  round((q1 - p1) - (q0 - p0), 6) AS did
        |FROM w""".stripMargin,

    // Windowed relational replay of the same integer risk sets; the
    // prefix product is list() OVER (ORDER BY t) + list_reduce — the
    // identical left-to-right fold the engine runs over its array.
    "q_survival" ->
      """WITH pe AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT CAST(max(ts) AS DATE) - 7 AS hd FROM pe),
        |u AS (SELECT user_id, CAST(min(ts) AS DATE) AS f, CAST(max(ts) AS DATE) AS l
        |  FROM pe GROUP BY 1),
        |lt AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t, l > h.hd AS cens
        |  FROM u, h),
        |cell AS (SELECT t,
        |    CAST(SUM(CASE WHEN cens THEN 0 ELSE 1 END) AS BIGINT) AS d,
        |    CAST(SUM(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lt GROUP BY 1),
        |w1 AS (SELECT *, SUM(n) OVER ()
        |    - COALESCE(SUM(n) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM cell),
        |w2 AS (SELECT *, CAST(1 AS DOUBLE)
        |    - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f FROM w1),
        |w3 AS (SELECT *, list(f) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lf
        |  FROM w2)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events, c AS n_censored,
        |  round(list_reduce(list_prepend(CAST(1 AS DOUBLE), lf),
        |    (a, x) -> a * x), 6) AS survival
        |FROM w3""".stripMargin,

    // Exact-decimal pooled moments; theta and the adjusted means are the
    // identical double expressions in both engines (theta unrounded
    // where it feeds mean_y_adj, rounded only as its own column).
    "q_cuped" ->
      """WITH cut AS (SELECT CAST(min(ts) AS DATE) + 7 AS cd FROM events),
        |per AS (SELECT user_id,
        |    SUM(CASE WHEN CAST(ts AS DATE) < cut.cd
        |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
        |    SUM(CASE WHEN CAST(ts AS DATE) >= cut.cd
        |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
        |  FROM events, cut GROUP BY user_id),
        |p AS (SELECT CAST(count(*) AS DOUBLE) AS nd, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM per),
        |th AS (SELECT nd, sx,
        |    CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |           * CAST(sx AS DOUBLE) / nd = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
        |    ELSE (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |           * CAST(sy AS DOUBLE) / nd)
        |       / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |           * CAST(sx AS DOUBLE) / nd) END AS theta
        |  FROM p),
        |a AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
        |    SUM(x) AS sxa, SUM(y) AS sya FROM per GROUP BY 1)
        |SELECT arm, n_users,
        |  round(CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_x,
        |  round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_y,
        |  round(theta, 6) AS theta,
        |  round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) - theta
        |    * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE)
        |       - CAST(sx AS DOUBLE) / nd), 6) AS mean_y_adj
        |FROM a, th""".stripMargin,

    "q_ab_health" ->
      """WITH per AS (SELECT user_id, user_id % 2 AS arm,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS y FROM events GROUP BY user_id),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(y) AS sy FROM per),
        |a AS (SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |    SUM(CASE WHEN arm = 0 THEN y END) AS sy0,
        |    SUM(CASE WHEN arm = 1 THEN y END) AS sy1,
        |    SUM(CASE WHEN arm = 0 THEN y * y END) AS syy0,
        |    SUM(CASE WHEN arm = 1 THEN y * y END) AS syy1 FROM per),
        |x AS (SELECT a.*, m.*, CAST(n AS DOUBLE) / CAST(2 AS DOUBLE) AS e FROM a, m),
        |y AS (SELECT *,
        |    power(CAST(n_ctrl AS DOUBLE) - e, 2) / e
        |      + power(CAST(n_treat AS DOUBLE) - e, 2) / e AS chi2,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS meanv,
        |    CASE WHEN n_ctrl >= 2 AND n_treat >= 2 THEN
        |    ((CAST(syy0 AS DOUBLE) - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE)
        |        / CAST(n_ctrl AS DOUBLE))
        |     + (CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
        |        / CAST(n_treat AS DOUBLE))) / CAST(n - 2 AS DOUBLE) END AS varv
        |  FROM x),
        |z AS (SELECT *, (CAST(1.96 AS DOUBLE) + CAST(0.84 AS DOUBLE))
        |    * sqrt(varv * (CAST(1 AS DOUBLE) / CAST(n_ctrl AS DOUBLE)
        |      + CAST(1 AS DOUBLE) / CAST(n_treat AS DOUBLE))) AS mde FROM y)
        |SELECT n_ctrl, n_treat, round(chi2, 6) AS srm_chi2,
        |  chi2 > CAST(3.841 AS DOUBLE) AS srm,
        |  round(meanv, 6) AS mean_y, round(varv, 6) AS var_y,
        |  round(mde, 6) AS mde_abs, round(mde / meanv, 6) AS mde_rel
        |FROM z""".stripMargin,

    // Same recursive state chain as q_holt; state at t−1 forecasts t,
    // errors folded in day order via list(e ORDER BY t) + list_reduce.
    "q_holt_backtest" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    x, count(*) OVER (PARTITION BY event_type) AS n FROM daily),
        |holt AS (
        |  SELECT s1.event_type, 1 AS t, s1.x AS l, s2.x - s1.x AS b
        |  FROM ser s1 JOIN ser s2 ON s1.event_type = s2.event_type AND s1.t = 1 AND s2.t = 2
        |  UNION ALL
        |  SELECT h.event_type, h.t + 1,
        |    CAST(0.3 AS DOUBLE) * s.x + CAST(0.7 AS DOUBLE) * (h.l + h.b),
        |    CAST(0.2 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * s.x
        |        + CAST(0.7 AS DOUBLE) * (h.l + h.b)) - h.l)
        |      + CAST(0.8 AS DOUBLE) * h.b
        |  FROM holt h JOIN ser s ON s.event_type = h.event_type AND s.t = h.t + 1),
        |errs AS (SELECT h.event_type, s.t, abs(s.x - (h.l + h.b)) AS e
        |  FROM holt h JOIN ser s ON s.event_type = h.event_type AND s.t = h.t + 1
        |  WHERE h.t >= 2),
        |le AS (SELECT event_type, list(e ORDER BY t) AS ls,
        |    CAST(count(*) AS BIGINT) AS m FROM errs GROUP BY 1)
        |SELECT event_type, m AS n_evals,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), ls),
        |    (a, e) -> a + e) / CAST(m AS DOUBLE), 6) AS mae,
        |  round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(ls, e -> e * e)), (a, e) -> a + e)
        |    / CAST(m AS DOUBLE)), 6) AS rmse
        |FROM le""".stripMargin,

    // Pairwise replay as a day-ranked self-join; identical integer S /
    // tie term and the same explicit median indexing as the engine.
    "q_trend_mk" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, date_diff('day', DATE '1970-01-01', day) AS d, x FROM daily),
        |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ser
        |  GROUP BY 1 HAVING count(*) >= 2),
        |pairs AS (SELECT a.event_type,
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
        |    (b.x - a.x) / CAST(b.d - a.d AS DOUBLE) AS slope
        |  FROM ser a JOIN ser b ON a.event_type = b.event_type AND a.d < b.d),
        |sv AS (SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s,
        |    list(slope ORDER BY slope) AS ls, CAST(count(*) AS BIGINT) AS m
        |  FROM pairs GROUP BY 1),
        |tt AS (SELECT event_type, CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie
        |  FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS c
        |    FROM ser GROUP BY 1, 2) g GROUP BY 1),
        |v AS (SELECT nn.event_type, nn.n, sv.s, sv.ls, sv.m,
        |    CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - COALESCE(tt.tie, 0) AS DOUBLE)
        |      / CAST(18 AS DOUBLE) AS var_s
        |  FROM nn JOIN sv ON nn.event_type = sv.event_type
        |  LEFT JOIN tt ON nn.event_type = tt.event_type),
        |z AS (SELECT *, CASE WHEN var_s <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
        |    WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
        |    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
        |    ELSE CAST(0 AS DOUBLE) END AS zv FROM v)
        |SELECT event_type, n AS n_days, s, var_s,
        |  round(zv, 6) + CAST(0 AS DOUBLE) AS z,
        |  round(CASE WHEN m % 2 = 1 THEN ls[CAST((m - 1) // 2 AS INT) + 1]
        |    ELSE (ls[CAST(m // 2 AS INT)] + ls[CAST(m // 2 AS INT) + 1])
        |      / CAST(2 AS DOUBLE) END, 6) + CAST(0 AS DOUBLE) AS sen_slope,
        |  CASE WHEN round(zv, 6) > CAST(1.96 AS DOUBLE) THEN 'increasing'
        |       WHEN round(zv, 6) < CAST(-1.96 AS DOUBLE) THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z""".stripMargin,

    "q_event_paths" ->
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS grp FROM x),
        |t AS (SELECT event_type || '>' || lead(event_type, 1) OVER w2
        |      || '>' || lead(event_type, 2) OVER w2 AS path,
        |    grp = lead(grp, 2) OVER w2 AS same_sess
        |  FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM t WHERE same_sess
        |GROUP BY path ORDER BY n DESC, path ASC LIMIT 15""".stripMargin,

    "q_session_window" ->
      """WITH x AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS grp FROM x)
        |SELECT MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL '30 minutes' AS session_end,
        |  user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "q_window_sliding" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - (k.k * INTERVAL '30 minutes') AS window_start,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
        |GROUP BY 1, 2""".stripMargin,

    "q_anomaly_windowed" ->
      """WITH s AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |      AS DOUBLE) AS s2
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT user_id, h + INTERVAL 1 DAY AS scored_h,
        |    s1 / CAST(n AS DOUBLE) AS mean,
        |    (s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS varr
        |  FROM s WHERE n >= 5),
        |z AS (SELECT e.event_id, e.user_id, CAST(e.value AS DOUBLE) AS value,
        |    round(st.mean, 6) AS win_mean,
        |    round((e.value - st.mean) / sqrt(st.varr), 6) AS z
        |  FROM events e JOIN st ON e.user_id = st.user_id
        |    AND date_trunc('day', CAST(e.ts AS TIMESTAMP)) = st.scored_h
        |  WHERE st.varr > 0.0)
        |SELECT event_id, user_id, value, win_mean, z FROM z WHERE abs(z) >= 2.0""".stripMargin,

    "q_decayed" ->
      """WITH m AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(round(value * exp(-0.1 *
        |    (CAST(m.max_us - epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
        |      / 86400000000.0)), 9) AS DECIMAL(28,9))) AS DOUBLE) AS decayed_sum
        |FROM events CROSS JOIN m
        |GROUP BY user_id""".stripMargin,

    "q_cusum" ->
      """WITH o AS (SELECT user_id,
        |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mu
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(list_reduce(
        |    list_prepend([0.0, 0.0, 0.0], list_transform(vals, v -> [v, 0.0, 0.0])),
        |    (a, b) -> CASE WHEN greatest(0.0, a[1] + (b[1] - mu - 10.0)) > 60.0
        |        OR greatest(0.0, a[2] + (mu - 10.0 - b[1])) > 60.0
        |      THEN [0.0, 0.0, a[3] + 1.0]
        |      ELSE [greatest(0.0, a[1] + (b[1] - mu - 10.0)),
        |            greatest(0.0, a[2] + (mu - 10.0 - b[1])), a[3]] END)[3] AS BIGINT)
        |    AS n_alarms
        |FROM o""".stripMargin,

    "q_anomaly_mad" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value,
        |  round(d.med, 6) AS med, round(m2.mad, 6) AS mad
        |FROM dev d JOIN mad m2 USING (event_type)
        |WHERE d.ad > 3.0 * 1.4826 * m2.mad""".stripMargin,

    "q_anomaly" ->
      """WITH w AS (SELECT event_id, user_id, CAST(value AS DOUBLE) AS value,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |      OVER win AS DOUBLE) AS s2,
        |    CAST(COUNT(*) OVER win AS DOUBLE) AS n
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT event_id, user_id, value,
        |    s1 / n AS mean, (s2 - s1 * s1 / n) / (n - 1.0) AS varr
        |  FROM w WHERE n >= 10.0),
        |z AS (SELECT event_id, user_id, value, round(mean, 6) AS win_mean,
        |    round((value - mean) / sqrt(varr), 6) AS z
        |  FROM m WHERE varr > 0.0)
        |SELECT event_id, user_id, value, win_mean, z FROM z WHERE abs(z) >= 2.5""".stripMargin,

    "q_ewma" ->
      """WITH o AS (SELECT user_id,
        |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  round(CAST(list_reduce(vals, (a, b) -> 0.2 * b + 0.8 * a) AS DOUBLE), 6) AS ewma
        |FROM o""".stripMargin,

    "q_retention" ->
      """WITH fs AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        |    FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT fs.cohort_date,
        |  CAST(date_diff('day', fs.cohort_date, act.d) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
        |FROM act JOIN fs USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q_ewma_windowed" ->
      """WITH o AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |    user_id,
        |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, user_id, n_events,
        |  round(CAST(list_reduce(vals, (a, b) -> 0.2 * b + 0.8 * a) AS DOUBLE), 6) AS ewma
        |FROM o""".stripMargin,

    "q_funnel" ->
      """WITH f AS (SELECT user_id, event_id AS from_id, ts AS from_ts
        |    FROM events WHERE event_type = 'click'),
        |t AS (SELECT user_id, ts AS to_ts FROM events WHERE event_type = 'purchase'),
        |per_click AS (SELECT f.user_id, f.from_id,
        |    MAX(CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END) AS conv
        |  FROM f LEFT JOIN t ON f.user_id = t.user_id
        |    AND t.to_ts > f.from_ts AND t.to_ts <= f.from_ts + INTERVAL '1 hour'
        |  GROUP BY f.user_id, f.from_id)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_from,
        |  CAST(SUM(conv) AS BIGINT) AS n_converted
        |FROM per_click GROUP BY user_id""".stripMargin,

    "q_interval_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |    FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |    FROM events WHERE event_type = 'view')
        |SELECT c.user_id, click_id, view_id, click_ts, view_ts
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND view_ts >= click_ts - INTERVAL '2 hours'
        |  AND view_ts < click_ts""".stripMargin,

    "q_event_latest" ->
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,

    "q_gapfill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS v
        |  FROM events WHERE user_id % 13 = 0 GROUP BY user_id, CAST(ts AS DATE)),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |j AS (SELECT g.user_id, g.day, d.v
        |  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day,
        |  round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day), 6) AS day_value,
        |  v IS NULL AS filled
        |FROM j""".stripMargin
  )
}
