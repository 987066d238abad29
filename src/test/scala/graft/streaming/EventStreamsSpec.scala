package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val rows = Seq(
    (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.0),
    (2L, ts("2024-01-01 00:20:00"), 10L, "click", 2.0),
    (3L, ts("2024-01-01 01:10:00"), 11L, "view", 3.0),
    (4L, ts("2024-01-01 01:40:00"), 10L, "click", 4.0),
    (5L, ts("2024-01-01 03:00:00"), 11L, "view", 5.0),
    (5L, ts("2024-01-01 03:00:00"), 11L, "view", 5.0) // duplicate event_id
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("streaming tumbling counts == batch tumbling counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.tumblingCounts(stream, watermark = true)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      mem.addData(rows.collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStreams.tumblingCounts(rows).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("session windows merge events within the gap and split on it") {
    val sessions = EventStreams.sessions(rows, gap = "30 minutes").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq.sorted
    // user 10: events at 00:05+00:20 merge (15 min gap), 01:40 separate;
    // user 11: 01:10 and 03:00(+dup) separate sessions
    assert(sessions == Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L)))
  }

  test("dedup first-seen drops duplicate event ids") {
    assert(EventStreams.dedupFirstSeen(rows).count() == 5)
  }

  test("ewma folds values in (ts, event_id) order, seeded with the first") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      (2L, ts("2024-01-01 00:01:00"), 7L, "view", 2.0),
      (3L, ts("2024-01-01 00:02:00"), 7L, "view", 3.0),
      (4L, ts("2024-01-01 00:00:00"), 8L, "view", 5.0) // single event → ewma = value
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.ewma(ev, alpha = 0.2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // user 7: seed 1.0 → 0.2·2+0.8·1 = 1.2 → 0.2·3+0.8·1.2 = 1.56
    assert(out(7L) == ((3L, 1.56)))
    assert(out(8L) == ((1L, 5.0)))
  }

  test("ewmaWindowed folds per (user, window); streaming == batch") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      (2L, ts("2024-01-01 00:01:00"), 7L, "view", 2.0),
      (3L, ts("2024-01-01 01:02:00"), 7L, "view", 3.0), // next hour: new fold
      (4L, ts("2024-01-01 00:30:00"), 8L, "view", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = EventStreams.ewmaWindowed(ev, alpha = 0.2)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // window 00:00 user 7 folds only its own two events; 01:00 reseeds
    assert(batch((ts("2024-01-01 00:00:00"), 7L)) == ((2L, 1.2)))
    assert(batch((ts("2024-01-01 01:00:00"), 7L)) == ((1L, 3.0)))
    assert(batch((ts("2024-01-01 00:00:00"), 8L)) == ((1L, 5.0)))
    // identical expression under a watermark as a streaming query
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "1 hour")
    val q = EventStreams.ewmaWindowed(stream, alpha = 0.2)
      .writeStream.format("memory").queryName("ewma_win_out")
      .outputMode("complete").start()
    try {
      mem.addData(ev.collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ewma_win_out").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed == batch)
    } finally q.stop()
    // the aggregation must be recognized as WATERMARKED: append mode is
    // only accepted when the window grouping key kept its event-time
    // metadata (grouping by window().start strips it and start() throws)
    val qa = EventStreams.ewmaWindowed(stream, alpha = 0.2)
      .writeStream.format("memory").queryName("ewma_win_append")
      .outputMode("append").start()
    try {
      mem.addData((99L, ts("2024-01-01 09:00:00"), 7L, "view", 1.0))
      qa.processAllAvailable()
    } finally qa.stop()
  }

  test("left-outer stream-stream join emits null-extended rows after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clickMem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val viewMem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    // click 4 has a matching view; click 5 has none — its outer row can
    // only emit once the watermark proves no in-window view can arrive
    val clicks = Seq(
      (4L, ts("2024-01-01 01:40:00"), 10L, "click", 0.0),
      (5L, ts("2024-01-01 01:45:00"), 11L, "click", 0.0))
    val views = Seq((21L, ts("2024-01-01 01:39:00"), 10L, "view", 0.0))
    // far-future events on BOTH streams advance the watermark past
    // click_ts + lookback + delay, forcing the outer emission for click 5
    val advance = ts("2024-01-01 08:00:00")
    val out = EventStreams.clickViewJoin(
      clickMem.toDF().toDF(cols: _*), viewMem.toDF().toDF(cols: _*),
      lookback = "10 minutes", watermark = true, joinType = "left_outer")
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      clickMem.addData(clicks: _*)
      viewMem.addData(views: _*)
      out.processAllAvailable()
      clickMem.addData((99L, advance, 99L, "click", 0.0))
      viewMem.addData((98L, advance, 99L, "view", 0.0))
      out.processAllAvailable()
      val streamed = spark.table("ssj_outer")
        .filter("click_id < 90") // the advance rows are still pending
        .collect()
        .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      val batch = EventStreams.clickViewJoin(
        clicks.toDF(cols: _*), views.toDF(cols: _*),
        lookback = "10 minutes", joinType = "left_outer").collect()
        .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      assert(streamed == batch)
      assert(batch == Set((4L, Some(21L)), (5L, None)))
    } finally out.stop()
  }

  test("conversion funnel counts from-events with a to-event inside the horizon") {
    val ev = Seq(
      // user 10: click at 00:05 converts (purchase 00:30); click at 02:00 doesn't
      (1L, ts("2024-01-01 00:05:00"), 10L, "click", 0.0),
      (2L, ts("2024-01-01 00:30:00"), 10L, "purchase", 0.0),
      (3L, ts("2024-01-01 02:00:00"), 10L, "click", 0.0),
      // user 11: purchase BEFORE the click — not a conversion
      (4L, ts("2024-01-01 00:10:00"), 11L, "purchase", 0.0),
      (5L, ts("2024-01-01 00:20:00"), 11L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.conversionFunnel(ev, "click", "purchase", "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 2L, 1L), (11L, 1L, 0L)))
  }

  test("stream-stream interval join == batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val clickMem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val viewMem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    // user 10: views at 01:30 and 01:39 precede the 01:40 click (10-min
    // lookback admits only 01:39 — boundary 01:30 is exactly −10 min,
    // inclusive); a view AT the click ts is excluded (strict upper bound)
    val clicks = Seq((4L, ts("2024-01-01 01:40:00"), 10L, "click", 4.0))
    val views = Seq(
      (20L, ts("2024-01-01 01:30:00"), 10L, "view", 0.0),
      (21L, ts("2024-01-01 01:39:00"), 10L, "view", 0.0),
      (22L, ts("2024-01-01 01:40:00"), 10L, "view", 0.0),
      (23L, ts("2024-01-01 01:39:30"), 99L, "view", 0.0)) // other user
    val out = EventStreams.clickViewJoin(
      clickMem.toDF().toDF(cols: _*), viewMem.toDF().toDF(cols: _*),
      lookback = "10 minutes", watermark = true)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clickMem.addData(clicks: _*)
      viewMem.addData(views: _*)
      out.processAllAvailable()
      val streamed = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = EventStreams.clickViewJoin(
        clicks.toDF(cols: _*).where("event_type = 'click'"),
        views.toDF(cols: _*).where("event_type = 'view'"),
        lookback = "10 minutes").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(batch == Set((10L, 4L, 20L), (10L, 4L, 21L)))
    } finally out.stop()
  }

  test("evicting running totals: watermark passage closes and evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.TimedEvent]
    val q = EventStreams.runningTotalsEvicting(mem.toDS(),
        delay = "10 minutes", gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("evict_out")
      .outputMode("append").start()
    try {
      mem.addData(
        EventStreams.TimedEvent(1L, 10L, "click", 1.0, ts("2024-01-01 00:00:00")),
        EventStreams.TimedEvent(2L, 10L, "click", 2.0, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // advance the watermark way past user 10's timeout (00:05 + 30 min)
      mem.addData(
        EventStreams.TimedEvent(3L, 11L, "view", 5.0, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // one more empty-for-10 batch so the timed-out state is processed
      mem.addData(
        EventStreams.TimedEvent(4L, 11L, "view", 1.0, ts("2024-01-01 02:01:00")))
      q.processAllAvailable()
      val closed = spark.table("evict_out")
        .where("user_id = 10 AND closed").collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      assert(closed.toSeq == Seq((2L, 3.0)), "final closed row emitted on eviction")
      // state really is gone: a late event for user 10 starts FRESH totals
      mem.addData(
        EventStreams.TimedEvent(5L, 10L, "click", 7.0, ts("2024-01-01 02:02:00")))
      q.processAllAvailable()
      val reopened = spark.table("evict_out")
        .where("user_id = 10 AND NOT closed").collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
      assert(reopened.contains((1L, 7.0)), "post-eviction event starts fresh totals")
      assert(!reopened.contains((3L, 10.0)), "old totals must not resume")
    } finally q.stop()
  }

  test("keyed upsert sink: micro-batches merge keep-latest into the snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("id", "version", "payload")
    val q = StreamSinks.keyedUpsertSink(stream, "id", "version",
      s"$dir/table", s"$dir/ckpt")
    try {
      mem.addData((1L, 1L, "one-v1"), (2L, 1L, "two-v1"))
      q.processAllAvailable()
      // second batch: update id 1 (two versions in ONE batch — the batch
      // itself must dedup keep-latest), insert id 3
      mem.addData((1L, 2L, "one-v2"), (1L, 3L, "one-v3"), (3L, 1L, "three-v1"))
      q.processAllAvailable()
      val snap = spark.read.parquet(s"$dir/table/current")
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      assert(snap == Map(1L -> "one-v3", 2L -> "two-v1", 3L -> "three-v1"))
    } finally q.stop()
  }

  test("aggMvSink: streaming MV advance converges to the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("aggmv").toString
    val mem = MemoryStream[(String, Double)]
    val stream = mem.toDF().toDF("k", "v")
    val q = StreamSinks.aggMvSink(stream, Seq("k"), "v",
      s"$dir/mv", s"$dir/ckpt")
    try {
      mem.addData(("a", 10.0), ("a", 20.5), ("b", 7.0))
      q.processAllAvailable()
      mem.addData(("a", -3.25), ("b", 7.0), ("c", 100.0))
      q.processAllAvailable()
      val served = graft.operators.Materialize.serve(
        spark.read.parquet(s"$dir/mv/current"), Seq("k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
      val expect = graft.operators.Materialize.serve(
        graft.operators.Materialize.aggState(
          Seq(("a", 10.0), ("a", 20.5), ("b", 7.0),
            ("a", -3.25), ("b", 7.0), ("c", 100.0)).toDF("k", "v"),
          Seq("k"), "v"), Seq("k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
      assert(served == expect)
    } finally q.stop()
  }

  test("nearDupFilterSink: stream dedup against the advancing signature store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely unrelated corpus of database engine query planner words"
    val q = graft.streaming.StreamSinks.nearDupFilterSink(stream, "doc_id", "text",
      s"$dir/store", s"$dir/ckpt")
    try {
      mem.addData((1L, base), (2L, other))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1's text (hamming 0 -> dropped);
      // doc 4 is new material (kept)
      mem.addData((3L, base), (4L, s"$other with fresh additional vocabulary"))
      q.processAllAvailable()
      val store = spark.read.parquet(s"$dir/store/current")
        .collect().map(_.getLong(0)).toSet
      assert(store == Set(1L, 2L, 4L), s"store was $store")
      val kept1 = spark.read.parquet(s"$dir/store/kept_v1")
        .collect().map(_.getLong(0)).toSet
      assert(kept1 == Set(4L), s"batch-2 survivors were $kept1")
    } finally q.stop()
  }

  test("annIngestSink: streamed vector ingest == the same batches " +
      "upserted directly, for a per-row store AND a trained composed " +
      "store; re-applying a batch (crash replay) converges") {
    implicit val sqlCtx = spark.sqlContext
    import graft.similarity.{IvfSq8Store, SrpStore}
    import org.apache.spark.sql.functions.col
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16) { i =>
        val c = seed % 3
        (c - 1).toFloat + 0.08f * ((seed * 31 + i * 7) % 11) + 0.01f * i
      }
    val all = (0 until 40).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val base = all.filter(col("vec_id") < 32)
    val b1 = (32 until 36).map(i => (i.toLong, vec(i)))
    val b2 = (36 until 40).map(i => (i.toLong, vec(i)))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    // per-row store (SRP): streamed == batch-upserted, bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("annsink").toString
    SrpStore.buildAt(s"$dir/streamed", base)
    SrpStore.buildAt(s"$dir/batch", base)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamSinks.annIngestSink(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/streamed",
      s"$dir/ckpt", SrpStore.upsertBatch)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    for (b <- Seq(b1, b2))
      SrpStore.upsertBatch(spark, s"$dir/batch",
        b.toDF("vec_id", "embedding"))
    assert(rowsOf(SrpStore.read(spark, s"$dir/streamed")) ==
      rowsOf(SrpStore.read(spark, s"$dir/batch")),
      "streamed SRP store diverged from the batch-upserted twin")
    assert(rowsOf(SrpStore.topKOver(SrpStore.read(spark, s"$dir/streamed"),
        all, 2L, 5)) ==
      rowsOf(SrpStore.topKOver(SrpStore.read(spark, s"$dir/batch"),
        all, 2L, 5)),
      "streamed SRP store serves a different top-k")

    // crash replay: re-applying an already-applied batch through the
    // sink's upsert path must converge to the same live rows (the
    // tombstone-first kill is the anchor; the marker only short-circuits)
    val pre = rowsOf(SrpStore.read(spark, s"$dir/streamed"))
    SrpStore.upsertBatch(spark, s"$dir/streamed",
      b2.toDF("vec_id", "embedding"))
    assert(rowsOf(SrpStore.read(spark, s"$dir/streamed")) == pre,
      "replayed batch changed the streamed store's live rows")

    // trained composed store (IVF×SQ8): frozen centroids + per-row
    // encode — streamed upserts land identically to direct ones
    IvfSq8Store.buildAt(s"$dir/sq-streamed", base)
    IvfSq8Store.buildAt(s"$dir/sq-batch", base)
    val mem2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamSinks.annIngestSink(
      mem2.toDF().toDF("vec_id", "embedding"), s"$dir/sq-streamed",
      s"$dir/ckpt2", IvfSq8Store.upsertBatch)
    try {
      mem2.addData(b1: _*); q2.processAllAvailable()
      mem2.addData(b2: _*); q2.processAllAvailable()
    } finally q2.stop()
    for (b <- Seq(b1, b2))
      IvfSq8Store.upsertBatch(spark, s"$dir/sq-batch",
        b.toDF("vec_id", "embedding"))
    def codes(d: String) = rowsOf(spark.read.parquet(s"$d/codes.parquet")
      .select(col("vid"), col("cluster"),
        org.apache.spark.sql.functions.hex(col("code")), col("scale")))
    assert(codes(s"$dir/sq-streamed") == codes(s"$dir/sq-batch"),
      "streamed IVF×SQ8 codes diverged from the batch-upserted twin")
  }

  test("flatMapGroupsWithState running totals converge to the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("append").start()
    try {
      // two micro-batches: state must carry across them
      mem.addData(
        EventStreams.Event(1L, 10L, "click", 1.0),
        EventStreams.Event(2L, 10L, "click", 2.0),
        EventStreams.Event(3L, 11L, "view", 5.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(4L, 10L, "click", 4.0))
      q.processAllAvailable()
      // last emitted row per user == cumulative totals
      val finalRows = spark.table("running_out")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct("n_events", "total_value")).as("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(finalRows == Set((10L, 3L, 7.0), (11L, 1L, 5.0)))
    } finally q.stop()
  }

  test("anomaliesWindowed scores against the previous hour only") {
    // hour 0: 12 calm events (10/12 alternating); hour 1: calm + one spike.
    // The spike is flagged against hour 0's stats; hour 0 events are never
    // scored (no prior window), and the calm hour-1 events pass.
    def ev(id: Long, min: Int, hr: Int, v: Double) =
      (id, ts(f"2024-01-01 $hr%02d:$min%02d:00"), 1L, "m", v)
    val rows = (1 to 12).map(i => ev(i, i, 0, if (i % 2 == 0) 12.0 else 10.0)) ++
      Seq(ev(21, 5, 1, 11.0), ev(22, 10, 1, 99.0), ev(23, 15, 1, 10.0))
    val out = EventStreams.anomaliesWindowed(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
      minN = 10, zThreshold = 2.5, windowUnit = "hour")
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(out.map(_._1).toSeq == Seq(22L))
    assert(out.head._2 > 2.5)
  }

  test("decayedSum: lambda=0 equals the plain sum, decay discounts older events") {
    val plain = EventStreams.decayedSum(rows, lambdaPerDay = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(plain(10L) == 7.0 && plain(11L) == 13.0)
    val decayed = EventStreams.decayedSum(rows, lambdaPerDay = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // decayed strictly below the plain sum (all but the newest discounted)
    assert(decayed(10L) < 7.0 && decayed(10L) > 0.0)
    assert(decayed(11L) < 13.0 && decayed(11L) > 0.0)
  }

  test("cusum alarms on a sustained level shift, stays quiet on noise") {
    // user 1: 20 events at 10, then 20 at 30 (shift of +20, mean 20):
    // post-shift drift (30-20-5)=5/event -> s+ crosses h=20 and re-crosses
    // after each reset. user 2: constant 10 -> drift -(kappa) -> never alarms
    def series(user: Long, vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (user * 1000 + i, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), user, "m", v)
    }
    val ev = (series(1L, Seq.fill(20)(10.0) ++ Seq.fill(20)(30.0)) ++
      series(2L, Seq.fill(40)(10.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.cusum(ev, kappa = 5.0, h = 20.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._1 == 40L && out(1L)._2 >= 2L) // shift alarms repeatedly
    assert(out(2L) == ((40L, 0L)))                // flat series never alarms
  }

  test("anomalies flags only the spike, scored out-of-sample") {
    // 20 calm events (alternating 10/12) then one spike per user; a second
    // user stays calm throughout — no row of theirs may be flagged
    def series(user: Long, spike: Boolean) = (1 to 21).map { i =>
      val v = if (spike && i == 21) 99.0 else if (i % 2 == 0) 12.0 else 10.0
      (user * 100 + i, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), user, "m", v)
    }
    val ev = (series(1L, spike = true) ++ series(2L, spike = false))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.anomalies(ev, lookback = 20, minN = 10, zThreshold = 2.5)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(out.map(_._1).toSeq == Seq(121L))       // only user 1's spike
    assert(out.head._2 > 2.5)                      // z well above threshold
  }

  test("madOutliers: median threshold survives the poisoning that breaks stddev") {
    import spark.implicits._
    // 20 values near 10 plus FOUR enormous spikes: together the spikes
    // inflate a stddev gate enough to mask themselves (z ≈ 2.0 each,
    // under a 2.5 bar) but leave the median untouched, so MAD flags
    // exactly the spikes
    val ev = ((1L to 20L).map(i => (i, "a", 10.0 + (i % 3))) ++
      (96L to 99L).map(i => (i, "a", 9000.0 + i)))
      .toDF("event_id", "event_type", "value")
    val mad = EventStreams.madOutliers(ev, k = 3.0)
      .collect().map(_.getLong(0)).toSet
    assert(mad == Set(96L, 97L, 98L, 99L))
    // the z-score twin at the same data: global mean/stddev sees none
    val mean = ev.agg(org.apache.spark.sql.functions.avg("value")).head().getDouble(0)
    val std = ev.agg(org.apache.spark.sql.functions.stddev("value")).head().getDouble(0)
    assert(math.abs((9099.0 - mean) / std) < 2.5)
  }

  test("sessionPaths: trigrams never cross a session boundary and ride " +
    "one user ordering") {
    import spark.implicits._
    val ev = Seq(
      // user 1, session 1: a b c d → trigrams a>b>c, b>c>d
      (1L, 1L, ts("2024-01-01 08:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 08:05:00"), "b"),
      (3L, 1L, ts("2024-01-01 08:10:00"), "c"),
      (4L, 1L, ts("2024-01-01 08:15:00"), "d"),
      // 31-minute gap → new session: e f g → e>f>g only (no d>e>f, c>d>e)
      (5L, 1L, ts("2024-01-01 08:46:00"), "e"),
      (6L, 1L, ts("2024-01-01 08:50:00"), "f"),
      (7L, 1L, ts("2024-01-01 08:55:00"), "g"),
      // user 2 contributes a duplicate a>b>c
      (8L, 2L, ts("2024-01-02 10:00:00"), "a"),
      (9L, 2L, ts("2024-01-02 10:01:00"), "b"),
      (10L, 2L, ts("2024-01-02 10:02:00"), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventStreams.sessionPaths(ev, gapMinutes = 30, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 2L, "b>c>d" -> 1L, "e>f>g" -> 1L))
  }

  test("sessionPaths: an exactly-at-gap interval starts a new session") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 08:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 08:30:00"), "b"), // == gap → break (>= rule)
      (3L, 1L, ts("2024-01-01 08:31:00"), "c"),
      (4L, 1L, ts("2024-01-01 08:32:00"), "d")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventStreams.sessionPaths(ev, gapMinutes = 30, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("b>c>d" -> 1L))
  }

  test("gapFillDaily: LOCF fills interior gaps on the per-key daily grid") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 0.4), // two events same day → summed
      (1L, ts("2024-01-01 17:00:00"), 0.6),
      (1L, ts("2024-01-04 12:00:00"), 4.0), // days 2-3 are gaps
      (2L, ts("2024-02-10 00:00:00"), 7.0)  // single-day key: no fill rows
    ).toDF("user_id", "ts", "value")
    val out = EventStreams.gapFillDaily(ev, userMod = 1)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 1.0, false),
      (1L, "2024-01-02", 1.0, true),  // carried forward
      (1L, "2024-01-03", 1.0, true),
      (1L, "2024-01-04", 4.0, false),
      (2L, "2024-02-10", 7.0, false)))
  }

  test("stream-static enrichment: streaming join == batch join, unmatched kept") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.enrichWithDim(stream, dim, "user_id")
      .select(col("event_id"), col("user_id"), col("tier"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      val data = rows.collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq :+
        (7L, ts("2024-01-01 04:00:00"), 99L, "click", 1.0) // no dim row
      mem.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      val batchIn = data.toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = EventStreams.enrichWithDim(batchIn, dim, "user_id")
        .select(col("event_id"), col("user_id"), col("tier")).collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(streamed == batch)
      assert(streamed.exists(_._3.isEmpty), "unmatched fact must survive with null tier")
      assert(streamed.exists(_._3.contains("gold")))
    } finally q.stop()
  }

  test("funnelStages: strict order required, earliest-chain is exact") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes v→c→p in order
      (1L, 1L, ts("2024-01-01 08:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 08:10:00"), "click"),
      (3L, 1L, ts("2024-01-01 08:20:00"), "purchase"),
      // user 2: purchase BEFORE the click → stops at stage 2
      (4L, 2L, ts("2024-01-01 09:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 09:05:00"), "purchase"),
      (6L, 2L, ts("2024-01-01 09:10:00"), "click"),
      // user 3: click only, never viewed → not even stage 1
      (7L, 3L, ts("2024-01-01 10:00:00"), "click"),
      // user 4: greedy trap — early click pre-view, later full chain;
      // earliest-chain must still find view(10:00)<click(10:20)<purchase
      (8L, 4L, ts("2024-01-01 09:50:00"), "click"),
      (9L, 4L, ts("2024-01-01 10:00:00"), "view"),
      (10L, 4L, ts("2024-01-01 10:20:00"), "click"),
      (11L, 4L, ts("2024-01-01 10:30:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventStreams.funnelStages(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // stage 2: users 1, 2 (click 09:10 is after view 09:00) and 4;
    // stage 3: user 2's purchase predates its click → only 1 and 4
    assert(out(1L) == (("view", 3L, 1.0)))
    assert(out(2L) == (("click", 3L, 1.0)))
    assert(out(3L) == (("purchase", 2L, round6(2.0 / 3.0))))
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("attribution: first/last touch in lookback, unattributed kept") {
    import spark.implicits._
    val ev = Seq(
      // user 1: clicks 1, 2 inside the 2h window; click 3 too early
      (3L, 1L, ts("2024-01-01 05:00:00"), "click"),
      (1L, 1L, ts("2024-01-01 08:30:00"), "click"),
      (2L, 1L, ts("2024-01-01 09:00:00"), "click"),
      (4L, 1L, ts("2024-01-01 10:00:00"), "purchase"),
      // user 2: purchase with no click at all
      (5L, 2L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventStreams.attribution(ev, "click", "purchase", "2 hours")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out(4L) == ((2L, 1L, 2L))) // first=click 1, last=click 2
    assert(out(5L) == ((0L, -1L, -1L)))
  }

  test("splitLeakage: overlap users and leaked test events counted") {
    import spark.implicits._
    val cut = ts("2024-01-10 00:00:00")
    val ev = Seq(
      (1L, 1L, ts("2024-01-05 00:00:00"), 1.0), // user 1: train only
      (2L, 2L, ts("2024-01-06 00:00:00"), 1.0), // user 2: both sides
      (3L, 2L, ts("2024-01-11 00:00:00"), 1.0),
      (4L, 2L, ts("2024-01-12 00:00:00"), 1.0),
      (5L, 3L, ts("2024-01-13 00:00:00"), 1.0)  // user 3: test only
    ).toDF("event_id", "user_id", "ts", "value")
    val r = EventStreams.splitLeakage(ev,
      org.apache.spark.sql.functions.lit("2024-01-10").cast("timestamp"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((2L, 2L, 1L, 2L, 0.5)))
  }

  test("markovTransitions: per-user consecutive pairs, rows normalized") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a>b>a>c ; user 2: b>a — transitions: a→b, b→a(×2), a→c
      (1L, 1L, ts("2024-01-01 08:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 08:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 08:02:00"), "a"),
      (4L, 1L, ts("2024-01-01 08:03:00"), "c"),
      (5L, 2L, ts("2024-01-01 09:00:00"), "b"),
      (6L, 2L, ts("2024-01-01 09:05:00"), "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventStreams.markovTransitions(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      ("a", "b") -> (1L, 0.5), ("a", "c") -> (1L, 0.5),
      ("b", "a") -> (2L, 1.0)))
  }

  test("markovTransitions: no cross-user transition leaks") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 08:00:00"), "a"),
      (2L, 2L, ts("2024-01-01 08:01:00"), "b") // later but other user
    ).toDF("event_id", "user_id", "ts", "event_type")
    assert(EventStreams.markovTransitions(ev).count() == 0)
  }

  test("dowSeasonality: index is dow-mean over overall mean, arithmetic dow") {
    import spark.implicits._
    val ev = Seq(
      // 2024-01-01 is a Monday (dow 0), 2024-01-02 Tuesday (dow 1)
      (1L, ts("2024-01-01 08:00:00"), "a", 1.0),
      (2L, ts("2024-01-01 09:00:00"), "a", 3.0), // Monday mean 2.0
      (3L, ts("2024-01-02 08:00:00"), "a", 6.0)  // Tuesday mean 6.0
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventStreams.dowSeasonality(ev).collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // overall mean 10/3; index_mon = 2/(10/3) = 0.6, index_tue = 6/(10/3) = 1.8
    assert(out(0L) == ((2L, 2.0, 0.6)))
    assert(out(1L) == ((1L, 6.0, 1.8)))
  }

  test("acf: constant-lag sine-like series gives the hand-computed values") {
    import spark.implicits._
    // series by day: 1, 2, 3 → μ=2, den=2; lag1: (2-2)(1-2)+(3-2)(2-2)=0
    // lag2: (3-2)(1-2) = -1 → acf2 = -0.5
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "a", 1.0),
      (2L, ts("2024-01-02 08:00:00"), "a", 2.0),
      (3L, ts("2024-01-03 08:00:00"), "a", 3.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventStreams.acf(ev, maxLag = 2).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(1L -> 0.0, 2L -> -0.5))
  }

  test("holtForecast matches the local recursion; <2-day types dropped") {
    import spark.implicits._
    // daily series 1, 2, 4, 7 (one event per day → mean = value);
    // α=0.3 β=0.2: l₁=1 b₁=1, then (2.0,1.0) (3.3,1.06) (5.152,1.2184)
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "a", 1.0),
      (2L, ts("2024-01-02 08:00:00"), "a", 2.0),
      (3L, ts("2024-01-03 08:00:00"), "a", 4.0),
      (4L, ts("2024-01-04 08:00:00"), "a", 7.0),
      (5L, ts("2024-01-01 08:00:00"), "b", 9.0) // 1 day — no trend definable
    ).toDF("event_id", "ts", "event_type", "value")
    val rows = EventStreams.holtForecast(ev, alpha = 0.3, beta = 0.2,
      horizon = 7).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a"))
    val r = rows.head
    // local reference: identical recursion in plain Scala, rounded 6
    var (l, b) = (1.0, 2.0 - 1.0)
    for (x <- Seq(2.0, 4.0, 7.0)) {
      val ln = 0.3 * x + 0.7 * (l + b)
      b = 0.2 * (ln - l) + 0.8 * b
      l = ln
    }
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == r6(l) && r.getDouble(3) == r6(b))
    assert(r.getDouble(4) == r6(l + 7.0 * b))
  }

  test("kaplanMeier: hand risk sets, censoring excluded from deaths") {
    import spark.implicits._
    // corpus max = 01-10, censorDays=1 → censored iff last day = 01-10.
    // lifetimes: u1,u2 t=2 (deaths), u3 t=4 (death), u4 t=9 (censored),
    // u5 t=5 (censored). Risk sets 5,3,2,1; S = 0.6, 0.4, 0.4, 0.4.
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L), (2L, ts("2024-01-03 08:00:00"), 1L),
      (3L, ts("2024-01-01 08:00:00"), 2L), (4L, ts("2024-01-03 08:00:00"), 2L),
      (5L, ts("2024-01-02 08:00:00"), 3L), (6L, ts("2024-01-06 08:00:00"), 3L),
      (7L, ts("2024-01-01 08:00:00"), 4L), (8L, ts("2024-01-10 08:00:00"), 4L),
      (9L, ts("2024-01-05 08:00:00"), 5L), (10L, ts("2024-01-10 08:00:00"), 5L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventStreams.kaplanMeier(ev, censorDays = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out(2L) == ((5L, 2L, 0L, 0.6)))
    assert(out(4L) == ((3L, 1L, 0L, 0.4)))
    assert(out(5L) == ((2L, 0L, 1L, 0.4)))
    assert(out(9L) == ((1L, 0L, 1L, 0.4)))
  }

  test("cupedLift: hand theta from pooled moments, algebraic adjusted means") {
    import spark.implicits._
    // pre day = day 1 (preDays=1); X = 1,2,3,4; Y = 2X + arm.
    // Pooled: Sx=10 Sy=22 Sxy=66 Sxx=30 → θ = 11/5 = 2.2, X̄ = 2.5.
    // arm0 (u0,u2): x̄=2 ȳ=4 → adj 5.1; arm1 (u1,u3): x̄=3 ȳ=7 → adj 5.9.
    val rows = for {
      (u, x, y) <- Seq((0L, 1.0, 2.0), (1L, 2.0, 5.0), (2L, 3.0, 6.0),
        (3L, 4.0, 9.0))
      (d, v) <- Seq(("2024-01-01 08:00:00", x), ("2024-01-05 08:00:00", y))
    } yield (u * 10 + v.toLong, ts(d), u, "purchase", v)
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.cupedLift(ev, preDays = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0L) == ((2L, 2.0, 4.0, 2.2, r6(4.0 - 2.2 * (2.0 - 2.5)))))
    assert(out(1L) == ((2L, 3.0, 7.0, 2.2, r6(7.0 - 2.2 * (3.0 - 2.5)))))
  }

  test("abHealth: balanced split passes SRM, hand MDE; 7:1 split flags") {
    import spark.implicits._
    def ev(users: Seq[(Long, Double)]) = users.zipWithIndex.map {
      case ((u, v), i) => (i.toLong, ts("2024-01-01 08:00:00"), u, v)
    }.toDF("event_id", "ts", "user_id", "value")
    // balanced: per-user y = 2,4,6,8 → mean 5, chi2 = 0. WITHIN-ARM
    // pooled variance (not grand): arm0 {2,6} SS = 40 − 64/2 = 8,
    // arm1 {4,8} SS = 80 − 144/2 = 8 → s² = 16/(4−2) = 8 — the arm
    // mean gap (4 vs 6) stays OUT of s², so MDE isn't inflated by a
    // real effect (ADVICE r10).
    val r = EventStreams.abHealth(
      ev(Seq((0L, 2.0), (1L, 4.0), (2L, 6.0), (3L, 8.0)))).head()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.0 && !r.getBoolean(3))
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 8.0)
    val mde = (1.96 + 0.84) * math.sqrt(8.0 * (0.5 + 0.5))
    assert(r.getDouble(6) == r6(mde) && r.getDouble(7) == r6(mde / 5.0))
    // 7 control vs 1 treatment: chi2 = 2·(3²/4) = 4.5 > 3.841 → SRM
    val bad = EventStreams.abHealth(
      ev((0L to 12L by 2).map(u => (u, 1.0)) :+ (1L, 1.0))).head()
    assert((bad.getLong(0), bad.getLong(1)) == ((7L, 1L)))
    assert(bad.getDouble(2) == 4.5 && bad.getBoolean(3))
  }

  test("abHealth degenerate: one user per arm / an empty arm emit NULL " +
      "variance+MDE, never NaN (ADVICE r11)") {
    import spark.implicits._
    def ev(users: Seq[(Long, Double)]) = users.zipWithIndex.map {
      case ((u, v), i) => (i.toLong, ts("2024-01-01 08:00:00"), u, v)
    }.toDF("event_id", "ts", "user_id", "value")
    // n=2, one per arm: the n−2 pooled denominator is 0/0 without the guard
    val tiny = EventStreams.abHealth(ev(Seq((0L, 2.0), (1L, 4.0)))).head()
    assert((tiny.getLong(0), tiny.getLong(1)) == ((1L, 1L)))
    assert(tiny.isNullAt(5) && tiny.isNullAt(6) && tiny.isNullAt(7),
      s"expected NULL var/mde, got $tiny")
    // empty treatment arm (all even user ids): moments for arm 1 are NULL
    val oneArm = EventStreams.abHealth(
      ev(Seq((0L, 2.0), (2L, 4.0), (4L, 6.0)))).head()
    assert((oneArm.getLong(0), oneArm.getLong(1)) == ((3L, 0L)))
    assert(oneArm.isNullAt(5) && oneArm.isNullAt(6) && oneArm.isNullAt(7))
  }

  test("holtBacktest: out-of-sample 1-step errors from prefix states") {
    import spark.implicits._
    // series 1, 2, 4, 7 (the holtForecast fixture): states t2 (2.0, 1.0),
    // t3 (3.3, 1.06); errors t=3: |4−3| = 1, t=4: |7−4.36| = 2.64
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "a", 1.0),
      (2L, ts("2024-01-02 08:00:00"), "a", 2.0),
      (3L, ts("2024-01-03 08:00:00"), "a", 4.0),
      (4L, ts("2024-01-04 08:00:00"), "a", 7.0),
      (5L, ts("2024-01-01 08:00:00"), "b", 9.0),
      (6L, ts("2024-01-02 08:00:00"), "b", 8.0) // n=2: no origin, dropped
    ).toDF("event_id", "ts", "event_type", "value")
    val rows = EventStreams.holtBacktest(ev, alpha = 0.3, beta = 0.2).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a"))
    val r = rows.head
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // local reference: run the identical recursion for the prefix states
    def state(upTo: Int): (Double, Double) = {
      var (l, b) = (1.0, 2.0 - 1.0)
      for (x <- Seq(2.0, 4.0, 7.0).take(upTo - 1)) {
        val ln = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (ln - l) + 0.8 * b
        l = ln
      }
      (l, b)
    }
    val (l2, b2) = state(2)
    val (l3, b3) = state(3)
    val e3 = math.abs(4.0 - (l2 + b2))
    val e4 = math.abs(7.0 - (l3 + b3))
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == r6((0.0 + e3 + e4) / 2.0))
    assert(r.getDouble(3) == r6(math.sqrt((0.0 + e3 * e3 + e4 * e4) / 2.0)))
  }

  test("didEstimate: hand 2x2 cells and the parallel-trends difference") {
    import spark.implicits._
    // cut = day 2. ctrl(u0): pre 1,3 → 2; post 2,4 → 3 (Δ 1).
    // treat(u1): pre 2 → 2; post 5,7 → 6 (Δ 4). DiD = 3.
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 0L, 1.0),
      (2L, ts("2024-01-01 09:00:00"), 0L, 3.0),
      (3L, ts("2024-01-03 08:00:00"), 0L, 2.0),
      (4L, ts("2024-01-04 08:00:00"), 0L, 4.0),
      (5L, ts("2024-01-01 08:00:00"), 1L, 2.0),
      (6L, ts("2024-01-03 08:00:00"), 1L, 5.0),
      (7L, ts("2024-01-04 08:00:00"), 1L, 7.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val r = EventStreams.didEstimate(ev, preDays = 1).head()
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      == ((2.0, 3.0, 2.0, 6.0)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) == ((1.0, 4.0, 3.0)))
  }

  test("mannKendall: hand-computed S, tie-corrected variance, explicit median") {
    import spark.implicits._
    // series "a" by day: 1, 3, 2, 4 (no ties) — pairs (i<j):
    //   signs: +,+,+ (from 1), -,+ (from 3), + (from 2) → S = 4
    //   var = 4·3·13/18 = 26/3; z = 3/√(26/3)
    //   slopes: (3-1)/1=2, (2-1)/2=0.5, (4-1)/3=1, (2-3)/1=-1,
    //           (4-3)/2=0.5, (4-2)/1=2 → sorted [-1,.5,.5,1,2,2],
    //   even m=6 → median (0.5+1)/2 = 0.75
    // series "b": 5, 5, 7 — tie pair (t=2) → tie term 2·1·9=18;
    //   S = 2; var = (3·2·11 − 18)/18 = 48/18; day gaps 1,2,1
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "a", 1.0),
      (2L, ts("2024-01-02 08:00:00"), "a", 3.0),
      (3L, ts("2024-01-03 08:00:00"), "a", 2.0),
      (4L, ts("2024-01-04 08:00:00"), "a", 4.0),
      (5L, ts("2024-01-01 08:00:00"), "b", 5.0),
      (6L, ts("2024-01-02 08:00:00"), "b", 5.0),
      (7L, ts("2024-01-03 08:00:00"), "b", 7.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventStreams.mannKendall(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val (na, sa, va, za, sla, ta) = out("a")
    assert((na, sa) == ((4L, 4L)) && va == 26.0 / 3.0)
    assert(za == r6(3.0 / math.sqrt(26.0 / 3.0)) && sla == 0.75)
    assert(ta == "no_trend")
    val (nb, sb, vb, zb, slb, _) = out("b")
    assert((nb, sb) == ((3L, 2L)) && vb == 48.0 / 18.0)
    assert(zb == r6(1.0 / math.sqrt(48.0 / 18.0)))
    // b slopes: (5-5)/1=0, (7-5)/2=1, (7-5)/1=2 → median 1.0
    assert(slb == 1.0)
  }
}
