package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 10, 100.0), (1L, "b", 20, 50.0), (2L, "c", 5, 75.0),
    (2L, "d", 5, 80.0), (3L, "e", 1, 10.0)
  ).toDF("key", "tag", "ver", "amount")

  test("dedupKeepFirst keeps exactly one deterministic row per key") {
    val out = Relational.dedupKeepFirst(df,
      key = Seq(col("key")),
      order = Seq(col("ver").desc, col("tag").asc))
    val kept = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(1L -> "b", 2L -> "c", 3L -> "e"))
  }

  test("dedupKeepFirstRuns == dedupKeepFirst on the composite key, one exchange") {
    // duplicate (key, ver) runs with distinct tags; order tag desc picks
    // the same winner both ways
    val dups = Seq(
      (1L, "a", 10), (1L, "z", 10), (1L, "b", 20),
      (2L, "c", 5), (2L, "d", 5), (3L, "e", 1)
    ).toDF("key", "tag", "ver")
    val viaRuns = Relational.dedupKeepFirstRuns(dups,
      parentKey = Seq(col("key")), runKey = col("ver"),
      order = Seq(col("tag").desc))
    val viaComposite = Relational.dedupKeepFirst(dups,
      key = Seq(col("key"), col("ver")),
      order = Seq(col("tag").desc))
    // read the plan BEFORE collect: an executed AQE plan prints the
    // initial plan alongside the final one, double-counting the exchange
    val n = "Exchange hashpartitioning".r
      .findAllIn(viaRuns.queryExecution.executedPlan.toString).size
    assert(n == 1, s"expected one parent-key exchange, saw $n")
    assert(viaRuns.collect().toSet == viaComposite.collect().toSet)
  }

  test("semi and anti join partition the left side") {
    val keys = Seq(1L, 3L).toDF("key")
    val semi = Relational.semiJoin(df, keys, Seq("key")).count()
    val anti = Relational.antiJoin(df, keys, Seq("key")).count()
    assert(semi == 3 && anti == 2 && semi + anti == df.count())
  }

  test("snapshotDiff emits I/U/D changelog, skips unchanged, null-safe") {
    val before = Seq((1L, Some(10.0)), (2L, Some(5.0)), (3L, None: Option[Double]),
      (4L, Some(7.0))).toDF("key", "v")
    val after = Seq((1L, Some(10.0)), (2L, Some(6.0)), (3L, Some(1.0)),
      (5L, Some(9.0))).toDF("key", "v")
    val out = Relational.snapshotDiff(before, after, Seq("key"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (absent), 2 updated, 3 null→1.0 is a change, 4 deleted,
    // 5 inserted
    assert(out == Map(2L -> "U", 3L -> "U", 4L -> "D", 5L -> "I"))
  }

  test("page returns the ordered slice") {
    val page = Relational.page(df, Seq(col("amount").desc), skip = 1, limit = 2)
      .collect().map(_.getDouble(3)).toSeq
    assert(page == Seq(80.0, 75.0))
  }

  test("purgeAudit: per-table delete counts with FK cascade via derived keys") {
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("uid", "name")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("oid", "uid")
    val items = Seq((10L, "x"), (10L, "y"), (12L, "z")).toDF("oid", "sku")
    val forget = Seq(1L).toDF("uid")
    val cascade = orders.join(forget, Seq("uid"), "left_semi").select("oid")
    val out = Relational.purgeAudit(Seq(
      ("users", users, forget, Seq("uid")),
      ("orders", orders, forget, Seq("uid")),
      ("items", items, cascade, Seq("oid"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("users" -> 1L, "orders" -> 2L, "items" -> 2L))
  }

  test("weightedSample: deterministic, monotone in weight, exact at the ends") {
    val rows = (1L to 2000L).map(i => (i, i % 100)).toDF("id", "w")
    def kept(num: org.apache.spark.sql.Column, den: Long) =
      Relational.weightedSample(rows, "id", num, den).collect().map(_.getLong(0)).toSet
    val all = kept(lit(100L), 100L)
    val none = kept(lit(0L), 100L)
    assert(all.size == 2000 && none.isEmpty)
    // repartitioning cannot change the draw
    val half = kept(lit(50L), 100L)
    val halfRepart = Relational.weightedSample(rows.repartition(7), "id", lit(50L), 100L)
      .collect().map(_.getLong(0)).toSet
    assert(half == halfRepart)
    // survival rate tracks the weight (50% ± a few points at n=2000)
    assert(math.abs(half.size / 2000.0 - 0.5) < 0.05)
    // per-row weights: heavier rows survive more often
    val weighted = Relational.weightedSample(rows, "id", col("w"), 100L)
      .collect().map(r => r.getLong(1)).toSeq
    assert(weighted.count(_ >= 50) > weighted.count(_ < 50))
  }

  test("scd2: collapses same-value runs, closes intervals, flags current") {
    val hist = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"),  // run collapses
      (1L, 30L, "gold"), (1L, 40L, "bronze"),    // value may recur later
      (2L, 5L, "silver")
    ).toDF("user_id", "ts", "tier")
    val out = Relational.scd2(hist, "user_id", "ts", "tier")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4)))
    val byUser = out.groupBy(_._1)
    assert(byUser(1L).sortBy(_._3).toSeq == Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "gold", 30L, Some(40L), false),
      (1L, "bronze", 40L, None, true)))
    assert(byUser(2L).toSeq == Seq((2L, "silver", 5L, None, true)))
    // null-run collapse: null→null is not a change
    val nulls = Seq((3L, 1L, null.asInstanceOf[String]),
      (3L, 2L, null.asInstanceOf[String]), (3L, 3L, "x"))
      .toDF("user_id", "ts", "tier")
    assert(Relational.scd2(nulls, "user_id", "ts", "tier").count() == 2)
  }

  test("keysetPage continues exactly where the previous page ended") {
    val rows = (1L to 50L).map(i => (i, s"r$i")).toDF("id", "v")
    val p1 = Relational.keysetPage(rows, col("id"), lit(0L), limit = 20)
      .collect().map(_.getLong(0)).toSeq
    val cursor = p1.last
    val p2 = Relational.keysetPage(rows, col("id"), lit(cursor), limit = 20)
      .collect().map(_.getLong(0)).toSeq
    assert(p1 == (1L to 20L) && p2 == (21L to 40L))
    // the scale contract: a plain pushable filter, never an OFFSET (the
    // optimized plan folds the filter into a LocalRelation for in-memory
    // data — PlanHealthSpec asserts PushedFilters on the parquet-backed
    // q_keyset_page; here we assert the shape pre-folding)
    val plan = Relational.keysetPage(rows, col("id"), lit(cursor), limit = 20)
      .queryExecution.analyzed.toString
    assert(plan.contains("Filter") && !plan.toLowerCase.contains("offset"))
  }

  test("rangeJoinBucketed: inclusive start, exclusive end, cross-bucket intervals") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), "on_start"),
      (1L, ts("2024-01-01 10:59:59"), "inside"),
      (1L, ts("2024-01-01 11:00:00"), "on_end"),
      (1L, ts("2024-01-01 10:30:00"), "inside2"),
      (2L, ts("2024-01-01 10:30:00"), "other_key")
    ).toDF("key", "t", "tag")
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "iv1")
    ).toDF("key", "s", "e", "iv")
    // bucket smaller than the interval → interval spans several buckets
    val out = Relational.rangeJoinBucketed(points, intervals, "key",
      ts = "t", start = "s", end = "e", bucketSeconds = 900)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(out == Set("on_start", "inside", "inside2"))
  }

  test("asofJoin forward picks the earliest right row at or after each left time") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 3L, 102L))
      .toDF("key", "t", "quote")
    val out = Relational.asofJoin(trades, quotes, "key", "t",
      leftCols = Seq("trade"), rightPayload = "quote", forward = true)
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    // t1 at 10 matches the equal-time quote (>=); t2 at 20 has nothing
    // after it; t3 at 5 sees no quote at or after
    assert(out == Map("t1" -> Some(100L), "t2" -> None, "t3" -> None))
  }

  test("asofJoin picks the latest right row at or before each left time") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 8L, 100L), (1L, 10L, 101L), (1L, 15L, 102L), (2L, 9L, 103L))
      .toDF("key", "t", "quote")
    val out = Relational.asofJoin(trades, quotes, "key", "t",
      leftCols = Seq("trade"), rightPayload = "quote")
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Long]("quote")).map(_.toLong)).toMap
    assert(out == Map(
      "t1" -> Some(101L), // equal-time quote matches (<= semantics)
      "t2" -> Some(102L), // latest preceding
      "t3" -> None))      // quote is after the trade
  }

  test("asofJoin: null keys never match (SQL join semantics)") {
    val trades = Seq((Option(1L), 10L, "a"), (Option.empty[Long], 10L, "b"))
      .toDF("key", "t", "trade")
    val quotes = Seq((Option(1L), 8L, 100L), (Option.empty[Long], 5L, 999L))
      .toDF("key", "t", "quote")
    val out = Relational.asofJoin(trades, quotes, "key", "t",
      leftCols = Seq("trade"), rightPayload = "quote")
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Long]("quote"))).toMap
    assert(out("a").contains(100L))
    assert(out("b").isEmpty, "null-key left row must not match the null-key quote")
  }

  test("saltedAgg equals direct groupBy for algebraic aggregates") {
    val direct = df.groupBy(col("key"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("ver")).cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Relational.saltedAgg(df, col("key"), saltBuckets = 4,
      partials = Seq(count(lit(1)).as("pc"), sum(col("ver")).as("ps")),
      merge = Seq(sum(col("pc")).cast("long").as("n"), sum(col("ps")).cast("long").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals the plain equi-join for any salt count") {
    val fact = df // (key, ver, ...) rows
    val dim = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("key", "label")
    val plain = fact.join(dim, "key")
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 4, 7).foreach { s =>
      val salted = Relational.saltedJoin(fact, dim, "key", saltBuckets = s)
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(salted == plain, s"saltBuckets=$s")
    }
  }

  test("topKPerGroup ranks within each group") {
    val top1 = Relational.topKPerGroup(df,
      key = Seq(col("key")), order = Seq(col("amount").desc, col("tag").asc), k = 1)
    assert(top1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "d", 3L -> "e"))
  }

  test("hashSplit is deterministic, partition-independent, and ~respects fractions") {
    val ids = (0L until 1000L).toDF("id")
    val a = Relational.hashSplit(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Relational.hashSplit(ids.repartition(7), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must not depend on partitioning")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 850 && counts("train") < 950)
    assert(counts.getOrElse("val", 0) + counts.getOrElse("test", 0) == 1000 - counts("train"))
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("cdcApply: latest change wins, deletes tombstone, snapshot survives untouched keys") {
    val snapshot = Seq((1L, 1, 10.0), (2L, 1, 20.0), (3L, 1, 30.0), (5L, 5, 50.0))
      .toDF("key", "seq", "value")
    val changes = Seq(
      (1L, 2, 11.0, "U"),  // upsert over snapshot
      (2L, 2, 0.0, "D"),   // tombstone
      (4L, 2, 40.0, "U"),  // brand-new key, two versions
      (4L, 3, 41.0, "U"),
      (5L, 3, 49.0, "U")   // LATE change, older than the snapshot row
    ).toDF("key", "seq", "value", "op")
    val out = Relational.cdcApply(snapshot, changes, Seq("key"),
        order = Seq(col("seq").desc))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getString(3)))
      .toMap
    assert(out == Map(
      1L -> ((2, 11.0, "U")),  // change beat snapshot
      3L -> ((1, 30.0, "S")),  // untouched, provenance preserved
      4L -> ((3, 41.0, "U")),  // latest of the two change versions
      5L -> ((5, 50.0, "S"))   // snapshot beat the stale change
    ))                          // key 2: tombstoned away
  }

  test("reservoirSample keeps exactly k per group, all when smaller") {
    val docs = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "grp")
    val out = Relational.reservoirSample(docs, "id", "grp", k = 10)
      .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(out("big") == 10 && out("small") == 10)
    val tiny = Relational.reservoirSample(docs.filter($"id" > 95), "id", "grp", k = 10)
    assert(tiny.count() == 5) // group smaller than k passes whole
  }

  test("reservoirSample is deterministic and repartition-invariant") {
    val docs = (1L to 200L).map(i => (i, (i % 3).toString)).toDF("id", "grp")
    val a = Relational.reservoirSample(docs, "id", "grp", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Relational.reservoirSample(docs.repartition(13, $"id"), "id", "grp", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b && a.size == 21)
  }

  test("reservoirSample is stable under incremental growth") {
    // adding rows can only displace hash-later rows within a group: the
    // kept set of the grown corpus restricted to old ids is a subset of
    // the original kept set
    val old = (1L to 50L).map(i => (i, "g")).toDF("id", "grp")
    val grown = (1L to 80L).map(i => (i, "g")).toDF("id", "grp")
    val keptOld = Relational.reservoirSample(old, "id", "grp", 10)
      .collect().map(_.getLong(0)).toSet
    val keptGrown = Relational.reservoirSample(grown, "id", "grp", 10)
      .collect().map(_.getLong(0)).toSet
    assert(keptGrown.filter(_ <= 50L).subsetOf(keptOld))
  }

  test("cdcNetEffect: each run collapses to its end effect") {
    import spark.implicits._
    val changes = Seq(
      (1L, "01", "I", 1.0), (1L, "02", "U", 2.0), // I+U → one I, last value
      (2L, "01", "U", 3.0), (2L, "02", "D", 0.0), // existing + D → one D
      (3L, "01", "I", 4.0), (3L, "02", "D", 0.0), // created+destroyed → none
      (4L, "01", "U", 5.0), (4L, "02", "U", 6.0), // U run → one U
      (5L, "01", "D", 0.0), (5L, "02", "I", 7.0), // delete then re-insert → U
      (6L, "01", "I", 8.0)                        // single I passes through
    ).toDF("key", "ver", "op", "value")
    val out = Relational.cdcNetEffect(changes, "key", "ver", "op", "value")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getString(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L, 6L))
    assert(out(1L) == (("I", 2.0, "02")))
    assert(out(2L)._1 == "D" && out(2L)._2.isNaN)
    assert(out(4L) == (("U", 6.0, "02")))
    assert(out(5L) == (("U", 7.0, "02"))) // existed before → net is U
    assert(out(6L) == (("I", 8.0, "01")))
  }
}
