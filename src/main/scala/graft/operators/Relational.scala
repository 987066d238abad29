package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Reusable relational operators re-expressing the reference's hand-rolled
  * idioms as declarative, Catalyst-optimizable Spark plans.
  *
  * The reference (KrishnaKabi04/Job-search-engine-using-Pyspark-Solar-and-Angular)
  * implements these as driver-side loops / collected id lists / HashMap
  * upserts; here each is a single distributed plan that survives a 1000×
  * scale-up:
  *
  *  - id-list semi/anti filters (`Spark/Tweets_preprocessing.py:112-115,234`)
  *    → real `left_semi` / `left_anti` joins (broadcast when small, shuffled
  *    hash otherwise — Catalyst + AQE decide).
  *  - keep-latest dedup (`Spark/Tweets_preprocessing.py:156-157`,
  *    `Ranking Model/src/main/java/Main/SolrIndexer.java:25-45`)
  *    → windowed `row_number`, deterministic under any partitioning (the
  *    reference's `sort().drop_duplicates()` is order-dependent and not
  *    guaranteed by Spark semantics).
  *  - server-side pagination the reference UI requests but its server drops
  *    (`Web UI/.../search-engine.component.ts:38` vs `api/Handler.java:34`).
  */
object Relational {

  /** Keep rows whose key appears in `keys` — the reference's
    * `df.filter(df.id.isin(collected_list))` without the driver round-trip.
    * At scale the collected list becomes a broadcast/shuffled semi join.
    */
  def semiJoin(df: DataFrame, keys: DataFrame, cols: Seq[String]): DataFrame =
    df.join(keys, cols, "left_semi")

  /** Drop rows whose key appears in `keys` — the reference's `~isin`
    * sensitive/duplicate exclusion (`Tweets_preprocessing.py:115,147,227`).
    */
  def antiJoin(df: DataFrame, keys: DataFrame, cols: Seq[String]): DataFrame =
    df.join(keys, cols, "left_anti")

  /** Keep exactly one row per key: the one ranked first by `order`.
    * Deterministic as long as `order` is a total order within a key —
    * callers should include a unique tiebreaker column.
    *
    * Scale note: one shuffle on `key`; with AQE skewed keys split
    * automatically. Equivalent `max_by(struct(*), orderExpr)` avoids
    * materializing ranks but `row_number` keeps arbitrary column sets.
    */
  def dedupKeepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[dedupKeepFirst]] on the composite key (parentKey ++ runKey), planned
    * on the PARENT partitioning alone: one window partitioned by
    * `parentKey` ordered by (runKey, order…) keeps the first row of each
    * runKey run — lag-based run detection instead of a per-composite-key
    * row_number. Same answer, but when the next operator windows on
    * `parentKey` (SCD2 collapse, as-of, LOCF) it REUSES this exchange; the
    * composite-key formulation partitions on (parent, run) and forces a
    * second shuffle back to the parent key. Use when a parent-keyed
    * operator consumes the deduped rows; plain [[dedupKeepFirst]]
    * otherwise (it spreads composite keys over more reducers).
    */
  def dedupKeepFirstRuns(df: DataFrame, parentKey: Seq[Column], runKey: Column,
                         order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(parentKey: _*).orderBy(runKey.asc +: order: _*)
    df.withColumn("__prev_rk", lag(runKey, 1).over(w))
      .filter(!(runKey <=> col("__prev_rk")))
      .drop("__prev_rk")
  }

  /** MERGE-style CDC apply: fold a change stream into a snapshot with
    * last-writer-wins semantics per key — the lakehouse upsert/delete
    * maintenance pass (`MERGE INTO` / Debezium-feed apply) expressed as one
    * keyed reduction instead of a join-per-change-batch.
    *
    * `snapshot` rows are tagged `op = 'S'`; `changes` must already carry
    * `opCol` (`deleteOp` rows tombstone the key, anything else upserts).
    * Both sides must share the remaining schema. The winner per key is
    * picked by `order` (latest-first; include a unique tiebreaker), then
    * tombstones are dropped. A key whose latest row is a delete therefore
    * vanishes; a key untouched by `changes` survives with its snapshot row
    * (still tagged `'S'`, which audits provenance for free).
    *
    * Scale: one shuffle on `key` — the same cost as reading the snapshot
    * through any compaction pass. With the snapshot stored bucketed by the
    * key ([[graft.sources.Sinks.bucketedTable]]) and changes re-bucketed on
    * ingest, the window runs shuffle-free per bucket. This is exactly how
    * the keyed index sink ([[graft.search.Collections]]) applies upserts;
    * here it is exposed as the general snapshot+changelog operator with
    * delete semantics.
    */
  def cdcApply(snapshot: DataFrame, changes: DataFrame, key: Seq[String],
               order: Seq[Column], opCol: String = "op",
               deleteOp: String = "D"): DataFrame = {
    val tagged = snapshot.withColumn(opCol, lit("S"))
    val merged = tagged.unionByName(changes.select(tagged.columns.toSeq.map(col): _*))
    dedupKeepFirst(merged, key.map(col), order)
      .filter(col(opCol) =!= deleteOp)
  }

  /** Changelog net-effect compaction (Debezium/Flink "changelog
    * normalization"): collapse each key's change run to the single
    * change with the same end effect, so a downstream [[cdcApply]] (or
    * a sink replay) processes one row per touched key instead of the
    * whole history. Contract: ops I/U/D ordered by `ts` (unique per
    * key); the base snapshot contains the key iff the key's FIRST op is
    * U or D. Net rules — first op F, last op L (value from the last
    * row):
    *   L = D:      F = I → no row (created and destroyed inside the
    *               batch); else → one D.
    *   L ∈ {I,U}:  F = I → one I (didn't exist before); else → one U.
    * One key-partitioned window computes first/last in a single
    * exchange; the emitted op is derived, never trusted from the rows.
    */
  def cdcNetEffect(changes: DataFrame, key: String, ts: String,
                   opCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAsc = Window.partitionBy(col(key)).orderBy(col(ts).asc)
    changes
      .withColumn("__first_op", first(col(opCol)).over(w))
      .withColumn("__last_op", last(col(opCol)).over(w))
      .withColumn("__last_val", last(col(valueCol)).over(w))
      .withColumn("__last_ts", last(col(ts)).over(w))
      .withColumn("__rn", row_number().over(wAsc))
      .filter(col("__rn") === 1) // one emitted row per key
      .filter(!(col("__first_op") === "I" && col("__last_op") === "D"))
      .select(col(key),
        when(col("__last_op") === "D", "D")
          .when(col("__first_op") === "I", "I")
          .otherwise("U").as(opCol),
        when(col("__last_op") === "D", lit(null).cast(
          changes.schema(valueCol).dataType)).otherwise(col("__last_val"))
          .as(valueCol),
        col("__last_ts").as(ts))
  }

  /** Top-k per group (reference: Solr `rows=N` per query shape,
    * `SolrRanker.java:77,104,145`). `order` must totally order rows within a
    * group for deterministic results.
    */
  def topKPerGroup(df: DataFrame, key: Seq[Column], order: Seq[Column], k: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Global ordered page — `TakeOrderedAndProject` in the physical plan, no
    * full sort materialization. The order must be total for determinism.
    */
  def page(df: DataFrame, order: Seq[Column], skip: Int, limit: Int): DataFrame =
    df.orderBy(order: _*).offset(skip).limit(limit)

  /** Keyset (cursor) page: the rows strictly after `after` in `key` order.
    * The scalable form of deep pagination — [[page]]'s OFFSET makes every
    * executor's TakeOrdered heap carry `skip + limit` rows and the driver
    * discard `skip` of them, so page 10,000 of a 100 TB result costs
    * O(skip). Here the cursor is a plain comparison predicate, so it is
    * pushed into the scan (`PushedFilters: [GreaterThan(key, after)]` —
    * min/max row-group stats skip everything before the cursor) and each
    * page costs O(limit) regardless of depth. `key` must be unique (or the
    * caller composes a struct-ordered compound cursor) or rows sharing the
    * boundary value are skipped.
    */
  def keysetPage(df: DataFrame, key: Column, after: Column, limit: Int): DataFrame =
    df.filter(key > after).orderBy(key.asc).limit(limit)

  /** As-of join: for each left row, the single latest right row with
    * rightTime <= leftTime within the same key — the time-series join Spark
    * lacks natively (SURVEY.md §2.3 notes its absence in both Spark's and
    * the reference's surface). `forward = true` flips the direction: the
    * single EARLIEST right row with rightTime >= leftTime (the
    * "next-event" lookup, e.g. purchase → next support contact).
    *
    * Composed Spark-first (preference (a) of the custom-operator ladder)
    * via union + windowed last-value: tag both sides, sort each key by
    * (time, side, tiebreak) with right rows before left rows on equal
    * times (<= semantics), and carry the last seen right payload forward.
    * ONE shuffle on the key, no range self-join blowup, and — unlike a
    * windowed equi-join — no time bucketing to tune. Right rows must be
    * unique per (key, time) for determinism; pre-dedup with
    * [[dedupKeepFirst]] otherwise.
    *
    * Output: leftCols + rightPayload (null when no right row precedes).
    * Null keys follow SQL join semantics: a null-key left row gets a null
    * payload (null never equals null), so null-key right rows are dropped
    * up front — a naive window partition would have matched them.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               leftCols: Seq[String], rightPayload: String,
               forward: Boolean = false): DataFrame = {
    val l = left.select(
      col(key), col(time), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(right.schema(rightPayload).dataType).as("__r"))
    val r = right
      .filter(col(key).isNotNull)
      .select(
        col(key), col(time), lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        col(rightPayload).as("__r"))
    // forward (earliest right with rightTime >= leftTime) is backward on
    // reversed time: same one-shuffle window, descending order
    val timeOrd = if (forward) col(time).desc else col(time).asc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++
        leftCols.map(c => col(s"__l.$c").as(c)) :+
        col("__asof").as(rightPayload): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) interval construction from a
    * change history: per key, consecutive same-value changes collapse to
    * one row, each surviving change opens an interval closed by the next
    * one, and the last interval per key is current. The lakehouse dimension
    * pattern: the history table is append-only and this derives the
    * queryable validity view.
    *
    * (ts) must be unique per key — pre-dedup with [[dedupKeepFirst]]
    * otherwise. Two window functions over ONE (key, ts) sort — lag for the
    * collapse, lead for the close — and Spark plans consecutive windows on
    * the same partitioning as a single shuffle + sort, so the whole
    * operator costs one key-partitioned exchange at any scale.
    */
  def scd2(history: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc)
    history
      .withColumn("__prev", lag(col(value), 1).over(w))
      // first row detected via lag(ts) (ts is non-null), NOT lag(value) —
      // a null previous VALUE must still collapse null→null runs; the
      // null-safe inequality keeps transitions through NULL honest
      .withColumn("__first", lag(col(ts), 1).over(w).isNull)
      .filter(col("__first") || !(col(value) <=> col("__prev")))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(value),
        col(ts).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Snapshot diff — the INVERSE of [[cdcApply]]: compare two keyed
    * snapshots and emit the changelog that transforms `before` into
    * `after` — `I` (key only in after), `D` (key only in before), `U`
    * (key in both, any compared column changed null-safely). Unchanged
    * keys are NOT emitted; the output is a change data feed a downstream
    * consumer can replay with [[cdcApply]] semantics. This is the
    * lakehouse "generate CDF between table versions" operation.
    *
    * Scale: one full-outer join on `key`. When both snapshots were
    * produced by key-partitioned operators (the usual case — a
    * dedup-keep-latest per key), the join reuses their partitioning; with
    * snapshots stored bucketed by key it is shuffle-free.
    *
    * Returns key columns + `op` + per compared column `<col>_old` /
    * `<col>_new`.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: Seq[String],
                   cmpCols: Seq[String]): DataFrame = {
    val b = before.select((key ++ cmpCols).map(col): _*)
      .withColumn("__b", lit(true))
      .toDF(key ++ cmpCols.map(_ + "_old") :+ "__b": _*)
    val a = after.select((key ++ cmpCols).map(col): _*)
      .withColumn("__a", lit(true))
      .toDF(key ++ cmpCols.map(_ + "_new") :+ "__a": _*)
    val changed = cmpCols
      .map(c => !(col(c + "_old") <=> col(c + "_new")))
      .reduce(_ || _)
    b.join(a, key, "full_outer")
      .withColumn("op",
        when(col("__b").isNull, "I")
          .when(col("__a").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select((key.map(col) :+ col("op")) ++
        cmpCols.flatMap(c => Seq(col(c + "_old"), col(c + "_new"))): _*)
  }

  /** Bucketized interval join: match left rows (key, ts) to right intervals
    * (key, [start, end)) — the range join Spark would otherwise plan as a
    * broadcast-nested-loop. Each right interval is exploded into the coarse
    * time buckets it covers; the join becomes an equi-join on (key, bucket)
    * plus an exact residual filter. A left row lives in exactly one bucket,
    * so no pair is matched twice — no distinct pass needed.
    *
    * Scale: shuffle is O(left + right × buckets-per-interval) on
    * (key, bucket); pick `bucketSeconds` ≈ the typical interval length so
    * intervals explode into ~1–2 buckets.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                        ts: String, start: String, end: String,
                        bucketSeconds: Long): DataFrame = {
    val size = bucketSeconds * 1000000L
    val lb = left.withColumn("__b", expr(s"unix_micros($ts) DIV $size"))
    val rb = right
      // [start, end): empty/inverted intervals match nothing — and would
      // otherwise make sequence() run DESCENDING, exploding row counts.
      .filter(col(end) > col(start))
      .withColumn("__b",
        explode(expr(s"sequence(unix_micros($start) DIV $size, (unix_micros($end) - 1) DIV $size)")))
    lb.join(rb, Seq(key, "__b"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__b")
  }

  /** Skew-resistant two-phase aggregation: salt the key, partially
    * aggregate per (key, salt), then merge partials per key. For algebraic
    * aggregates (sum/count/min/max) the result is identical to a direct
    * groupBy, but a hot key's rows spread over `saltBuckets` reducers in
    * phase one instead of landing on a single task.
    *
    * `partials` maps each input column to its phase-one aggregate;
    * `merge` combines phase-one outputs (e.g. sum of counts).
    */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
                partials: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(key, col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(key)
      .agg(merge.head, merge.tail: _*)

  /** Skew-resistant equi-join: the fact side gets a pseudo-random salt in
    * [0, saltBuckets); the (small, skew-free) dim side is exploded × the
    * full salt range so every (key, salt) pair still finds its match. The
    * join RESULT is salt-invariant — salting only changes which reducer a
    * hot key's rows land on, splitting it across `saltBuckets` tasks
    * instead of one straggler. This is the manual form of what AQE's
    * skew-join split does at runtime; use it when the skew is known ahead
    * of time (or the join sits under an AQE-opaque operator). The dim-side
    * row multiplication is the price — keep saltBuckets modest and the dim
    * side small relative to the fact side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<long>")))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic stratified sampling — `sampleBy` semantics without
    * `rand()`: a row is kept iff its id's content-hash bucket (0–99, the
    * [[hashSplit]] family) falls below its stratum's percentage. Language
    * rebalancing, source down-weighting, and eval carve-outs all need
    * exactly this: per-stratum rates that are REPRODUCIBLE across runs,
    * engines, repartitions and incremental reprocessing. Pure projection +
    * filter — zero shuffle, rides the scan at 100 TB.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int],
                       defaultPct: Int = 0): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates are percentages in [0, 100]")
    // rates is a Scala Map (deterministic application order irrelevant:
    // stratum values are disjoint), folded into one CASE chain
    val rateCol = rates.foldLeft(lit(defaultPct)) { case (acc, (k, pct)) =>
      when(col(stratumCol) === lit(k), lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket100(idCol) < rateCol)
  }

  /** The content-hash percent bucket shared by [[hashSplit]] and
    * [[stratifiedSample]] — ONE definition because the exact expression is
    * an oracle-parity contract (mirrored byte-for-byte in the DuckDB SQL):
    * md5 of the stringified id → first 15 hex digits → 60-bit int → mod
    * 100.
    */
  private def hashBucket100(idCol: String): Column = expr(
    s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100")

  /** Right-to-be-forgotten audit: for each target table, how many rows a
    * key-purge would delete — the pre-flight report a GDPR deletion job
    * emits before the anti-join rewrite runs. Each target is (name, table,
    * keys-to-forget, join columns); FK cascades are expressed by passing a
    * derived key frame (e.g. the order ids of forgotten customers) as that
    * table's keys. Per table: one semi join (broadcast when the key list
    * is small — the usual case) + a count; results union into one report.
    * The deletion itself is the same plan with `left_anti` writing back.
    */
  def purgeAudit(targets: Seq[(String, DataFrame, DataFrame, Seq[String])]): DataFrame =
    targets.map { case (name, df, keys, cols) =>
      df.join(keys, cols, "left_semi")
        .agg(count(lit(1)).cast("long").as("n_rows"))
        .select(lit(name).as("tbl"), col("n_rows"))
    }.reduce(_ unionByName _)

  /** Per-ROW weighted sampling — [[stratifiedSample]]'s continuous
    * generalization (DCLM-style soft quality filtering): each row survives
    * with probability `num/den`, decided by the same md5 content-hash so
    * the draw is reproducible across runs, engines and repartitions. The
    * keep test is pure integer arithmetic (cross-multiplied against a
    * 2^20-granularity hash bucket — no float thresholds to drift between
    * engines). `num` must be integer-valued in [0, den]. Zero shuffle.
    */
  def weightedSample(df: DataFrame, idCol: String, num: Column, den: Long): DataFrame = {
    require(den > 0, "weightedSample: den must be positive")
    val h = expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) " +
      s"AS BIGINT) % 1048576")
    df.filter(h * lit(den) < num.cast("long") * lit(1048576L))
  }

  /** Deterministic train/val/test split by CONTENT HASH of the id — the
    * reproducible-split primitive every training pipeline needs. Unlike
    * `df.randomSplit`/`rand()` (seed- and partitioning-dependent), the
    * assignment is a pure function of the id: stable across runs, engines,
    * repartitions, and incremental reprocessing (a re-ingested doc lands in
    * the same split). Pure projection — zero shuffle.
    */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    df.withColumn("__h", hashBucket100(idCol))
      .withColumn("split",
        when(col("__h") < trainPct, "train")
          .when(col("__h") < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__h")
  }

  /** Deterministic per-group reservoir sample: EXACTLY `k` rows per group
    * (all of them when the group is smaller) — the fixed-budget sibling of
    * [[stratifiedSample]]'s fixed-RATE draw, for "give me 10k exemplar docs
    * per source/language" curation pulls. Classic distributed reservoir
    * sampling assigns each row a random priority and keeps the k smallest
    * per group; here the priority is the md5 CONTENT HASH of the id (tie-
    * broken by id), so the sample is a pure function of the data — stable
    * across runs, engines, partitionings, and incremental reprocessing —
    * while remaining uniform over ids.
    *
    * Plan shape: one group-partitioned rank window. Spark's
    * WindowGroupLimit pushdown turns the rank filter into a map-side
    * partial top-k per (group, task) BEFORE the exchange, so the shuffle
    * carries at most k rows per group per map task — the same
    * merge-of-local-reservoirs structure the textbook algorithm has.
    */
  def reservoirSample(df: DataFrame, idCol: String, groupCol: String,
                      k: Int): DataFrame = {
    require(k > 0, "reservoirSample: k must be positive")
    val prio = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(prio.asc, col(idCol).asc)))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
