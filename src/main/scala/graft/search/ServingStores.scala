package graft.search

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Persisted request-time layouts for the two non-keyword REST routes —
  * the serving-store treatment [[BM25Index]] gives the keyword route
  * (round-10 verdict item 7), applied to exact-match and FK-expansion
  * queries:
  *
  *  - POSTING store ([[buildPostings]]/[[postingProbe]]): one row per
  *    (key, source row) from an exploded key array — the hashtag
  *    route's `tweetHashtags:'<tag>'` shape. Laid out partitioned by
  *    `pmod(hash(key), buckets)` and sorted by key within, so a probe
  *    statically prunes to ONE bucket directory (the partition filter
  *    folds to a literal) and min/max row-group stats cut inside it —
  *    request cost is the matching postings, never an `array_contains`
  *    scan of the corpus.
  *  - TIMELINE store ([[buildTimeline]]/[[timelineProbe]]): the fact
  *    table partitioned by a foreign-key bucket and sorted by
  *    (fk, order cols) within — the user-timeline route's FK expansion
  *    reads one bucket, one key's row span.
  *
  * Both hash `CAST(key AS STRING)` on BOTH build and probe sides so the
  * bucket function is insensitive to the key column's physical type.
  * The bucket count is written into the store (`_buckets.txt` — the
  * underscore keeps it out of the parquet file index) — probes can
  * never disagree with the layout. The row schema is persisted too
  * (`_schema.json`), so a store built from an all-empty-keys source
  * (zero parquet files) still probes to a typed empty frame instead of
  * a schema-inference error.
  *
  * Maintenance lifecycle (the reference's indexer is a CONTINUOUS
  * keyed-upsert loop — SolrIndexer's addBean+commit per batch — with
  * Solr compacting segments beneath it; this is that full cycle):
  * [[appendPostings]]/[[appendTimeline]] add a batch's rows into the
  * existing bucket dirs at batch cost; [[compactPostings]]/
  * [[compactTimeline]] fold the accumulated small files back into one
  * read-optimized generation (bounded file count, restored row-group
  * pruning); [[rebucketPostings]]/[[rebucketTimeline]] change the
  * bucket count in place when growth makes buckets hot — the one
  * remedy short of a full rebuild. All three rewrite atomically with
  * `_buckets.txt` as the swap sentinel (deleted first, restored last —
  * the [[BM25Index.compact]] crash contract: a crash mid-swap leaves a
  * store that fails loudly and rebuilds, never serves a mixed
  * generation). At 100 TB these are the layouts a serving cluster
  * holds per collection; the stamp-guarded lifecycle (build-once,
  * [[StoreAdmin]]-truncatable) matches the engine's other stores.
  */
object ServingStores {

  val DefaultBuckets = 64

  private def bucketOf(key: Column, buckets: Int): Column =
    pmod(hash(key.cast("string")), lit(buckets))

  /** Bucket-partitioned layout write. The sort leads with `__bucket`:
    * `repartition(col)` can co-locate several bucket values in one task
    * and the dynamic-`partitionBy` writer then requires its own sort by
    * the partition column — which is NOT guaranteed stable, so a
    * key-only `sortWithinPartitions` could silently lose the documented
    * within-bucket key order (and the min/max row-group pruning it
    * enables). Leading with `__bucket` satisfies the writer's required
    * ordering outright; no re-sort is inserted.
    */
  private def writeLayout(rows: DataFrame, sortCols: Seq[Column],
                          dest: String, mode: String): Unit =
    rows.repartition(col("__bucket"))
      .sortWithinPartitions(col("__bucket") +: sortCols: _*)
      .write.mode(mode).partitionBy("__bucket").parquet(dest)

  private def postingRows(df: DataFrame, keysCol: Column, buckets: Int,
                          dropCols: Seq[String]): DataFrame =
    // array_distinct: a key repeated within one row must post the row
    // ONCE — the probe replays `array_contains` semantics, not explode's
    df.withColumn("__key", explode(array_distinct(keysCol)))
      .drop(dropCols: _*)
      .withColumn("__bucket", bucketOf(col("__key"), buckets))

  /** Explode `keysCol` (an array column) into a posting table carrying
    * every source column, bucket-partitioned and key-sorted.
    */
  def buildPostings(df: DataFrame, keysCol: Column, dest: String,
                    buckets: Int = DefaultBuckets,
                    dropCols: Seq[String] = Nil): Unit = {
    val rows = postingRows(df, keysCol, buckets, dropCols)
    writeLayout(rows, Seq(col("__key")), dest, "overwrite")
    writeMeta(dest, buckets, rows.schema)
  }

  /** Append a NEW batch's postings into an existing store — the
    * [[BM25Index.appendSegment]] lifecycle for the exact-match routes:
    * the batch is exploded/bucketed with the layout's OWN bucket count
    * (read back from `_buckets.txt`, so an appender can never split the
    * key space differently) and written `mode(append)` into the same
    * bucket directories. Probes need no change — they read every file
    * in the key's bucket, base and appended alike. Per-batch cost is the
    * batch explode + one write; the store is never rewritten. When small
    * appended files accumulate, [[compactPostings]] folds them back into
    * one read-optimized generation — the BM25Index compaction contract.
    */
  def appendPostings(batch: DataFrame, keysCol: Column, dest: String,
                     dropCols: Seq[String] = Nil): Unit = {
    val buckets = readBuckets(dest)
    writeLayout(postingRows(batch, keysCol, buckets, dropCols),
      Seq(col("__key")), dest, "append")
  }

  /** Fold every file of the store — base build plus any appended
    * batches — into one freshly sorted generation with the SAME bucket
    * count: file count drops back to O(buckets), within-bucket key
    * order (and its min/max row-group pruning) is restored across what
    * appends interleaved. Pure metadata-layout work: one read + one
    * shuffle-free re-sort write (rows already carry `__bucket`; the
    * exchange is the repartition back to bucket dirs), never a source
    * re-explode. Probe results are byte-identical before/after
    * (spec-asserted against a fresh rebuild).
    */
  def compactPostings(spark: SparkSession, dest: String): Unit =
    rewriteStore(spark, dest, readBuckets(dest), Seq(col("__key")),
      reBucket = None)

  /** [[compactPostings]] scoped to the buckets that NEED it — the
    * 100-TB maintenance shape: a full-store rewrite is O(store) per
    * cycle, but appends only fragment the buckets they touched, and
    * bucket dirs are independent, so compaction can pay O(hot buckets)
    * instead. Buckets with ≥ `minFiles` data files are each folded to
    * one key-sorted file; cold buckets' files are left byte-untouched.
    * Crash contract (same invariant, stronger downtime trade: all tmps
    * are materialized FIRST, then the stamp and the `_buckets.txt`
    * sentinel come down for the per-bucket swaps and are restored last —
    * so unlike the full rewrite, probes fail loudly DURING the swap
    * window rather than serving the old generation; a crash anywhere
    * mid-swap leaves a loud store a build-if-stale caller rebuilds).
    * Returns the compacted bucket ids.
    */
  def compactHotBuckets(spark: SparkSession, dest: String,
                        minFiles: Int = 4): Seq[Int] =
    compactHot(spark, dest, Seq(col("__key")), minFiles)

  /** [[compactHotBuckets]] for the timeline layout — the caller
    * restates the (fk, sort) contract like [[compactTimeline]].
    */
  def compactHotTimeline(spark: SparkSession, dest: String, fkCol: String,
                         sortCols: Seq[Column] = Nil,
                         minFiles: Int = 4): Seq[Int] =
    compactHot(spark, dest, col(fkCol) +: sortCols, minFiles)

  /** Change the bucket count of an existing posting store IN PLACE —
    * the growth remedy when a fixed build-time bucket count leaves hot
    * buckets at 100 TB: every row's `__bucket` is recomputed from its
    * `__key` under the new count and the store is atomically rewritten,
    * `_buckets.txt` updated last so probes can never pair the new
    * layout with the old count. Appenders read the new count on their
    * next batch. Probe ≡ `array_contains` across any rebucket
    * (property-spec-asserted for 1 → 3 → 64).
    */
  def rebucketPostings(spark: SparkSession, dest: String,
                       newBuckets: Int): Unit =
    rewriteStore(spark, dest, newBuckets, Seq(col("__key")),
      reBucket = Some(col("__key")))

  /** All source rows posted under `key` — a one-bucket pruned scan. */
  def postingProbe(spark: SparkSession, dest: String, key: String): DataFrame = {
    val buckets = readBuckets(dest)
    readStore(spark, dest)
      .filter(col("__bucket") === bucketOf(lit(key), buckets) &&
        col("__key") === key)
      .drop("__key", "__bucket")
  }

  /** Fact rows partitioned by `pmod(hash(fk), buckets)`, sorted by
    * (fk, sortCols) within each bucket file.
    */
  def buildTimeline(df: DataFrame, fkCol: String, dest: String,
                    sortCols: Seq[Column] = Nil,
                    buckets: Int = DefaultBuckets): Unit = {
    val rows = df.withColumn("__bucket", bucketOf(col(fkCol), buckets))
    writeLayout(rows, col(fkCol) +: sortCols, dest, "overwrite")
    writeMeta(dest, buckets, rows.schema)
  }

  /** [[appendPostings]] for the FK-expansion layout: a new fact batch
    * bucketed with the store's own count and appended into the existing
    * bucket dirs — the continuous-ingest half the timeline route was
    * missing. Same contract: probes read base + appended files alike;
    * compact via [[compactTimeline]] when small files accumulate.
    */
  def appendTimeline(batch: DataFrame, fkCol: String, dest: String,
                     sortCols: Seq[Column] = Nil): Unit = {
    val buckets = readBuckets(dest)
    writeLayout(batch.withColumn("__bucket", bucketOf(col(fkCol), buckets)),
      col(fkCol) +: sortCols, dest, "append")
  }

  /** [[compactPostings]] for the timeline layout — the caller restates
    * the layout's (fk, sort) contract because parquet does not persist
    * it; the fk/sort columns must match the build's.
    */
  def compactTimeline(spark: SparkSession, dest: String, fkCol: String,
                      sortCols: Seq[Column] = Nil): Unit =
    rewriteStore(spark, dest, readBuckets(dest), col(fkCol) +: sortCols,
      reBucket = None)

  /** [[rebucketPostings]] for the timeline layout. */
  def rebucketTimeline(spark: SparkSession, dest: String, fkCol: String,
                       newBuckets: Int, sortCols: Seq[Column] = Nil): Unit =
    rewriteStore(spark, dest, newBuckets, col(fkCol) +: sortCols,
      reBucket = Some(col(fkCol)))

  /** All fact rows for one FK value — a one-bucket pruned scan plus a
    * row-group-prunable equality on the sorted fk column.
    */
  def timelineProbe(spark: SparkSession, dest: String, fkCol: String,
                    value: Any): DataFrame =
    timelineProbeMany(spark, dest, fkCol, Seq(value))

  /** [[timelineProbe]] for a SET of FK values (an entity resolving to
    * several keys — shards, aliases, merged accounts): a disjunction of
    * per-key (bucket literal, fk literal) conjuncts, so the scan prunes
    * to exactly the keys' bucket directories — request cost is the
    * matching spans, independent of table size. An EMPTY key set (the
    * entity resolved to nothing on this corpus) returns a typed empty
    * frame — served and ad-hoc routes degrade identically.
    */
  def timelineProbeMany(spark: SparkSession, dest: String, fkCol: String,
                        values: Seq[Any]): DataFrame = {
    if (values.isEmpty)
      readStore(spark, dest).filter(lit(false)).drop("__bucket")
    else {
      val buckets = readBuckets(dest)
      val pred = values
        .map(v => col("__bucket") === bucketOf(lit(v), buckets) &&
          col(fkCol) === lit(v))
        .reduce(_ || _)
      readStore(spark, dest).filter(pred).drop("__bucket")
    }
  }

  def defaultDir(sfDir: String): String = {
    val root = sys.env.getOrElse("GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/target/serving-store-v1")
    root + "/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
  }

  /** Build-if-stale: word-posting store over the documents table (the
    * q_hashtag_served layout — `doc_id/source/n_chars` posted under each
    * whitespace token, FIXTURES.md's stand-in for `tweetHashtags`).
    */
  def ensureDocPostings(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir) + "/doc_postings"
    val stamp = graft.util.Stamp.sourceStamp(sfDir)
    if (!graft.util.Stamp.isFresh(dest, stamp)) {
      buildPostings(
        graft.util.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("n_chars"),
            split(col("text"), " ").as("__words")),
        col("__words"), dest, dropCols = Seq("__words"))
      graft.util.Stamp.write(dest, stamp)
    }
    dest
  }

  /** Build-if-stale: orders bucketed by o_custkey, date-sorted within —
    * the q_user_timeline_served FK-expansion layout.
    */
  def ensureOrdersTimeline(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir) + "/orders_by_cust"
    val stamp = graft.util.Stamp.sourceStamp(sfDir, "orders.parquet")
    if (!graft.util.Stamp.isFresh(dest, stamp)) {
      buildTimeline(graft.util.Tables.orders(spark, sfDir), "o_custkey",
        dest, sortCols = Seq(col("o_orderdate").desc))
      graft.util.Stamp.write(dest, stamp)
    }
    dest
  }

  /** [[ensureDocPostings]]'s INCREMENTAL variant — the maintenance
    * lifecycle under the driver hash gate (the
    * [[BM25Index.ensureBuiltIncremental]] pattern): 80% of the corpus
    * (doc_id % 5 ≠ 0) is the base build, the rest arrives as an appended
    * batch, then the store compacts — and `q_hashtag_incr` probes it
    * with `q_hashtag_served`'s oracle VERBATIM, so append+compact ≡
    * one-shot is checked by the driver's hash compare, not just a spec.
    * A rebuild wipes dest first so a stale generation can never linger.
    */
  def ensureDocPostingsIncr(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir) + "/doc_postings_incr"
    val stamp = graft.util.Stamp.sourceStamp(sfDir)
    if (!graft.util.Stamp.isFresh(dest, stamp)) {
      deleteRecursively(Paths.get(dest))
      def docs = graft.util.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          split(col("text"), " ").as("__words"))
      // deliberately built UNDER-bucketed, then rebucketed to the default
      // after the append+compact cycle — every lifecycle op (append,
      // selective hot-bucket compact, full-rewrite rebucket) sits in
      // front of the driver's hash compare. minFiles=2 makes every
      // appended-into bucket hot; the full-compact flavor is covered by
      // the rebucket (same rewrite) and the timeline chain.
      buildPostings(docs.filter(col("doc_id") % 5 =!= 0), col("__words"),
        dest, buckets = 16, dropCols = Seq("__words"))
      appendPostings(docs.filter(col("doc_id") % 5 === 0), col("__words"),
        dest, dropCols = Seq("__words"))
      compactHotBuckets(spark, dest, minFiles = 2)
      rebucketPostings(spark, dest, DefaultBuckets)
      graft.util.Stamp.write(dest, stamp)
    }
    dest
  }

  /** [[ensureOrdersTimeline]]'s incremental variant — same contract as
    * [[ensureDocPostingsIncr]] for the FK layout (`q_user_timeline_incr`
    * shares `q_user_timeline_served`'s oracle verbatim).
    */
  def ensureOrdersTimelineIncr(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir) + "/orders_by_cust_incr"
    val stamp = graft.util.Stamp.sourceStamp(sfDir, "orders.parquet")
    if (!graft.util.Stamp.isFresh(dest, stamp)) {
      deleteRecursively(Paths.get(dest))
      def orders = graft.util.Tables.orders(spark, sfDir)
      val sorts = Seq(col("o_orderdate").desc)
      buildTimeline(orders.filter(col("o_orderkey") % 5 =!= 0), "o_custkey",
        dest, sortCols = sorts)
      appendTimeline(orders.filter(col("o_orderkey") % 5 === 0), "o_custkey",
        dest, sortCols = sorts)
      compactTimeline(spark, dest, "o_custkey", sortCols = sorts)
      graft.util.Stamp.write(dest, stamp)
    }
    dest
  }

  /** Parquet data files currently in the store (bucket dirs only) — the
    * compaction spec's bounded-file-count evidence.
    */
  def dataFileCount(dest: String): Int = {
    val root = Paths.get(dest)
    if (!Files.isDirectory(root)) 0
    else {
      val s = Files.walk(root)
      try s.iterator().asScala.count { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      finally s.close()
    }
  }

  /** Atomic full rewrite shared by compaction (same bucket count, rows
    * keep their `__bucket`) and rebucketing (`reBucket` = the key column
    * whose hash re-derives `__bucket` under `newBuckets`). The rewrite
    * lands in a sibling tmp dir first; then the staleness stamp is the
    * FIRST thing deleted and the LAST thing restored — the
    * [[graft.util.AtomicRewrite]] invariant. That ordering is what makes
    * every crash window recoverable: a crash during the tmp write leaves
    * the old store untouched (plus an orphan tmp for
    * [[StoreAdmin.gcOrphans]]); a crash after the stamp delete leaves a
    * store `Stamp.isFresh` rejects, so the build-if-stale callers
    * REBUILD — whether probes still serve the old generation (sentinel
    * intact) or fail loudly (sentinel gone). The inverted order (stamp
    * restored before `_buckets.txt` is written, or the sentinel deleted
    * while the stamp survives) would leave a fresh-stamped store with no
    * bucket sentinel: ensure* skips it and every probe crashes, forever.
    * The stamp's VALUE survives a completed rewrite: compaction does not
    * change what source the store was built from.
    */
  private def rewriteStore(spark: SparkSession, dest: String,
                           newBuckets: Int, sortCols: Seq[Column],
                           reBucket: Option[Column]): Unit = {
    val rows0 = readStore(spark, dest)
    val rows = reBucket match {
      case Some(key) => rows0.drop("__bucket")
        .withColumn("__bucket", bucketOf(key, newBuckets))
      case None => rows0
    }
    val stampFile = Paths.get(dest, "source_stamp.txt")
    val stamp = if (Files.exists(stampFile)) Some(Files.readString(stampFile))
                else None
    val tmp = dest.stripSuffix("/") + "-rewrite-tmp"
    writeLayout(rows, sortCols, tmp, "overwrite")
    val schema = rows.schema
    Files.deleteIfExists(stampFile)
    Files.deleteIfExists(Paths.get(dest, "_buckets.txt"))
    deleteRecursively(Paths.get(dest))
    Files.move(Paths.get(tmp), Paths.get(dest))
    writeMeta(dest, newBuckets, schema)
    stamp.foreach(Files.writeString(stampFile, _))
  }

  /** Bucket-local selective rewrite shared by the two layouts: every
    * bucket dir holding ≥ `minFiles` parquet files is read through the
    * persisted row schema (minus the partition column, which the files
    * do not carry), folded to ONE sorted file in a sibling tmp, and the
    * dirs are swapped under the downed stamp+sentinel pair. Work and
    * I/O are proportional to the HOT buckets only.
    */
  private def compactHot(spark: SparkSession, dest: String,
                         sortCols: Seq[Column], minFiles: Int): Seq[Int] = {
    val buckets = readBuckets(dest) // fails loudly on a mid-swap store
    val hot = (0 until buckets).filter(b =>
      bucketFileCount(dest, b) >= minFiles)
    if (hot.nonEmpty) {
      val rowSchema = readSchema(dest).getOrElse(
        spark.read.parquet(dest).schema)
      val fileSchema = StructType(rowSchema.filterNot(_.name == "__bucket"))
      val tmpRoot = dest.stripSuffix("/") + "-rewrite-tmp"
      deleteRecursively(Paths.get(tmpRoot))
      // 1. materialize every replacement before touching the store
      hot.foreach { b =>
        spark.read.schema(fileSchema).parquet(s"$dest/__bucket=$b")
          .coalesce(1).sortWithinPartitions(sortCols: _*)
          .write.mode("overwrite").parquet(s"$tmpRoot/__bucket=$b")
      }
      // 2. stamp first, sentinel second (the rewriteStore ordering)
      val stampFile = Paths.get(dest, "source_stamp.txt")
      val stamp = if (Files.exists(stampFile)) Some(Files.readString(stampFile))
                  else None
      Files.deleteIfExists(stampFile)
      Files.deleteIfExists(Paths.get(dest, "_buckets.txt"))
      hot.foreach { b =>
        deleteRecursively(Paths.get(dest, s"__bucket=$b"))
        Files.move(Paths.get(tmpRoot, s"__bucket=$b"),
          Paths.get(dest, s"__bucket=$b"))
      }
      deleteRecursively(Paths.get(tmpRoot))
      // 3. sentinel back, stamp last
      Files.writeString(Paths.get(dest, "_buckets.txt"), buckets.toString)
      stamp.foreach(Files.writeString(stampFile, _))
    }
    hot
  }

  /** Parquet data files currently in one bucket dir. */
  def bucketFileCount(dest: String, bucket: Int): Int = {
    val dir = Paths.get(dest, s"__bucket=$bucket")
    if (!Files.isDirectory(dir)) 0
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.count { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      finally s.close()
    }
  }

  /** Read the store's rows (including `__bucket`) through the persisted
    * schema, so an all-empty store (zero parquet files) yields a typed
    * empty frame instead of an inference error. Legacy stores without
    * `_schema.json` fall back to inference.
    */
  private def readStore(spark: SparkSession, dest: String): DataFrame =
    readSchema(dest) match {
      case Some(s) => spark.read.schema(s).parquet(dest)
      case None => spark.read.parquet(dest)
    }

  private def writeMeta(dest: String, buckets: Int, schema: StructType): Unit = {
    Files.createDirectories(Paths.get(dest))
    Files.writeString(Paths.get(dest, "_schema.json"), schema.json)
    // _buckets.txt LAST: it is the store's serve sentinel
    Files.writeString(Paths.get(dest, "_buckets.txt"), buckets.toString)
  }

  private def readBuckets(dest: String): Int =
    Files.readString(Paths.get(dest, "_buckets.txt")).trim.toInt

  private def readSchema(dest: String): Option[StructType] = {
    val f = Paths.get(dest, "_schema.json")
    if (Files.exists(f))
      Some(org.apache.spark.sql.types.DataType.fromJson(Files.readString(f))
        .asInstanceOf[StructType])
    else None
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
