package graft.similarity

import graft.expressions.GraftFunctions
import graft.util.{AtomicRewrite, Stamp, StoreLock, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent IVF index — the cluster-partitioned member of the engine's
  * build-once serving family ([[graft.search.BM25Index]] for keyword
  * search, [[SrpStore]] for sketch-filtered ANN, `SimHashStore` for
  * near-dup): vectors are written ONCE, directory-partitioned by their
  * IVF cluster, plus a (vec_id, cluster) forward table BUCKETED by
  * vid range and sorted by id within each bucket.
  *
  * The forward table is small RELATIVE to the vectors (~24 B/row vs 4d B)
  * but not small in absolute terms at the family's design point (3×10^10
  * vectors ⇒ ~700 GB), so it is never funneled through one task: the
  * build writes `byidBuckets` range buckets in parallel (width =
  * ⌈(maxVid+1)/buckets⌉, persisted in [[AnnMeta]] so appends and point
  * reads can never disagree with the build), and the probe's point read
  * prunes to ONE bucket directory at planning time (`bucket = vid DIV
  * width` is a literal) and then to row groups via the within-bucket
  * sort — the [[graft.layout.BucketStore]] / ServingStores precedent.
  * Appended vids beyond the build's range simply land in new bucket
  * directories (floor division needs no upper bound); a builder sizes
  * `byidBuckets` ∝ N exactly like nCentroids.
  *
  * This is the layout the IVF recall/cost contract actually wants at
  * 100 TB: a query resolves its probe cluster(s) from the forward table
  * (row-group-pruned point read), then the vector scan is pruned to those
  * PARTITION DIRECTORIES at planning time (`PartitionFilters` — asserted
  * in the spec), i.e. it reads nprobe/nCentroids of the corpus from disk
  * instead of filtering it after a full scan, which is what the ad-hoc
  * [[Similarity.ivfTopK]] necessarily does. Scale the centroid count with
  * the corpus (k ∝ N) to hold per-partition size; swap the seed
  * centroids for trained ones ([[Similarity.kmeansAssign]]) without
  * changing the layout.
  *
  * Maintenance lifecycle: [[appendBatch]] assigns a NEW batch against
  * the store's FROZEN centroids ([[Similarity.assignToCentroids]] —
  * identical rounding and tie-break to the build's [[Similarity.ivfAssign]],
  * and since the seed centroids are the base ids < NumCentroids, the
  * appended store equals a full rebuild over the union exactly,
  * spec-asserted) and appends into the cluster partitions + forward
  * table at batch cost; [[compact]] folds accumulated files back into
  * one sorted generation per sub-table, atomically under the staleness
  * stamp ([[AtomicRewrite]] — a crash mid-swap drops the stamp, so a
  * mixed-generation vectors/byid pair can never be served).
  *
  * The probe-cluster lookup is a 1-row driver fetch (the serving
  * boundary, same as [[graft.search.HttpServing]]'s envelope collects) —
  * it becomes the partition-pruning LITERAL, which is exactly why the
  * scan can prune statically. Freshness follows the family's
  * (name, size, mtime) stamp.
  */
object IvfStore {

  /** Build-time default — the REAL hyperparameter lives in the store's
    * [[AnnMeta]] `params.txt` (index identity; k ∝ N is the scale
    * contract, so a 100-TB build passes its own nCentroids and every
    * probe/append reads the choice back instead of assuming it).
    */
  val DefaultNumCentroids = 8

  /** Default forward-table bucket count — like nCentroids, a BUILD
    * parameter persisted in params.txt (a 100-TB build passes
    * buckets ∝ N to hold per-bucket size; the default keeps small-SF
    * builds wide enough to exercise the parallel write + pruned read).
    */
  val DefaultByidBuckets = 16

  def defaultDir(sfDir: String): String = {
    // v3: byid bucketed by vid range (v2's single-file layout serialized
    // the whole forward table through one task per build/compact; both
    // earlier layouts are orphaned by the bump and rebuilt)
    graft.util.StoreDirs.resolve("ivf-store-v3", sfDir)
  }

  /** Range-bucket width from a corpus' max id: floor division vid DIV
    * width sends ~equal vid ranges to each of `buckets` directories.
    * Persisted (AnnMeta) because every append and point read must use
    * the BUILD's width — a disagreeing reader would prune to the wrong
    * bucket and miss a live row.
    */
  /** (max vec_id, row count) of a build corpus — ONE column-pruned scan
    * (parquet max stats + footer counts) feeding both the byid bucket
    * width and the [[graft.search.RetrainPolicy]] train-mass record,
    * with the empty-corpus condition NAMED: max over zero rows is
    * null, which would otherwise surface as an opaque NullPointerException
    * from getLong deep inside a build.
    */
  private[similarity] def corpusStats(embeddings: DataFrame,
                                      store: String): (Long, Long) = {
    val row = embeddings
      .agg(max(col("vec_id").cast("long")), count(lit(1))).head()
    require(!row.isNullAt(0),
      s"$store.buildAt: the embeddings input is EMPTY — cannot build a " +
        "vector store over zero vectors (check the source table/filter)")
    (row.getLong(0), row.getLong(1))
  }

  private[similarity] def byidWidth(maxVid: Long, buckets: Int): Int = {
    val w = (maxVid + buckets) / buckets // = ceil((maxVid+1)/buckets), >= 1
    require(w <= Int.MaxValue,
      s"byid bucket width $w overflows params.txt's int — raise byidBuckets")
    w.toInt
  }

  // cluster leads the sort so the dynamic-partition writer's required
  // ordering is pre-satisfied (no unstable re-sort that could lose the
  // within-file vec_id order — the ServingStores writeLayout argument).
  // Write parallelism is O(partition values), never one task.
  private def writeVectors(assigned: DataFrame, path: String,
                           mode: String): Unit =
    assigned.select(col("vec_id"), col("embedding"), col("__gen"), col("cluster"))
      .repartition(col("cluster"))
      .sortWithinPartitions(col("cluster"), col("vec_id"))
      .write.mode(mode).partitionBy("cluster").parquet(path)

  // bucket leads the sort for the same reason cluster does above; the
  // bucket column is DERIVED here from vid every time (never read back),
  // so a compact can never persist a stale mapping
  private def writeById(assigned: DataFrame, path: String,
                        mode: String, width: Int): Unit =
    assigned.select(col("vec_id"), col("cluster"), col("__gen"))
      .withColumn("bucket", expr(s"vec_id DIV $width"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("vec_id"))
      .write.mode(mode).partitionBy("bucket").parquet(path)

  /** Materialize the cluster-partitioned layout at `dest` — the
    * dest-level build [[ensureBuilt]] wraps with the staleness stamp.
    * Rows at generation 0; stale tombstones cleared.
    */
  def buildAt(dest: String, embeddings: DataFrame,
              nCentroids: Int = DefaultNumCentroids,
              byidBuckets: Int = DefaultByidBuckets): Unit = {
    // at build time, next to the assignment pass, the id-range scan is
    // noise
    val (maxVid, nRows) = corpusStats(embeddings, "IvfStore")
    val width = byidWidth(maxVid, byidBuckets)
    AnnMeta.write(dest, "nCentroids" -> nCentroids,
      "byidBuckets" -> byidBuckets, "byidWidth" -> width)
    graft.search.RetrainPolicy.recordTrainMass(dest, nRows)
    graft.util.Tombstones.clear(dest)
    val assigned = Similarity.ivfAssign(embeddings, "vec_id", "embedding",
        nCentroids)
      .withColumn("__gen", lit(0L))
    writeVectors(assigned, s"$dest/vectors.parquet", "overwrite")
    writeById(assigned, s"$dest/byid.parquet", "overwrite", width)
  }

  /** Append a NEW batch assigned against the store's frozen centroids.
    * Contract: batch ids are new AND outside the seed range
    * (≥ NumCentroids) — under it, append ≡ full rebuild exactly, because
    * a rebuild's seeds (base ids < NumCentroids) are unchanged by the
    * new rows. [[upsertBatch]] is the id-keyed overwrite. Crash
    * contract: the vectors and byid writes are two jobs — a crash
    * between them recovers by re-applying the batch via [[upsertBatch]]
    * (tombstone-first kills the half-applied generation), never by
    * re-running the append, which would double-serve the ids.
    */
  def appendBatch(spark: SparkSession, dest: String, batch: DataFrame): Unit =
    StoreLock.withLock(dest, "append") {
      appendAssigned(spark, dest, batch, graft.util.Tombstones.nextGen(dest))
    }

  /** Id-keyed overwrite ([[graft.util.Tombstones]] contract): tombstone the
    * batch's ids, re-assign them against the frozen centroids at the
    * same generation. Contract: ids outside the seed range (a seed
    * vector IS a centroid; editing one invalidates the index identity —
    * rebuild instead).
    */
  def upsertBatch(spark: SparkSession, dest: String, batch: DataFrame): Unit =
    StoreLock.withLock(dest, "append") {
      val nCentroids = AnnMeta.readKey(dest, "nCentroids")
      require(batch.filter(col("vec_id") < nCentroids).isEmpty,
        s"cannot upsert a seed id (< $nCentroids): a seed IS a centroid" +
          " — editing one changes the index identity; rebuild instead")
      val gen = graft.util.Tombstones.nextGen(dest)
      graft.util.Tombstones.write(batch.select(col("vec_id")), dest, gen)
      appendAssigned(spark, dest, batch, gen)
    }

  /** Tombstone-only delete; purged at the next [[compact]]. */
  def deleteIds(spark: SparkSession, dest: String, ids: Seq[Long]): Unit =
    StoreLock.withLock(dest, "append") {
      val nCentroids = AnnMeta.readKey(dest, "nCentroids")
      require(ids.forall(_ >= nCentroids),
        s"cannot delete a seed id (< $nCentroids): a seed IS a centroid" +
          " — removing one changes every later assignment; rebuild instead")
      import spark.implicits._
      graft.util.Tombstones.write(ids.toDF("vec_id"), dest,
        graft.util.Tombstones.nextGen(dest))
    }

  private def appendAssigned(spark: SparkSession, dest: String,
                             batch: DataFrame, gen: Long): Unit = {
    val nCentroids = AnnMeta.readKey(dest, "nCentroids")
    val cents = liveVectors(spark, dest)
      .filter(col("vec_id") < nCentroids)
      .select(col("vec_id").cast("long").as("cid"), col("embedding").as("cv"))
    val assigned = Similarity.assignToCentroids(batch, "vec_id", "embedding",
        cents)
      .withColumn("__gen", lit(gen))
    writeVectors(assigned, s"$dest/vectors.parquet", "append")
    writeById(assigned, s"$dest/byid.parquet", "append",
      AnnMeta.readKey(dest, "byidWidth"))
  }

  private def liveVectors(spark: SparkSession, dest: String): DataFrame =
    graft.util.Tombstones.dropDead(spark, dest,
      spark.read.parquet(s"$dest/vectors.parquet"), "vec_id")

  private def liveById(spark: SparkSession, dest: String): DataFrame =
    graft.util.Tombstones.dropDead(spark, dest,
      spark.read.parquet(s"$dest/byid.parquet"), "vec_id")

  /** Fold accumulated appended files back into one sorted generation per
    * sub-table with tombstoned rows physically purged and the tombstones
    * cleared — both sub-tables swapped in ONE stamp-guarded transaction
    * so a crash can never pair new vectors with an old forward table.
    * Excludes concurrent writers via the store lock.
    */
  def compact(spark: SparkSession, dest: String): Unit =
    StoreLock.withLock(dest, "compact") {
      val vectors = liveVectors(spark, dest).withColumn("__gen", lit(0L))
      val byid = liveById(spark, dest).withColumn("__gen", lit(0L))
      // tombstone clear inside the stamp-guarded transaction (folded rows
      // are at generation 0 — a crash between swap and clear would leave
      // gen >= 1 tombstones anti-joining live rows away; stampless-on-
      // crash forces a rebuild instead)
      val width = AnnMeta.readKey(dest, "byidWidth")
      AtomicRewrite.rewriteMany(dest, Seq(
        s"$dest/vectors.parquet" -> (tmp => writeVectors(vectors, tmp, "overwrite")),
        s"$dest/byid.parquet" -> (tmp => writeById(byid, tmp, "overwrite", width))),
        inTxn = () => graft.util.Tombstones.clear(dest))
    }

  /** Retrain the router by rebuilding the store IN PLACE from its OWN
    * live rows — the flat store is self-contained (raw vectors ARE the
    * artifact), so the maintenance tier can retrain without the source
    * corpus; this is the rebuild [[graft.search.RetrainPolicy]] triggers
    * from `StoreAdmin.maintain`'s opt-in sweep. Deliberately LOCK-FREE:
    * `maybeRetrain` holds the store lock around it (withLock is not
    * reentrant), so callers other than the policy must take the lock
    * themselves. Index identity (persisted nCentroids/byidBuckets) is
    * preserved; an `__auto` store re-derives k on its next source-stamp
    * rebuild, not here.
    *
    * Crash contract: the live snapshot is materialized OUTSIDE the
    * sub-tables first (a lazy plan must not read the very files buildAt
    * is overwriting) in a `-rewrite-tmp` dir [[graft.search.StoreAdmin
    * .gcOrphans]] reclaims; the source stamp is dropped BEFORE the
    * overwrite and restored after, so a crash mid-rebuild leaves a
    * stampless store that `ensureBuilt` rebuilds rather than serving
    * half-written artifacts (the AtomicRewrite stamp-first argument).
    */
  def rebuildFromSelf(spark: SparkSession, dest: String): Unit = {
    val meta = AnnMeta.read(dest)
    val snap = s"$dest/retrain-snap-rewrite-tmp"
    liveVectors(spark, dest).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(snap)
    val stampFile = java.nio.file.Paths.get(dest, "source_stamp.txt")
    val stamp =
      if (graft.util.StoreFs.exists(stampFile))
        Some(graft.util.StoreFs.readString(stampFile))
      else None
    graft.util.StoreFs.deleteIfExists(stampFile)
    buildAt(dest, spark.read.parquet(snap), meta("nCentroids"),
      meta("byidBuckets"))
    stamp.foreach(s => Stamp.write(dest, s))
    graft.util.StoreFs.deleteRecursively(java.nio.file.Paths.get(snap))
  }

  /** Build-if-absent-or-stale; returns the store directory. */
  def ensureBuilt(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      buildAt(dest, Tables.embeddings(spark, sfDir))
      Stamp.write(dest, stamp)
    }
    dest
  }

  /** Target per-cell population for [[ensureBuiltAuto]] —
    * [[IvfPqStore.AutoCellSize]]'s contract: nCentroids = ⌈N / 50⌉
    * keeps a probe's scan ~50 vectors at ANY corpus size.
    */
  val AutoCellSize = 50L

  /** k ∝ N made executable for the flat IVF store (round-14 verdict
    * item 7 — [[IvfPqStore.ensureBuiltAuto]]'s pattern): nCentroids
    * resolved from the corpus count at build time and persisted, so
    * per-cell population stays ~constant as the corpus grows. Gated by
    * `q_ann_ivf_auto`, whose oracle derives the SAME count-based
    * nCentroids in SQL.
    */
  def ensureBuiltAuto(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir) + "__auto"
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      graft.search.StoreAdmin.truncate(dest)
      val emb = Tables.embeddings(spark, sfDir)
      buildAt(dest, emb, Similarity.autoK(emb.count(), AutoCellSize))
      Stamp.write(dest, stamp)
    }
    dest
  }

  /** Incremental build-if-stale: base build over the seed ids plus 80%
    * of the rest, the remainder appended under the frozen centroids,
    * then compacted — `q_ann_ivf_incr` serves from it with `q_ann_ivf`'s
    * oracle verbatim (append ≡ rebuild exactly, because the base keeps
    * every seed id < NumCentroids). A rebuild wipes dest first.
    */
  def ensureBuiltIncremental(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir) + "__incr"
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      graft.search.StoreAdmin.truncate(dest)
      val emb = Tables.embeddings(spark, sfDir)
      buildAt(dest, emb.filter(
        col("vec_id") < DefaultNumCentroids || col("vec_id") % 5 =!= 0))
      appendBatch(spark, dest, emb.filter(
        col("vec_id") >= DefaultNumCentroids && col("vec_id") % 5 === 0))
      compact(spark, dest)
      Stamp.write(dest, stamp)
    }
    dest
  }

  /** [[topK]] against an explicit store directory (lifecycle specs). */
  def topKAt(spark: SparkSession, dest: String, queryId: Long,
             k: Int): DataFrame = {
    GraftFunctions.register(spark)
    // serving-boundary point read: the query's cluster id, needed as a
    // literal so the partition filter prunes at planning time. The read
    // itself prunes to ONE bucket directory (bucket = vid DIV width is
    // a literal) and then to row groups via the within-bucket vid sort.
    val width = AnnMeta.readKey(dest, "byidWidth")
    // the point read can miss (id never indexed, or deleted and
    // tombstoned) — name the contract instead of an opaque
    // NoSuchElementException from head() (IvfPqStore.topKAt's guard)
    val hit = liveById(spark, dest)
      .filter(col("bucket") === lit(queryId / width) &&
        col("vec_id") === queryId)
      .collect().headOption
    require(hit.nonEmpty,
      s"IvfStore.topKAt: query id $queryId is not live in store $dest " +
        "(never indexed, or deleted) — index it or query by vector")
    val qCluster = hit.get.getAs[Number]("cluster").longValue()
    val qv = liveVectors(spark, dest)
      .filter(col("cluster") === qCluster && col("vec_id") === queryId)
      .select(col("embedding").as("__qv"))
    liveVectors(spark, dest)
      .filter(col("cluster") === qCluster)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** [[Similarity.ivfTopK]] (nprobe = 1) served from the store: identical
    * results, but the vector scan is pruned to the probe cluster's
    * partition directory instead of post-filtering a full corpus scan.
    */
  def topK(spark: SparkSession, sfDir: String, queryId: Long, k: Int): DataFrame =
    topKAt(spark, ensureBuilt(spark, sfDir), queryId, k)
}
