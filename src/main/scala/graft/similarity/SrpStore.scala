package graft.similarity

import graft.util.{AtomicRewrite, Stamp, StoreLock, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent SRP sketch store — the ANN member of the engine's build-once
  * serving family ([[graft.search.BM25Index]] for keyword search,
  * [[graft.dedup.SimHashStore]] for near-dup): the 128-bit signatures of
  * [[Similarity.srpSignature]] are computed over the embedding corpus ONCE
  * and persisted as four bigint words, so a serving deployment answers
  * every ANN query from a 32-byte-per-row sketch scan + an id-join to the
  * vectors for exact rerank of the Hamming-ball survivors — the raw
  * 256-byte embedding column is never scanned for filtering.
  *
  * Maintenance lifecycle (the [[graft.search.ServingStores]] contract
  * applied to the ANN family): [[appendBatch]] adds a new batch's
  * signatures at batch cost — EXACT by construction, since a row's
  * sketch depends only on that row (the hyperplanes are plan-time
  * md5-derived constants), so append ≡ full rebuild byte-for-byte
  * (spec-asserted); [[compact]] folds accumulated small files into one
  * range-sorted generation (vec_id min/max row-group pruning restored
  * for the query-point lookup), atomically with the staleness stamp as
  * the swap sentinel ([[AtomicRewrite]]).
  *
  * Freshness follows the family pattern: a (name, size, mtime) stamp of
  * the source parquet; repeated suite runs reuse the artifact, a
  * regenerated corpus forces a rebuild.
  */
object SrpStore {

  def defaultDir(sfDir: String): String = {
    graft.util.StoreDirs.resolve("srp-sig-v1", sfDir)
  }

  /** Materialize the signature table for `embeddings` at `dest` — the
    * dest-level build [[ensureBuilt]] wraps with the staleness stamp.
    * Rows at generation 0; stale tombstones cleared.
    */
  def buildAt(dest: String, embeddings: DataFrame): Unit = {
    graft.util.Tombstones.clear(dest)
    Similarity.srpSignature(embeddings, "embedding")
      .select(col("vec_id"), col("__w0"), col("__w1"), col("__w2"), col("__w3"))
      .withColumn("__gen", lit(0L))
      .write.mode("overwrite").parquet(dest + "/sig.parquet")
  }

  /** Append a NEW batch's signatures into an existing store at batch
    * cost. Exact by construction: signatures are per-row, so the
    * appended store is value-equal to a rebuild over the union.
    * Contract: batch ids are new — [[upsertBatch]] is the id-keyed
    * overwrite.
    */
  def appendBatch(dest: String, batch: DataFrame): Unit =
    StoreLock.withLock(dest, "append") {
      Similarity.srpSignature(batch, "embedding")
        .select(col("vec_id"), col("__w0"), col("__w1"), col("__w2"), col("__w3"))
        .withColumn("__gen", lit(graft.util.Tombstones.nextGen(dest)))
        .write.mode("append").parquet(dest + "/sig.parquet")
    }

  /** Id-keyed overwrite ([[graft.util.Tombstones]] contract): the batch's ids
    * are tombstoned then re-signed at the same generation — an EDITED
    * vector's sketch replaces its predecessor on the next read.
    */
  def upsertBatch(spark: SparkSession, dest: String, batch: DataFrame): Unit =
    StoreLock.withLock(dest, "append") {
      val gen = graft.util.Tombstones.nextGen(dest)
      graft.util.Tombstones.write(batch.select(col("vec_id")), dest, gen)
      Similarity.srpSignature(batch, "embedding")
        .select(col("vec_id"), col("__w0"), col("__w1"), col("__w2"), col("__w3"))
        .withColumn("__gen", lit(gen))
        .write.mode("append").parquet(dest + "/sig.parquet")
    }

  /** Tombstone-only delete; purged at the next [[compact]]. */
  def deleteIds(spark: SparkSession, dest: String, ids: Seq[Long]): Unit =
    StoreLock.withLock(dest, "append") {
      import spark.implicits._
      graft.util.Tombstones.write(ids.toDF("vec_id"), dest,
        graft.util.Tombstones.nextGen(dest))
    }

  /** The store's live signatures — dead generations dropped, `__gen`
    * stripped (what [[topK]]/[[ensureBuilt]] hand to consumers).
    */
  def read(spark: SparkSession, dest: String): DataFrame =
    graft.util.Tombstones.dropDead(spark, dest,
      spark.read.parquet(dest + "/sig.parquet"), "vec_id").drop("__gen")

  /** Fold accumulated appended files into one range-sorted generation
    * with tombstoned rows physically purged and the tombstones cleared:
    * bounded file count, vec_id min/max stats restored. Atomic via the
    * stamp-sentinel swap; excludes concurrent writers via the store
    * lock.
    */
  def compact(spark: SparkSession, dest: String): Unit =
    StoreLock.withLock(dest, "compact") {
      val sigs = read(spark, dest).withColumn("__gen", lit(0L))
      // tombstone clear inside the stamp-guarded transaction (folded rows
      // are at generation 0 — a crash between swap and clear would leave
      // gen >= 1 tombstones anti-joining live rows away)
      AtomicRewrite.rewrite(dest, dest + "/sig.parquet",
        inTxn = () => graft.util.Tombstones.clear(dest)) { tmp =>
        sigs.repartitionByRange(col("vec_id"))
          .sortWithinPartitions(col("vec_id"))
          .write.mode("overwrite").parquet(tmp)
      }
    }

  /** Build-if-absent-or-stale; returns the (vec_id, __w0..__w3) signature
    * table read from the store.
    */
  def ensureBuilt(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      buildAt(dest, Tables.embeddings(spark, sfDir))
      Stamp.write(dest, stamp)
    }
    read(spark, dest)
  }

  /** Incremental build-if-stale: 80% base build + appended batch +
    * compaction (the [[graft.search.BM25Index.ensureBuiltIncremental]]
    * pattern) — `q_ann_lsh_incr` serves from it with `q_ann_lsh`'s
    * oracle verbatim, putting append ≡ rebuild under the driver hash
    * gate. A rebuild wipes dest first.
    */
  def ensureBuiltIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = defaultDir(sfDir) + "__incr"
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      graft.search.StoreAdmin.truncate(dest)
      val emb = Tables.embeddings(spark, sfDir)
      buildAt(dest, emb.filter(col("vec_id") % 5 =!= 0))
      appendBatch(dest, emb.filter(col("vec_id") % 5 === 0))
      compact(spark, dest)
      Stamp.write(dest, stamp)
    }
    read(spark, dest)
  }

  /** STREAMED build-if-stale — the streaming loop closed for the ANN
    * family (`q_ann_lsh_stream`, round-15 verdict item 5): the 80% base
    * builds as usual, and the remaining 20% arrives through a real
    * Structured Streaming source (file-triggered micro-batches, one
    * file per trigger) feeding
    * [[graft.streaming.StreamSinks.annIngestSink]], whose per-batch
    * apply is this store's own [[upsertBatch]]. Serves with
    * `q_ann_lsh`'s oracle VERBATIM — streamed ingest ≡ batch build
    * exactly, because signatures are per-row and the sink's upserts
    * only add new ids. Compacted at the end like the __incr twin, so
    * the served scan is one sorted generation. Batch-boundary order is
    * irrelevant by construction (disjoint-id upserts commute).
    */
  def ensureBuiltStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = defaultDir(sfDir) + "__stream"
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      graft.search.StoreAdmin.truncate(dest)
      val emb = Tables.embeddings(spark, sfDir)
      buildAt(dest, emb.filter(col("vec_id") % 5 =!= 0))
      // the streamed 20%, staged as two source files → two micro-batches
      val staging = s"$dest/_stream_src"
      val late = emb.filter(col("vec_id") % 5 === 0)
      late.filter(col("vec_id") % 10 === 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/b0")
      late.filter(col("vec_id") % 10 =!= 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/b1")
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staging)
        .select(emb.columns.map(col): _*)
      val q = graft.streaming.StreamSinks.annIngestSink(stream, dest,
        s"$dest/_stream_ckpt", upsertBatch)
      try q.processAllAvailable() finally q.stop()
      compact(spark, dest)
      Stamp.write(dest, stamp)
    }
    read(spark, dest)
  }

  /** [[topK]] over explicit signature/vector frames — shared by the
    * stamped sfDir route and dest-level stores (lifecycle specs).
    */
  def topKOver(sigs: DataFrame, emb: DataFrame, queryId: Long, k: Int,
               radius: Int = Similarity.SrpRadius): DataFrame = {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(emb.sparkSession)
    val q = sigs.filter(col("vec_id") === queryId)
      .join(emb, "vec_id")
      .select((col("embedding").as("__qv") +:
        (0 until 4).map(w => col(s"__w$w").as(s"__qw$w"))): _*)
    sigs.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId &&
        Similarity.srpHamming("__w", "__qw") <= radius)
      .join(emb, "vec_id")
      .select(col("vec_id"),
        round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** [[Similarity.srpTopK]] served from the persisted store: identical
    * results (the signatures are deterministic), but the plan reads the
    * sketch parquet instead of recomputing 128 projections per row, and
    * only Hamming-ball survivors touch the vector column via the id-join.
    */
  def topK(spark: SparkSession, sfDir: String, queryId: Long, k: Int,
           radius: Int = Similarity.SrpRadius): DataFrame =
    topKOver(ensureBuilt(spark, sfDir), Tables.embeddings(spark, sfDir),
      queryId, k, radius)
}
