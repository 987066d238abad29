package graft.similarity

import graft.util.{AtomicRewrite, Stamp, StoreLock, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SRP sketch store PARTITIONED BY THE FILTER COLUMN — the physical
  * escalation for filtered vector search that `q_ann_filtered_recall`'s
  * tripwire pointed at (round-14 verdict item 6): a predicate riding the
  * sketch scan ([[Similarity.srpTopKFiltered]]) degrades recall for RARE
  * strata, because the Hamming ball is filter-agnostic — few
  * same-stratum vectors survive it, so the filtered top-k starves
  * precisely where the filter matters most. Widening the radius recovers
  * recall but, on a flat layout, pays a bigger scan.
  *
  * Partitioning the signature table BY the filter column breaks that
  * trade: a label-filtered query prunes the scan to ONE label's
  * partition directory at planning time (the label is a
  * serving-boundary literal, like the IVF probe cluster), so the store
  * can afford a WIDER radius — more same-label candidates — while
  * reading FEWER bytes than the flat shape reads at the narrow radius
  * (one label's rows ≤ N, always). This is the vector-DB
  * filtered-search playbook (partition/shard by tenant or metadata key;
  * FAISS IDSelector over per-shard indexes; the engine's
  * `q_bucket_pruning`/`q_zorder` layout story applied to ANN), measured
  * per stratum by `q_ann_filtered_recall_part`.
  *
  * Maintenance lifecycle: [[SrpStore]]'s flat-family contract with the
  * label riding as the partition column — per-row signatures mean
  * append ≡ rebuild exactly; upsert/delete via the shared
  * [[graft.util.Tombstones]]; [[compact]] folds each label partition to
  * one vid-sorted generation atomically under the staleness stamp.
  * A label edit is an upsert (the new row lands in the new label's
  * partition; the tombstone kills the old row wherever it lives —
  * tombstones are id-keyed, not partition-keyed).
  */
object SrpLabelStore {

  def defaultDir(sfDir: String): String = {
    graft.util.StoreDirs.resolve("srp-label-v1", sfDir)
  }

  // label leads the sort so the dynamic-partition writer's required
  // ordering is pre-satisfied; within a partition vid-sorted for
  // row-group pruning of point reads
  private def writeSigs(embWithLabel: DataFrame, path: String, mode: String,
                        gen: Long): Unit =
    Similarity.srpSignature(embWithLabel, "embedding")
      .select(col("vec_id"), col("__w0"), col("__w1"), col("__w2"),
        col("__w3"), col("label"))
      .withColumn("__gen", lit(gen))
      .repartition(col("label"))
      .sortWithinPartitions(col("label"), col("vec_id"))
      .write.mode(mode).partitionBy("label").parquet(path)

  def buildAt(dest: String, embeddings: DataFrame): Unit = {
    graft.util.Tombstones.clear(dest)
    writeSigs(embeddings, s"$dest/sig.parquet", "overwrite", gen = 0L)
  }

  /** Append a NEW batch — exact by construction (per-row signatures). */
  def appendBatch(dest: String, batch: DataFrame): Unit =
    StoreLock.withLock(dest, "append") {
      writeSigs(batch, s"$dest/sig.parquet", "append",
        graft.util.Tombstones.nextGen(dest))
    }

  /** Id-keyed overwrite; handles label EDITS (the tombstone is id-keyed,
    * so the old row dies in its old partition and the new one lands in
    * the new label's directory).
    */
  def upsertBatch(spark: SparkSession, dest: String, batch: DataFrame): Unit =
    StoreLock.withLock(dest, "append") {
      val gen = graft.util.Tombstones.nextGen(dest)
      graft.util.Tombstones.write(batch.select(col("vec_id")), dest, gen)
      writeSigs(batch, s"$dest/sig.parquet", "append", gen)
    }

  /** Tombstone-only delete; purged at the next [[compact]]. */
  def deleteIds(spark: SparkSession, dest: String, ids: Seq[Long]): Unit =
    StoreLock.withLock(dest, "append") {
      import spark.implicits._
      graft.util.Tombstones.write(ids.toDF("vec_id"), dest,
        graft.util.Tombstones.nextGen(dest))
    }

  /** Live signatures (vec_id, __w0..3, label) — dead generations
    * dropped, `__gen` stripped.
    */
  def read(spark: SparkSession, dest: String): DataFrame =
    graft.util.Tombstones.dropDead(spark, dest,
      spark.read.parquet(s"$dest/sig.parquet"), "vec_id").drop("__gen")

  /** Fold each label partition to one vid-sorted generation with
    * tombstoned rows purged; atomic under the staleness stamp.
    */
  def compact(spark: SparkSession, dest: String): Unit =
    StoreLock.withLock(dest, "compact") {
      val sigs = read(spark, dest).withColumn("__gen", lit(0L))
      AtomicRewrite.rewrite(dest, s"$dest/sig.parquet",
        inTxn = () => graft.util.Tombstones.clear(dest)) { tmp =>
        sigs.repartition(col("label"))
          .sortWithinPartitions(col("label"), col("vec_id"))
          .write.mode("overwrite").partitionBy("label").parquet(tmp)
      }
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

  /** [[Similarity.srpTopKFiltered]] (pred = same label as the query)
    * served from the partitioned store: identical results, but the
    * sketch scan reads ONE label partition — the query's label is a
    * serving-boundary point read that becomes the partition-pruning
    * literal (plan-asserted in the lifecycle spec).
    */
  def topKFilteredAt(spark: SparkSession, dest: String, emb: DataFrame,
                     queryId: Long, k: Int,
                     radius: Int = Similarity.SrpRadius): DataFrame = {
    val qLabel = emb.filter(col("vec_id") === queryId)
      .select(col("label")).head().getInt(0)
    val sigs = read(spark, dest)
      .filter(col("label") === lit(qLabel))
      .drop("label")
    SrpStore.topKOver(sigs, emb, queryId, k, radius)
  }

  def topKFiltered(spark: SparkSession, sfDir: String, queryId: Long, k: Int,
                   radius: Int = Similarity.SrpRadius): DataFrame =
    topKFilteredAt(spark, ensureBuilt(spark, sfDir),
      Tables.embeddings(spark, sfDir), queryId, k, radius)
}
