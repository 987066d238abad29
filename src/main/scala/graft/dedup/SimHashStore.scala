package graft.dedup

import graft.util.{Stamp, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent SimHash signature store — the near-dup analogue of the BM25
  * serving index ([[graft.search.BM25Index]]'s build-once split): the
  * (doc, simhash) table is computed from the corpus ONCE and every
  * consumer (pair mining, cluster resolution, degree audits, near-dup
  * curation) reads the 8-byte-per-doc signatures instead of re-tokenizing
  * and re-hashing the text. At 100 TB that is the only sane shape — the
  * signature pass is a full corpus scan, the consumers' band joins touch
  * kilobytes per doc; write the store bucketed by the band byte and the
  * probe joins prune to single buckets
  * ([[Dedup.simHashIncremental]] reads the same layout).
  *
  * Freshness follows the index pattern: a (name, size, mtime) stamp of the
  * source parquet — a regenerated corpus forces a rebuild, repeated runs
  * within one suite reuse the artifact.
  */
object SimHashStore {

  def defaultDir(sfDir: String): String = {
    val root = sys.env.getOrElse("GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/target/simhash-sig-v1")
    root + "/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
  }

  /** Build-if-absent-or-stale; returns the signature DataFrame read from
    * the store (so every consumer's plan starts at an 8-byte-per-row
    * parquet scan, not a corpus tokenize).
    */
  def ensureBuilt(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = defaultDir(sfDir)
    val sigPath = dest + "/sig.parquet"
    val stamp = Stamp.sourceStamp(sfDir)
    if (!Stamp.isFresh(dest, stamp)) {
      Dedup.simHash(Tables.documents(spark, sfDir), "doc_id", "text")
        .write.mode("overwrite").parquet(sigPath)
      Stamp.write(dest, stamp)
    }
    spark.read.parquet(sigPath)
  }

  /** Append a NEW doc batch's signatures at batch cost — exact by
    * construction (a doc's 64-bit SimHash depends only on its own
    * tokens), so the appended store is value-equal to a rebuild over the
    * union. Batch ids must be new (dedup upstream — the family's
    * add-without-delete contract; the STREAMING face of this append,
    * with the near-dup gate in front, is
    * [[graft.streaming.StreamSinks.nearDupFilterSink]]).
    */
  def appendBatch(dest: String, batch: DataFrame, idCol: String,
                  textCol: String): Unit =
    Dedup.simHash(batch, idCol, textCol)
      .write.mode("append").parquet(dest + "/sig.parquet")

  /** Fold accumulated appended files into one doc-sorted generation —
    * bounded file count, doc min/max row-group stats restored. Atomic
    * under the staleness stamp ([[graft.util.AtomicRewrite]]).
    */
  def compact(spark: SparkSession, dest: String): Unit = {
    val sigs = spark.read.parquet(dest + "/sig.parquet")
    graft.util.AtomicRewrite.rewrite(dest, dest + "/sig.parquet") { tmp =>
      sigs.repartitionByRange(col("doc"))
        .sortWithinPartitions(col("doc"))
        .write.mode("overwrite").parquet(tmp)
    }
  }
}
