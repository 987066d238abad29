package graft.layout

import graft.util.{Stamp, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the table-maintenance member of the layout
  * family ([[BucketStore]] co-locates, [[ZOrder]] clusters, this one
  * RIGHT-SIZES): a table fragmented into many small files (the streaming
  *-sink / over-parallel-write pathology; at 100 TB it means listing
  * millions of footers and starving scans with sub-split files) is
  * rewritten into few RANGE-SORTED files, so post-compaction scans get
  * both fewer files and min/max-prunable clustering on the sort key.
  *
  * The audit is in-plan and engine-observable: file counts come from
  * `input_file_name()` over the actual directories (not from listing —
  * the same evidence a Spark scan sees), with row counts and an exact
  * id checksum proving the rewrite lost nothing.
  */
object Compaction {

  val SmallFiles = 16
  val CompactedFiles = 4

  def defaultDir(sfDir: String): String = {
    graft.util.StoreDirs.resolve("compaction-v1", sfDir)
  }

  /** Build-if-stale: a fragmented copy of `documents` (SmallFiles files)
    * and its compacted rewrite (CompactedFiles range-sorted files).
    */
  def ensureBuilt(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "documents.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      val docs = Tables.documents(spark, sfDir)
      docs.repartition(SmallFiles)
        .write.mode("overwrite").parquet(s"$dest/small.parquet")
      spark.read.parquet(s"$dest/small.parquet")
        .repartitionByRange(CompactedFiles, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").parquet(s"$dest/compacted.parquet")
      Stamp.write(dest, stamp)
    }
    dest
  }

  /** Per-stage audit rows (stage, n_files, n_rows, sum_ids): equal rows
    * and checksum across stages with the pinned file counts is the
    * compaction contract.
    */
  def audit(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = ensureBuilt(spark, sfDir)
    def stage(name: String, path: String): DataFrame =
      spark.read.parquet(path)
        // project the (non-deterministic) file name BEFORE aggregating —
        // Spark forbids it directly inside an aggregate argument
        .select(input_file_name().as("__f"), col("doc_id"))
        .agg(
          countDistinct(col("__f")).as("n_files"),
          count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_ids"))
        .select(lit(name).as("stage"), col("n_files"), col("n_rows"),
          col("sum_ids"))
    stage("small", s"$dest/small.parquet")
      .unionAll(stage("compacted", s"$dest/compacted.parquet"))
  }
}
