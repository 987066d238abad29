package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources and sinks covering the reference's scan surface (SURVEY.md §2.1).
  */
object Readers {

  /** Multiline-JSON scan with schema inference — the reference's tweet-file
    * ingest (`spark.read.json(f, multiLine=True)`,
    * `Tweets_preprocessing.py:103`). Each input file is one JSON array.
    */
  def multilineJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", value = true).json(path)

  /** Same scan with a declared schema — the 100 TB path: no inference pass,
    * and empty struct-arrays keep their struct element type.
    */
  def multilineJson(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("multiLine", value = true).schema(schema).json(path)

  /** Ordered multi-file batch source: the reference replays 2-hour batch
    * files in event-time order via an epoch embedded in the filename
    * (`order_file_list`, `Tweets_preprocessing.py:58-79`). Spark-first
    * version: read the whole directory at once and order by the embedded
    * epoch — one distributed job instead of a sequential driver loop; at
    * scale the ordering column also serves as the watermark source for the
    * Structured Streaming variant (file source, `latestFirst=false`).
    */
  def orderedFileBatches(spark: SparkSession, dir: String): DataFrame =
    multilineJson(spark, dir)
      .withColumn("__file", input_file_name())
      // epoch from the file *name* only — directories may contain digit runs
      .withColumn("__file_epoch",
        regexp_extract(element_at(split(col("__file"), "/"), -1),
          "(\\d{10,13})", 1).cast("long"))
      .orderBy(col("__file_epoch").asc, col("__file").asc)

  /** Header CSV scan — the name-based (saner) replacement for the
    * reference's positional opencsv reader (`SolrIndexer.java:84-113`).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", value = true).csv(path)

  /** Positional CSV scan — the reference indexer's actual contract
    * (`SolrIndexer.java:90-113`: fields consumed by column INDEX —
    * `row[1]`, `row[2]`, … — regardless of header text). The supplied
    * schema is applied by position (`enforceSchema`): the file's header row
    * is skipped, its names ignored, exactly like opencsv's indexed access.
    */
  def csvPositional(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType,
                    header: Boolean = true): DataFrame =
    spark.read
      .option("header", header)
      .option("enforceSchema", value = true)
      .schema(schema)
      .csv(path)

  /** ORC scan — second columnar format beside parquet; same pushdown and
    * pruning behavior through the native reader.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Malformed-record-tolerant JSON scan: PERMISSIVE mode routes corrupt
    * lines into `_corrupt_record` instead of failing the job — required for
    * any real 100 TB ingest where some fraction of records is always bad.
    */
  def jsonWithCorrupt(spark: SparkSession, path: String,
                      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
  }
}

object Sinks {

  /** Single-file Parquet (`Tweets_preprocessing.py:487`). The coalesce(1)
    * mirrors the reference's one-file contract; omit it at scale.
    */
  def parquetSingleFile(df: DataFrame, dest: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(dest)

  /** Bucketed table write: pre-hash-partitions the data by the join/agg key
    * so downstream equi-joins and aggregations on that key are
    * shuffle-free — the engine's stand-in for Solr's sharded collections
    * (`solr create -c tweets -s 2`, `Ranking Model/README.md:8-9`) and the
    * scale plan for the serving tables (SCALE.md).
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** ORC sink. */
  def orc(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").orc(dest)

  /** Range-clustered layout: repartitionByRange + sortWithinPartitions on
    * the clustering keys before writing parquet. Each output file then
    * covers a narrow, non-overlapping key range, so parquet footer min/max
    * stats prune FILES (and row groups within them) for range predicates
    * on those keys — the sort-based data-clustering technique lakehouse
    * tables call Z-ordering's single-dimension case. The write itself is
    * one range-partitioning shuffle; no global sort node survives in the
    * plan. `PartitioningSpec` proves the pruning: a range predicate scans
    * fewer files than the unclustered layout.
    */
  def rangeClustered(df: DataFrame, dest: String, numFiles: Int,
                     clusterCols: Seq[String]): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(dest)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(total-bytes / targetFileBytes) files. Streaming sinks, per-key
    * upserts and fine-grained partitioned writes all accumulate small
    * files, and at 100 TB the file count itself becomes the bottleneck
    * (driver-side listing, task-per-file scheduling, footer overhead) —
    * periodic compaction is the standard maintenance pass (lakehouse
    * OPTIMIZE). The rewrite is one job: read → repartition(n) → write to
    * a temp dir, then swap. The swap uses local-FS moves (this harness);
    * on an object store the same shape runs as write-new + atomic
    * pointer/manifest flip — rename is NOT atomic there, which is exactly
    * why table formats exist (see `Collections.upsert` note in SCALE.md).
    * Hive-partitioned layouts (name=value subdirectories) are compacted
    * per partition directory, preserving the tree and its pruning.
    * Returns the output file count (summed across partitions).
    */
  def compactFiles(spark: SparkSession, dir: String,
                   targetFileBytes: Long): Int = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    def walk[A](p: Path)(f: java.util.stream.Stream[Path] => A): A = {
      val s = Files.walk(p)
      try f(s) finally s.close()
    }
    def list(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val root = Paths.get(dir)
    // Hive-partitioned layout (name=value subdirectories): compact each
    // partition directory IN PLACE and keep the directory tree — a flat
    // rewrite would delete the date=.../ dirs, bake the partition column
    // into flat files, and silently break every consumer that reads a
    // partition subpath or relies on pruning.
    val partDirs = list(root).filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.contains("="))
    if (partDirs.nonEmpty)
      return partDirs.sorted.map(p =>
        compactFiles(spark, p.toString, targetFileBytes)).sum
    val totalBytes = walk(root)(_.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(Files.size).sum)
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = dir.stripSuffix("/") + "__compact_tmp"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    // local-FS swap: remove old dir, move compacted into place
    walk(root)(_.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete))
    Files.move(Paths.get(tmp), root)
    nFiles
  }

  /** JSON-Lines sink — the lingua-franca export format of training-data
    * pipelines (one JSON object per line; each output file is a valid
    * JSONL shard). Optionally gzip-compressed; sharding follows the
    * DataFrame's partitioning, so `repartition(n)` upstream controls the
    * shard count and a partitioned write stays embarrassingly parallel.
    */
  def jsonl(df: DataFrame, dest: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(dest)
  }

  /** Hive-style partitioned write: one directory per partition value, so a
    * filter on the partition column prunes entire directories at planning
    * time (`PartitionFilters` in the scan — see PartitioningSpec). The
    * date/source/bucket columns of the big tables are the natural keys.
    */
  def partitionedTable(df: DataFrame, dest: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dest)

  /** CSV sink with the reference's scrubbing (`Tweets_preprocessing.py:490-505`):
    * ids cast to string (CSV precision), newlines → '|', double quotes →
    * single, arrays stringified. Arrays use Python-repr format
    * ("['a', 'b']") for byte parity with the reference's
    * `convert_array_tostring` UDF; empty arrays become "[]". Null arrays:
    * kept null by default (the sane choice — readers see a missing value);
    * set `nullArraysAsNone = true` for byte parity with the reference UDF,
    * which emits the literal string "None"
    * (`Tweets_preprocessing.py:90-94`).
    */
  def csvScrubbed(df: DataFrame, dest: String,
                  idCols: Seq[String], textCols: Seq[String],
                  arrayCols: Seq[String],
                  nullArraysAsNone: Boolean = false): Unit = {
    val withIds = idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("string")))
    val withText = textCols.foldLeft(withIds)((d, c) =>
      d.withColumn(c, regexp_replace(regexp_replace(col(c), "[\\n\\r]", "|"), "\"", "'")))
    val nullRepr =
      if (nullArraysAsNone) lit("None") else lit(null).cast("string")
    val withArrays = arrayCols.foldLeft(withText)((d, c) =>
      d.withColumn(c,
        when(col(c).isNull, nullRepr)
          .when(size(col(c)) === 0, lit("[]"))
          .otherwise(concat(lit("['"), concat_ws("', '", col(c)), lit("']")))))
    withArrays.coalesce(1).write.mode("overwrite")
      .option("header", value = true).csv(dest)
  }
}
