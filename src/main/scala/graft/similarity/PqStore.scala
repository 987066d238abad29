package graft.similarity

import graft.util.{Stamp, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent product-quantization index — codebooks + codes written ONCE
  * (the [[graft.search.BM25Index]] / [[SrpStore]] / [[IvfStore]]
  * build-once split applied to PQ): serving reads the m-byte-per-vector
  * `codes` table and a broadcast-sized codebook, never re-training and
  * never scanning raw floats for the ADC pass — which is the whole point
  * of PQ at 100 TB (the ad-hoc [[Similarity.pqTopK]] re-trains the
  * codebook per query, the right shape only for one-off analytics).
  * Raw vectors are touched only by the exact rerank of the top
  * candidates, via an id join.
  *
  * Layout: `codebook.parquet` (s, cid, cv — m × ksub rows),
  * `codes.parquet` (vid, s, cid — m small rows per vector; at true scale
  * pivot to a packed byte array per vector and bucket by vid).
  * Freshness follows the family's (name, size, mtime) stamp.
  */
object PqStore {

  val M = 8
  val Ksub = 8

  def defaultDir(sfDir: String): String = {
    val root = sys.env.getOrElse("GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/target/pq-store-v1")
    root + "/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
  }

  /** Build-if-absent-or-stale; returns the store directory. */
  def ensureBuilt(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      val (_, codebook, codes, _) = Similarity.pqModel(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", M, Ksub)
      codebook.coalesce(1)
        .write.mode("overwrite").parquet(s"$dest/codebook.parquet")
      codes.repartition(col("vid"))
        .write.mode("overwrite").parquet(s"$dest/codes.parquet")
      Stamp.write(dest, stamp)
    }
    dest
  }

  /** [[Similarity.pqTopK]] served from the persisted codebook + codes —
    * identical ranking (the scoring is the shared [[Similarity.pqServe]];
    * the artifacts are deterministic), but the per-query cost is the
    * codes scan + LUT build, not a codebook re-train.
    */
  def topK(spark: SparkSession, sfDir: String, queryId: Long, k: Int,
           rerank: Int = 40): DataFrame = {
    val dest = ensureBuilt(spark, sfDir)
    val codebook = spark.read.parquet(s"$dest/codebook.parquet")
    val codes = spark.read.parquet(s"$dest/codes.parquet")
    val withVd = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val sd = codebook.select(size(col("cv"))).head().getInt(0)
    Similarity.pqServe(withVd, codebook, codes, queryId, k, rerank, M, sd,
      "vec_id")
  }

  /** [[Similarity.pqTopKMulti]] over the persisted artifacts — the
    * recall audit's served twin: every id < `maxQid` queries the stored
    * codebook + codes at once; raw vectors only for the exact rerank.
    */
  def topKMulti(spark: SparkSession, sfDir: String, maxQid: Long, k: Int,
                rerank: Int = 40): DataFrame = {
    val dest = ensureBuilt(spark, sfDir)
    val codebook = spark.read.parquet(s"$dest/codebook.parquet")
    val codes = spark.read.parquet(s"$dest/codes.parquet")
    val withVd = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val sd = codebook.select(size(col("cv"))).head().getInt(0)
    Similarity.pqTopKMulti(withVd, codebook, codes, maxQid, k, rerank, M, sd)
  }
}
