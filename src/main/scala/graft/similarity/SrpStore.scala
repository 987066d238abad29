package graft.similarity

import graft.util.{Stamp, Tables}
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
  * Freshness follows the family pattern: a (name, size, mtime) stamp of
  * the source parquet; repeated suite runs reuse the artifact, a
  * regenerated corpus forces a rebuild.
  */
object SrpStore {

  def defaultDir(sfDir: String): String = {
    val root = sys.env.getOrElse("GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/target/srp-sig-v1")
    root + "/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
  }

  /** Build-if-absent-or-stale; returns the (vec_id, __w0..__w3) signature
    * table read from the store.
    */
  def ensureBuilt(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = defaultDir(sfDir)
    val sigPath = dest + "/sig.parquet"
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      Similarity.srpSignature(Tables.embeddings(spark, sfDir), "embedding")
        .select(col("vec_id"), col("__w0"), col("__w1"), col("__w2"), col("__w3"))
        .write.mode("overwrite").parquet(sigPath)
      Stamp.write(dest, stamp)
    }
    spark.read.parquet(sigPath)
  }

  /** [[Similarity.srpTopK]] served from the persisted store: identical
    * results (the signatures are deterministic), but the plan reads the
    * sketch parquet instead of recomputing 128 projections per row, and
    * only Hamming-ball survivors touch the vector column via the id-join.
    */
  def topK(spark: SparkSession, sfDir: String, queryId: Long, k: Int,
           radius: Int = Similarity.SrpRadius): DataFrame = {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val sigs = ensureBuilt(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
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
}
