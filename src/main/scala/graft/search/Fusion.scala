package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — the operator a modern search/RAG
  * deployment puts between its retrievers and its reranker: the keyword
  * ranking (BM25, [[BM25]]) and the vector ranking (cosine ANN,
  * [[graft.similarity.Similarity]]) each see different evidence, and
  * reciprocal-rank fusion (Cormack et al., SIGIR 2009 — public method)
  * combines them using only RANKS, so the two scorers' incomparable
  * score scales never need calibration:
  *
  *   rrf(d) = Σ_r 1 / (k + rank_r(d)),   k = 60 in the published method.
  *
  * Scale shape: each input ranking is already top-N bounded (its own
  * TakeOrdered), so the fusion works on r × N rows — a per-id groupBy
  * over a few hundred rows regardless of corpus size; the heavy lifting
  * stays inside the retrievers, which is the point of fusing by rank.
  * Ranks are assigned with a deterministic (score desc, id asc) order,
  * and the fused output totally ordered the same way, so the result is
  * engine-exact (1/(k+rank) sums of identical rationals, rounded 6).
  */
object Fusion {

  /** Fuse rankings (each a (id, score) frame, higher score = better) by
    * reciprocal rank. Returns (id, rrf_score, n_lists) — n_lists = how
    * many input rankings surfaced the id (the agreement signal a
    * downstream filter often wants).
    */
  def rrf(rankings: Seq[(String, DataFrame)], idCol: String,
          scoreCol: String, k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf: need at least one ranking")
    require(k >= 1, "rrf: k must be >= 1")
    val ranked = rankings.map { case (_, df) =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      // the window is unpartitioned by design: each input is a top-N
      // bounded ranking (a few hundred rows), never a corpus-wide frame
      df.select(col(idCol), col(scoreCol))
        .withColumn("__rank", row_number().over(w))
        .select(col(idCol), col("__rank"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(
        round(sum(lit(1.0) / (lit(k) + col("__rank"))), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }
}
