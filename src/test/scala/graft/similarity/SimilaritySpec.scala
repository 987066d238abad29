package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to query
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite
    (4L, Array(1.0f, 1.0f, 0.0f, 0.0f))    // 45 degrees
  ).toDF("vec_id", "embedding")

  test("cosine extremes: identical=1, orthogonal=0, opposite=-1") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top(1L) == 1.0)
    assert(top(2L) == 0.0)
    assert(top(3L) == -1.0)
    assert(math.abs(top(4L) - math.sqrt(0.5)) < 1e-6)
  }

  test("topk ordering is by cosine desc then id") {
    val order = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(_.getLong(0)).toSeq
    assert(order == Seq(1L, 4L, 2L, 3L))
  }

  test("ann restricts candidates to the query's sign bucket") {
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding", 0L, 10, dims = 4)
      .collect().map(_.getLong(0)).toSet
    // bucket(query)=bit0 → ids 1 (identical) and 4 (bit0|bit1 differs!) —
    // vec 4 has dims 0 and 1 positive → different bucket; only vec 1 shares.
    assert(ann == Set(1L))
  }

  test("multi-probe ann ⊇ single-bucket ann; Hamming-1 buckets recover near misses") {
    val single = Similarity.annTopK(vecs, "vec_id", "embedding", 0L, 10, dims = 4)
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.annTopKMultiProbe(vecs, "vec_id", "embedding", 0L, 10,
      dims = 4).collect().map(_.getLong(0)).toSet
    assert(single.subsetOf(multi))
    // vec 4 (dims 0,1 positive) sits one sign bit from the query's bucket —
    // invisible to the single probe, recovered by the Hamming-1 ring
    assert(multi.contains(4L) && !single.contains(4L))
  }

  test("bucketed near-dup pairs: precision exact, recall = same-bucket subset") {
    val exact = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bucketed = Similarity.cosineNearDupPairsBucketed(vecs, "vec_id", "embedding",
      0.7, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every bucketed pair is a true pair with the identical exact cosine
    assert(bucketed.subsetOf(exact))
    // same-bucket near-dups are found: 0 and 1 are identical vectors
    assert(bucketed.contains((0L, 1L, 1.0)))
    // the documented recall loss: (0,4) has cosine ~0.707 ≥ 0.7 but vec 4's
    // sign bucket differs (dim 1 positive) — pruned by construction
    assert(exact.exists(p => p._1 == 0L && p._2 == 4L))
    assert(!bucketed.exists(p => p._1 == 0L && p._2 == 4L))
  }

  test("kmeans separates two obvious direction clusters and refines centroids") {
    // ids 0,1 seed the two clusters; 2,3 near axis-x, 4,5 near axis-y
    val pts = Seq(
      (0L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.0f)), (3L, Array(1.0f, -0.1f)),
      (1L, Array(0.1f, 1.0f)), (4L, Array(0.0f, 0.9f)), (5L, Array(-0.1f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(pts, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byCluster = out.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    assert(byCluster(0L) == Set(0L, 2L, 3L))
    assert(byCluster(1L) == Set(1L, 4L, 5L))
    // after refinement every member sits close to its centroid direction
    assert(out.forall(_._3 > 0.9))
  }

  test("vector stats: norms and buckets") {
    val stats = Similarity.vectorStats(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("dim"), r.getAs[Double]("l2_norm"))).toMap
    assert(stats(0L) == (4L, 1.0))
    assert(math.abs(stats(4L)._2 - math.sqrt(2)) < 1e-6)
  }

  test("labelCentroidSimilarity: aligned centroids -> 1, orthogonal -> 0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(3.0f, 0.0f), 0),   // label 0 centroid = (2, 0)
      (3L, Array(0.0f, 2.0f), 1),   // label 1 centroid = (0, 2): orthogonal
      (4L, Array(0.0f, 2.0f), 1),
      (5L, Array(4.0f, 0.0f), 2)    // label 2 centroid = (4, 0): aligned w/ 0
    ).toDF("vec_id", "embedding", "label")
    val sims = Similarity.labelCentroidSimilarity(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(sims((0, 1)) == 0.0)
    assert(sims((0, 2)) == 1.0)
    assert(sims((1, 2)) == 0.0)
  }
}
