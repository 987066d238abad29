package graft.queries

import graft.similarity.Similarity
import graft.util.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity-search coverage over `embeddings` (64-dim float vectors):
  * exact cosine top-k, sign-LSH bucketed ANN, per-vector stats.
  */
object SimilarityQueries extends QueryPack {

  /** DuckDB sign-bucket expression matching [[Similarity.signBucket]]. */
  private val bucketSql: String =
    (0 until 8).map(i =>
      s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")

  private def cosSql(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(list_zip(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])), x -> x[1] * x[2])) /
       |  (sqrt(list_sum(list_transform(CAST($a AS DOUBLE[]), x -> x * x))) *
       |   sqrt(list_sum(list_transform(CAST($b AS DOUBLE[]), x -> x * x)))), 6)""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 10)),

    "q_ann_lsh" -> ((s, dir) =>
      Similarity.annTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5)),

    "q_embedding_stats" -> ((s, dir) =>
      Similarity.vectorStats(Tables.embeddings(s, dir), "vec_id", "embedding",
        extraCols = Seq("label"))),

    "q_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, nCentroids = 8)),

    // Multi-probe repair for the single-bucket LSH miss mode q_ann_recall
    // measures: probe the query bucket plus all 8 Hamming-1 buckets.
    "q_ann_multiprobe" -> ((s, dir) =>
      Similarity.annTopKMultiProbe(Tables.embeddings(s, dir), "vec_id",
        "embedding", queryId = 0L, k = 5)),

    // All-pairs cosine is the LABELED BASELINE cross-check for the
    // bucketed row; its input is CAPPED (vec_id < 500) so the crossJoin
    // stays constant-size as SF grows — the uncapped scale path is
    // q_dedup_embedding_bucketed. Oracle applies the identical cap.
    "q_dedup_embedding" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(
        Tables.embeddings(s, dir).filter(col("vec_id") < 500),
        "vec_id", "embedding", threshold = 0.45)),

    // Two full Lloyd iterations (assign → decimal-mean update → reassign),
    // k=8, hash-checked end-to-end — the oracle replays the identical
    // deterministic iteration.
    "q_kmeans" -> ((s, dir) =>
      Similarity.kmeansAssign(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 2)),

    // The scale path: same threshold semantics, candidates pruned to
    // same-sign-bucket pairs (recall < 1 by design — see the operator's
    // Scaladoc; the oracle mirrors the pruning exactly, so the entry is
    // hash-checked, and SimilaritySpec quantifies recall vs the exact pairs).
    "q_dedup_embedding_bucketed" -> ((s, dir) =>
      Similarity.cosineNearDupPairsBucketed(Tables.embeddings(s, dir), "vec_id",
        "embedding", threshold = 0.45)),

    // Embedding-space drift: pairwise cosine between per-label centroids.
    "q_centroid_sim" -> ((s, dir) =>
      Similarity.labelCentroidSimilarity(Tables.embeddings(s, dir),
        "label", "embedding")),

    // MEASURED recall@10 of both ANN methods against the exact brute-force
    // top-10 — the accuracy/cost tradeoff the operators' Scaladocs claim
    // analytically, recorded as data: |approx ∩ exact| / k per method.
    "q_ann_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        queryId = 0L, k = 10).select(col("vec_id"))
      def recallOf(method: String, cand: DataFrame): DataFrame =
        cand.select(col("vec_id")).join(truth, "vec_id")
          .agg(count(lit(1)).cast("long").as("hits"))
          .select(lit(method).as("method"), col("hits"),
            lit(10L).as("k"),
            round(col("hits").cast("double") / 10.0, 6).as("recall"))
      recallOf("lsh", Similarity.annTopK(e, "vec_id", "embedding",
          queryId = 0L, k = 10))
        .unionByName(recallOf("lsh_mp", Similarity.annTopKMultiProbe(e, "vec_id",
          "embedding", queryId = 0L, k = 10)))
        .unionByName(recallOf("ivf", Similarity.ivfTopK(e, "vec_id", "embedding",
          queryId = 0L, k = 10, nCentroids = 8)))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_centroid_sim" ->
      """WITH c AS (SELECT label, i AS pos, embedding[i + 1] AS x
        |  FROM (SELECT label, embedding, unnest(range(0, len(embedding))) AS i
        |        FROM embeddings)),
        |cent AS (SELECT label, pos,
        |    CAST(SUM(CAST(x AS DECIMAL(20,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mu
        |  FROM c GROUP BY 1, 2),
        |nrm AS (SELECT label,
        |    sqrt(CAST(SUM(CAST(round(mu * mu, 12) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
        |  FROM cent GROUP BY label),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(SUM(CAST(round(a.mu * b.mu, 12) AS DECIMAL(38,12))) AS DOUBLE) AS dot
        |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT d.label_a, d.label_b,
        |  round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
        |FROM dots d JOIN nrm na ON d.label_a = na.label
        |JOIN nrm nb ON d.label_b = nb.label""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${cosSql("embedding", "qv")} AS cosine
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket FROM b WHERE vec_id = 0)
         |SELECT vec_id, ${cosSql("embedding", "qv")} AS cosine
         |FROM b JOIN q USING (bucket) WHERE vec_id <> 0
         |ORDER BY cosine DESC, vec_id ASC LIMIT 5""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |sim AS (SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS s
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cid AS cluster FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         |  FROM sim) WHERE rn = 1),
         |q AS (SELECT embedding AS qv, cluster FROM assigned WHERE vec_id = 0)
         |SELECT a.vec_id, ${cosSql("a.embedding", "qv")} AS cosine
         |FROM assigned a JOIN q USING (cluster) WHERE a.vec_id <> 0
         |ORDER BY cosine DESC, vec_id ASC LIMIT 5""".stripMargin,

    "q_ann_multiprobe" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket FROM b WHERE vec_id = 0),
         |probes AS (SELECT qv, xor(bucket, f) AS bucket
         |  FROM q, (VALUES (0),(1),(2),(4),(8),(16),(32),(64),(128)) t(f))
         |SELECT vec_id, ${cosSql("embedding", "qv")} AS cosine
         |FROM b JOIN probes USING (bucket) WHERE vec_id <> 0
         |ORDER BY cosine DESC, vec_id ASC LIMIT 5""".stripMargin,

    "q_dedup_embedding" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 500 AND b.vec_id < 500
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.45""".stripMargin,

    "q_dedup_embedding_bucketed" ->
      s"""WITH bk AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45""".stripMargin,

    "q_kmeans" -> {
      // cosSql's CAST(x AS DOUBLE[]) is a no-op here (emb.v is already
      // DOUBLE[]) — the shared helper keeps the formula single-sourced
      def assignCte(out: String, centsCte: String): String =
        s"""s_$out AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS s
           |  FROM emb e CROSS JOIN $centsCte c),
           |$out AS (SELECT vec_id, v, cluster, s FROM (
           |  SELECT vec_id, v, cid AS cluster, s, row_number() OVER (PARTITION BY vec_id
           |    ORDER BY s DESC, cid ASC) AS rn FROM s_$out) WHERE rn = 1)""".stripMargin
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, v AS cv FROM emb
         |  ORDER BY vec_id ASC LIMIT 8),
         |${assignCte("a1", "c0")},
         |u1 AS (SELECT cluster AS cid, pos,
         |    round(CAST(SUM(CAST(v[pos] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS m
         |  FROM (SELECT cluster, v, unnest(range(1, len(v) + 1)) AS pos FROM a1)
         |  GROUP BY cluster, pos),
         |c1 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM u1 GROUP BY cid),
         |${assignCte("a2", "c1")}
         |SELECT vec_id, cluster, s AS centroid_sim FROM a2""".stripMargin
    },

    "q_embedding_stats" ->
      s"""SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
         |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
         |  $bucketSql AS bucket
         |FROM embeddings""".stripMargin,

    "q_ann_recall" ->
      s"""WITH truth AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${cosSql("embedding", "qv")} AS cosine
         |  FROM embeddings, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |  WHERE vec_id <> 0 ORDER BY cosine DESC, vec_id ASC LIMIT 10)),
         |b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |lq AS (SELECT embedding AS qv, bucket FROM b WHERE vec_id = 0),
         |lsh AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${cosSql("embedding", "qv")} AS cosine
         |  FROM b JOIN lq USING (bucket) WHERE vec_id <> 0
         |  ORDER BY cosine DESC, vec_id ASC LIMIT 10)),
         |probes AS (SELECT qv, xor(bucket, f) AS bucket
         |  FROM lq, (VALUES (0),(1),(2),(4),(8),(16),(32),(64),(128)) t(f)),
         |lshmp AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${cosSql("embedding", "qv")} AS cosine
         |  FROM b JOIN probes USING (bucket) WHERE vec_id <> 0
         |  ORDER BY cosine DESC, vec_id ASC LIMIT 10)),
         |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |sim AS (SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cid AS cluster FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         |  FROM sim) WHERE rn = 1),
         |iq AS (SELECT embedding AS qv, cluster FROM assigned WHERE vec_id = 0),
         |ivf AS (SELECT vec_id FROM (
         |  SELECT a.vec_id, ${cosSql("a.embedding", "qv")} AS cosine
         |  FROM assigned a JOIN iq USING (cluster) WHERE a.vec_id <> 0
         |  ORDER BY cosine DESC, vec_id ASC LIMIT 10))
         |SELECT 'lsh' AS method, CAST(COUNT(*) AS BIGINT) AS hits, CAST(10 AS BIGINT) AS k,
         |  round(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
         |FROM lsh JOIN truth USING (vec_id)
         |UNION ALL
         |SELECT 'lsh_mp' AS method, CAST(COUNT(*) AS BIGINT) AS hits, CAST(10 AS BIGINT) AS k,
         |  round(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
         |FROM lshmp JOIN truth USING (vec_id)
         |UNION ALL
         |SELECT 'ivf' AS method, CAST(COUNT(*) AS BIGINT) AS hits, CAST(10 AS BIGINT) AS k,
         |  round(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
         |FROM ivf JOIN truth USING (vec_id)""".stripMargin
  )
}
