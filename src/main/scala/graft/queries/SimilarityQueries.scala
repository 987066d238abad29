package graft.queries

import graft.similarity.{AnnMeta, IvfPqStore, IvfSq8Store, IvfStore, PqStore, RecallTruth, Similarity, Sq8Store, SrpLabelStore, SrpStore}
import graft.util.Checkpoints.CheckpointOps
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

  /** The 128 fixed ±1 SRP hyperplanes as a DuckDB VALUES literal — the SAME
    * constants [[Similarity.srpPlane]] bakes into the Spark plan, so both
    * engines project against bit-identical ±1 entries and every signature
    * bit (a sign of a sequential double sum) is engine-exact.
    */
  private val planesSql: String =
    (0 until Similarity.SrpBits).map { j =>
      val vals = Similarity.srpPlane(j).map(v => if (v > 0) "1.0" else "-1.0").mkString(",")
      s"($j, [$vals]::DOUBLE[])"
    }.mkString("planes AS (SELECT * FROM (VALUES ", ", ", ") p(j, r))")

  /** Shared signature CTEs: per-vector dot against each plane, then the
    * 4 × 32-bit signature words (bits 0..31 per word — always positive, no
    * two's-complement edge cases in either engine).
    */
  private def sigCtes(src: String = "embeddings"): String =
    s"""$planesSql,
       |dots AS (SELECT e.vec_id, p.j,
       |    list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), p.r),
       |      x -> x[1] * x[2])) AS dot
       |  FROM $src e CROSS JOIN planes p),
       |sig AS (SELECT vec_id,
       |    bit_or(CASE WHEN j < 32 AND dot > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS w0,
       |    bit_or(CASE WHEN j BETWEEN 32 AND 63 AND dot > 0 THEN (1::BIGINT << (j - 32)) ELSE 0::BIGINT END) AS w1,
       |    bit_or(CASE WHEN j BETWEEN 64 AND 95 AND dot > 0 THEN (1::BIGINT << (j - 64)) ELSE 0::BIGINT END) AS w2,
       |    bit_or(CASE WHEN j >= 96 AND dot > 0 THEN (1::BIGINT << (j - 96)) ELSE 0::BIGINT END) AS w3
       |  FROM dots GROUP BY vec_id)""".stripMargin

  private def hamSql(a: String, b: String): String =
    (0 until 4).map(w => s"bit_count(xor($a.w$w, $b.qw$w))").mkString(" + ")

  /** 24 five-bit bands of the SRP signature (6 per word, bits 0..29 —
    * mirroring [[Similarity.cosineNearDupPairsSrp]]'s extraction) and the
    * ≥minBands candidate-pair CTE on top of `sig` from [[sigCtes]].
    */
  private def srpBandCtes(minBands: Int): String =
    s"""bands AS (SELECT s.vec_id, w.j * 6 + k.k AS band,
       |    ((CASE w.j WHEN 0 THEN s.w0 WHEN 1 THEN s.w1 WHEN 2 THEN s.w2 ELSE s.w3 END)
       |      >> (5 * k.k)) & 31 AS bv
       |  FROM sig s
       |  CROSS JOIN (SELECT unnest(range(4)) AS j) w
       |  CROSS JOIN (SELECT unnest(range(6)) AS k) k),
       |cand AS (SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
       |    AND a.vec_id < b.vec_id
       |  GROUP BY va, vb HAVING COUNT(*) >= $minBands)""".stripMargin

  /** Verified SRP-banded near-dup pairs (the q_dedup_embedding_bucketed
    * oracle body), parameterized by the signature source CTE.
    */
  private def srpPairsSql(src: String): String =
    s"""WITH ${sigCtes(src)},
       |${srpBandCtes(Similarity.SrpPairMinBands)}
       |SELECT c.va AS vec_a, c.vb AS vec_b,
       |  ${cosSql("ea.embedding", "eb.embedding")} AS cosine
       |FROM cand c
       |JOIN $src ea ON ea.vec_id = c.va
       |JOIN $src eb ON eb.vec_id = c.vb
       |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45""".stripMargin

  /** Single-query SRP top-k oracle at the given Hamming radius. */
  private def srpTopKSql(radius: Int, k: Int): String =
    s"""WITH ${sigCtes()},
       |q AS (SELECT e.embedding AS qv, s.w0 AS qw0, s.w1 AS qw1, s.w2 AS qw2, s.w3 AS qw3
       |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id WHERE e.vec_id = 0)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id CROSS JOIN q
       |WHERE e.vec_id <> 0 AND ${hamSql("s", "q")} <= $radius
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT $k""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(list_zip(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])), x -> x[1] * x[2])) /
       |  (sqrt(list_sum(list_transform(CAST($a AS DOUBLE[]), x -> x * x))) *
       |   sqrt(list_sum(list_transform(CAST($b AS DOUBLE[]), x -> x * x)))), 6)""".stripMargin

  /** Deterministic 2-iteration Lloyd CTE chain ending at `a2`
    * (vec_id, v, cluster, s) — shared by the q_kmeans and q_semdedup
    * oracles so both replay the identical iteration. `kSql` is the seed
    * count: a literal for the pinned-k oracles, a COUNT-derived subquery
    * for the auto-k path (DuckDB allows subqueries under LIMIT). cosSql's
    * CAST(x AS DOUBLE[]) is a no-op here (emb.v is already DOUBLE[]) —
    * the shared helper keeps the formula single-sourced.
    */
  private def kmeansCtes(kSql: String = "8", src: String = "embeddings",
                         finalKeep: Int = 1): String = {
    def assignCte(out: String, centsCte: String, keep: Int = 1): String =
      s"""s_$out AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS s
         |  FROM emb e CROSS JOIN $centsCte c),
         |$out AS (SELECT vec_id, v, cluster, s FROM (
         |  SELECT vec_id, v, cid AS cluster, s, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, cid ASC) AS rn FROM s_$out) WHERE rn <= $keep)""".stripMargin
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
       |c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, v AS cv FROM emb
       |  ORDER BY vec_id ASC LIMIT $kSql),
       |${assignCte("a1", "c0")},
       |u1 AS (SELECT cluster AS cid, pos,
       |    round(CAST(SUM(CAST(v[pos] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS m
       |  FROM (SELECT cluster, v, unnest(range(1, len(v) + 1)) AS pos FROM a1)
       |  GROUP BY cluster, pos),
       |c1 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM u1 GROUP BY cid),
       |${assignCte("a2", "c1", finalKeep)}""".stripMargin
  }

  /** Cluster-bounded near-dup pairs (the q_dedup_embedding_bucketed
    * oracle body): auto-k Lloyd replay with the final assignment keeping
    * the top-[[Similarity.ClusteredPairProbes]] centroids, candidates =
    * pairs sharing ANY assigned cluster, exact cosine verify — mirroring
    * [[Similarity.cosineNearDupPairsClustered]] value-for-value.
    */
  private def clusteredPairsSql(src: String): String =
    s"""WITH ${kmeansCtes(
              s"(SELECT CAST(ceil(COUNT(*) / ${Similarity.ClusteredPairTarget}.0) AS BIGINT) FROM emb)",
              src, Similarity.ClusteredPairProbes)},
       |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
       |SELECT c.va AS vec_a, c.vb AS vec_b,
       |  ${cosSql("ea.embedding", "eb.embedding")} AS cosine
       |FROM cand c
       |JOIN $src ea ON ea.vec_id = c.va
       |JOIN $src eb ON eb.vec_id = c.vb
       |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45""".stripMargin

  /** Greedy k-center oracle, rounds unrolled as CTEs: round r scores
    * every unselected vector's MAX cosine to sel(r−1) and picks the
    * argmin (ties on id) — mirroring
    * [[graft.similarity.Similarity.kCenterSelect]] value-for-value
    * (cosines round(6) BEFORE the max, like the engine).
    */
  private def kcenterOracle(k: Int): String = {
    val rounds = (1 until k).map { r =>
      s"""m$r AS (SELECT e.vec_id, MAX(${cosSql("e.v", "s.v")}) AS mc
         |  FROM emb e, emb s
         |  WHERE s.vec_id IN (SELECT vec_id FROM sel${r - 1})
         |    AND e.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
         |  GROUP BY e.vec_id),
         |p$r AS (SELECT vec_id FROM m$r ORDER BY mc ASC, vec_id ASC LIMIT 1),
         |sel$r AS (SELECT vec_id, pick_order FROM sel${r - 1}
         |  UNION ALL SELECT vec_id, CAST($r AS BIGINT) FROM p$r)""".stripMargin
    }
    (Seq(
      "WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
      "sel0 AS (SELECT CAST(0 AS BIGINT) AS vec_id, CAST(0 AS BIGINT) AS pick_order)")
      ++ rounds).mkString(",\n") +
      s"\nSELECT pick_order, vec_id FROM sel${k - 1}"
  }

  /** Greedy MMR oracle, rounds unrolled as CTEs (the [[kcenterOracle]]
    * pattern): pool = top-`poolSize` by round-6 cosine to query 0; round
    * r scores every unselected pool member's
    * round6(λ·qsim − (1−λ)·max cos to sel(r−1)) and picks the argmax
    * (ties on id) — mirroring [[graft.similarity.Similarity.mmrSelect]]
    * value-for-value (cosines round(6) BEFORE the max, like the engine).
    */
  private def mmrOracle(k: Int, poolSize: Int, lambda: Double): String = {
    val oneMinus = 1.0 - lambda
    val rounds = (1 until k).map { r =>
      s"""m$r AS (SELECT p.vec_id, p.qsim, MAX(${cosSql("pe.v", "se.v")}) AS ms
         |  FROM pool p JOIN emb pe ON p.vec_id = pe.vec_id, emb se
         |  WHERE se.vec_id IN (SELECT vec_id FROM sel${r - 1})
         |    AND p.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
         |  GROUP BY p.vec_id, p.qsim),
         |p$r AS (SELECT vec_id, qsim FROM m$r
         |  ORDER BY round($lambda * qsim - $oneMinus * ms, 6) DESC, vec_id ASC
         |  LIMIT 1),
         |sel$r AS (SELECT vec_id, qsim, pick_order FROM sel${r - 1}
         |  UNION ALL SELECT vec_id, qsim, CAST($r AS BIGINT) FROM p$r)""".stripMargin
    }
    (Seq(
      "WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
      s"""pool AS (SELECT e.vec_id, ${cosSql("e.v", "q.v")} AS qsim
         |  FROM emb e CROSS JOIN (SELECT v FROM emb WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0
         |  ORDER BY qsim DESC, e.vec_id ASC LIMIT $poolSize)""".stripMargin,
      """sel0 AS (SELECT vec_id, qsim, CAST(0 AS BIGINT) AS pick_order FROM pool
        |  ORDER BY qsim DESC, vec_id ASC LIMIT 1)""".stripMargin)
      ++ rounds).mkString(",\n") +
      s"\nSELECT pick_order, vec_id, qsim FROM sel${k - 1}"
  }

  /** PQ train/encode/ADC/rerank oracle — shared by the ad-hoc
    * (`q_ann_pq`, trains in-plan) and store-served (`q_ann_pq_served`)
    * paths: the codebook train is deterministic, so persisting it
    * changes cost, never the ranking.
    */
  /** PQ codebook-train + encode CTE chain (defaults m=8, ksub=8, dim 64
    * → sd 8) — the exact engine recipe ([[Similarity.pqModel]]):
    * first-`ksub`-by-id seeds, one Lloyd round with round-6 subspace
    * distances and DECIMAL(38,12) mean sums. `sfx` suffixes every CTE
    * name so the recall oracles can embed the chain next to their own
    * CTEs: yields emb$sfx (vec_id, v), sub$sfx, c1$sfx (s, cid, cv),
    * codes$sfx (vec_id, s, cid). `m`/`sd`/`ksub` parameterize the
    * template in lockstep with the engine's store metadata (the non-toy
    * q_ann_ivfpq_big gate instantiates ksub=256).
    */
  private def pqTrainCtes(sfx: String,
                          train: String => String = _ => "TRUE",
                          src: String = "embeddings",
                          m: Int = 8, sd: Int = 8, ksub: Int = 8): String =
    s"""emb$sfx AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
       |sub$sfx AS (SELECT vec_id, ss.s, v[ss.s*$sd+1:ss.s*$sd+$sd] AS sv
       |  FROM emb$sfx CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |seeds$sfx AS (SELECT s, CAST(vec_id AS BIGINT) AS cid, sv AS cv FROM sub$sfx
       |  WHERE vec_id IN (SELECT vec_id FROM emb$sfx WHERE ${train("vec_id")}
       |                   ORDER BY vec_id ASC LIMIT $ksub)),
       |d0$sfx AS (SELECT x.vec_id, x.s, c.cid, x.sv,
       |    round(list_sum(list_transform(range(1, ${sd + 1}),
       |      i -> (x.sv[i] - c.cv[i]) * (x.sv[i] - c.cv[i]))), 6) AS d
       |  FROM sub$sfx x JOIN seeds$sfx c ON x.s = c.s
       |  WHERE ${train("x.vec_id")}),
       |a0$sfx AS (SELECT vec_id, s, cid, sv FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, cid ASC) AS rn
       |  FROM d0$sfx) WHERE rn = 1),
       |u1$sfx AS (SELECT s, cid, pos,
       |    round(CAST(SUM(CAST(sv[pos] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mc
       |  FROM (SELECT s, cid, sv, unnest(range(1, ${sd + 1})) AS pos FROM a0$sfx)
       |  GROUP BY s, cid, pos),
       |c1$sfx AS (SELECT s, cid, list(mc ORDER BY pos) AS cv FROM u1$sfx GROUP BY s, cid),
       |d1$sfx AS (SELECT x.vec_id, x.s, c.cid,
       |    round(list_sum(list_transform(range(1, ${sd + 1}),
       |      i -> (x.sv[i] - c.cv[i]) * (x.sv[i] - c.cv[i]))), 6) AS d
       |  FROM sub$sfx x JOIN c1$sfx c ON x.s = c.s),
       |codes$sfx AS (SELECT vec_id, s, cid FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, cid ASC) AS rn
       |  FROM d1$sfx) WHERE rn = 1)""".stripMargin

  private lazy val pqOracle: String = pqOracleTrainedOn(_ => "TRUE")

  /** The PQ serve oracle over a codebook trained on the `train` subset
    * (codes still assigned for ALL vectors in that frozen space). `train`
    * is a predicate TEMPLATE over the qualified vec_id reference — the
    * CTE chain instantiates it per scope, so a predicate can never be
    * mangled by substring surgery. `_ => "TRUE"` is the full-corpus
    * recipe shared by q_ann_pq and q_ann_pq_served; q_ann_pq_incr
    * replays the 80%-base incremental build with `id => s"$id % 5 <> 0"`.
    */
  private def pqOracleTrainedOn(train: String => String,
                                ksub: Int = 8): String =
    s"""WITH ${pqTrainCtes("", train, ksub = ksub)},
       |q AS (SELECT s, sv AS qsv FROM sub WHERE vec_id = 0),
       |lut AS (SELECT c.s, c.cid,
       |    round(list_sum(list_transform(range(1, 9), i -> c.cv[i] * q.qsv[i])), 6) AS pdot,
       |    round(list_sum(list_transform(c.cv, x -> x * x)), 6) AS pnorm2
       |  FROM c1 c JOIN q ON c.s = q.s),
       |qn AS (SELECT sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm FROM emb
       |  WHERE vec_id = 0),
       |adc AS (SELECT k.vec_id,
       |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
       |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
       |  FROM codes k JOIN lut l ON k.s = l.s AND k.cid = l.cid GROUP BY k.vec_id),
       |cands AS (SELECT vec_id, round(adc_dot / (qnorm * sqrt(apx2)), 6) AS adc_cosine
       |  FROM adc, qn WHERE vec_id <> 0
       |  ORDER BY adc_cosine DESC, vec_id ASC LIMIT 40)
       |SELECT c.vec_id, c.adc_cosine, ${cosSql("e.v", "qe.qv")} AS cosine
       |FROM cands c JOIN emb e ON c.vec_id = e.vec_id
       |CROSS JOIN (SELECT v AS qv FROM emb WHERE vec_id = 0) qe
       |ORDER BY cosine DESC, c.vec_id ASC LIMIT 5""".stripMargin

  /** IVF-PQ (residual / IVFADC) oracle — coarse assignment (the IVF
    * oracle's CTEs), residual r = v − c(cluster) in exact doubles, the
    * SAME PQ train chain over the residual frame ([[pqTrainCtes]] with
    * `src = resid` — one codebook shared across clusters, the FAISS
    * default), then flat-PQ ADC over the probe cluster's SHIFTED codebook
    * cv′ = c_s + cv: since subspaces partition the coordinates,
    * dot(q, ĉ+r̂) = Σ_s dot(q_s, c_s+cv) and ‖ĉ+r̂‖² = Σ_s ‖c_s+cv‖², so
    * the serve CTEs are [[pqOracleTrainedOn]]'s with one extra shift CTE
    * and the candidate set restricted to the probe cluster. Shared by the
    * ad-hoc and served twins; the incremental twin replays the
    * 80%-base-trained codebook via the train template.
    */
  private def ivfPqOracleTrainedOn(train: String => String,
                                   ncSql: String = "8",
                                   ksub: Int = 8, nprobe: Int = 1,
                                   m: Int = 8, sd: Int = 8,
                                   nprobeSql: Option[String] = None): String =
    s"""WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $ncSql),
       |csim AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cluster FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim) WHERE rn = 1),
       |resid AS (SELECT e.vec_id,
       |    list_transform(range(1, 65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) AS embedding
       |  FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id
       |  JOIN cents c ON a.cluster = c.cid),
       |${pqTrainCtes("", train, src = "resid", m = m, sd = sd, ksub = ksub)},
       |embq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qc AS (SELECT cid AS cluster FROM (SELECT cid,
       |    row_number() OVER (ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim WHERE vec_id = 0) WHERE rn <= ${nprobeSql.getOrElse(nprobe.toString)}),
       |csl AS (SELECT qc.cluster, ss.s, c.cv[ss.s*$sd+1:ss.s*$sd+$sd] AS csv
       |  FROM cents c JOIN qc ON c.cid = qc.cluster
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |csh AS (SELECT l.cluster, c.s, c.cid,
       |    list_transform(range(1, ${sd + 1}), i -> l.csv[i] + c.cv[i]) AS cv
       |  FROM c1 c JOIN csl l ON c.s = l.s),
       |q AS (SELECT ss.s, v[ss.s*$sd+1:ss.s*$sd+$sd] AS qsv FROM embq
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss WHERE vec_id = 0),
       |lut AS (SELECT c.cluster, c.s, c.cid,
       |    round(list_sum(list_transform(range(1, ${sd + 1}), i -> c.cv[i] * q.qsv[i])), 6) AS pdot,
       |    round(list_sum(list_transform(c.cv, x -> x * x)), 6) AS pnorm2
       |  FROM csh c JOIN q ON c.s = q.s),
       |qn AS (SELECT sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm
       |  FROM embq WHERE vec_id = 0),
       |adc AS (SELECT k.vec_id,
       |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
       |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
       |  FROM codes k JOIN asg a ON k.vec_id = a.vec_id
       |  JOIN lut l ON l.cluster = a.cluster AND k.s = l.s AND k.cid = l.cid
       |  GROUP BY k.vec_id),
       |cands AS (SELECT vec_id, round(adc_dot / (qnorm * sqrt(apx2)), 6) AS adc_cosine
       |  FROM adc, qn WHERE vec_id <> 0
       |  ORDER BY adc_cosine DESC, vec_id ASC LIMIT 40)
       |SELECT c.vec_id, c.adc_cosine, ${cosSql("e.v", "qe.qv")} AS cosine
       |FROM cands c JOIN embq e ON c.vec_id = e.vec_id
       |CROSS JOIN (SELECT v AS qv FROM embq WHERE vec_id = 0) qe
       |ORDER BY cosine DESC, c.vec_id ASC LIMIT 5""".stripMargin

  // Base train predicate: NON-centroid ids only — a centroid's residual
  // is exactly zero, and seeding the Lloyd round with 8 copies of the
  // zero vector collapses every subspace codebook to one codeword
  // (constant ADC scores; the engine excludes them identically in
  // Similarity.ivfPqCodebookAndCodes). Codes still cover ALL ids.
  private lazy val ivfPqOracle: String =
    ivfPqOracleTrainedOn(id => s"$id >= 8")

  /** IVF nprobe=1 oracle — shared by the ad-hoc and the
    * partition-pruned-store paths (the store is a layout, not a
    * semantics change).
    */
  private lazy val ivfOracle: String = ivfOracleAt("8")

  /** The IVF auto gate's count-derived centroid count, interpolating
    * the SAME constant the engine build uses — tuning AutoCellSize can
    * never silently diverge the oracle.
    */
  private lazy val ivfAutoNcSql: String =
    s"(SELECT CAST(ceil(COUNT(*) / ${IvfStore.AutoCellSize}.0) AS BIGINT)" +
      " FROM embeddings)"

  /** IVF nprobe=1 oracle parameterized by the centroid-count SQL —
    * "8" for the standing gates, a COUNT(*)-derived expression for the
    * k ∝ N auto gate.
    */
  private def ivfOracleAt(ncSql: String): String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < $ncSql),
       |sim AS (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (SELECT vec_id, embedding, cid AS cluster FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM sim) WHERE rn = 1),
       |q AS (SELECT embedding AS qv, cluster FROM assigned WHERE vec_id = 0)
       |SELECT a.vec_id, ${cosSql("a.embedding", "qv")} AS cosine
       |FROM assigned a JOIN q USING (cluster) WHERE a.vec_id <> 0
       |ORDER BY cosine DESC, vec_id ASC LIMIT 5""".stripMargin

  /** One recall-audit row: candidates (qid, vec_id) joined to the
    * persisted exact truth → (method, hits, n_queries, k, avg_recall).
    */
  private def recallRow(method: String, cand: DataFrame,
                        truth: DataFrame): DataFrame =
    cand.join(truth, Seq("qid", "vec_id"))
      .agg(count(lit(1)).cast("long").as("hits"))
      .select(lit(method).as("method"), col("hits"),
        lit(RecallTruth.NumQueries).as("n_queries"),
        lit(RecallTruth.K.toLong).as("k"),
        round(col("hits").cast("double") /
          (RecallTruth.NumQueries * RecallTruth.K).toDouble, 6)
          .as("avg_recall"))

  private def topPerQuery(df: DataFrame, k: Int = RecallTruth.K): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("__rn") <= k).select(col("qid"), col("vec_id"))
  }

  /** SRP-sketch recall row at a Hamming radius: one signature scan scored
    * against the 20 broadcast query signatures, radius filter, top-10.
    */
  private def lshRecall(s: SparkSession, dir: String, radius: Int,
                        name: String): DataFrame = {
    val e = Similarity.srpSignature(Tables.embeddings(s, dir), "embedding")
    val qs = e.filter(col("vec_id") < RecallTruth.NumQueries)
      .select((col("vec_id").as("qid") +: col("embedding").as("__qv") +:
        (0 until 4).map(w => col(s"__w$w").as(s"__qw$w"))): _*)
    val cand = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid") &&
        Similarity.srpHamming("__w", "__qw") <= radius)
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine"))
    recallRow(name, topPerQuery(cand), RecallTruth.ensureBuilt(s, dir))
  }

  /** IVF recall row at an nprobe: per-query top-`nprobe` centroid ranks
    * (the exact ivfAssign sim formula — rank 1 IS the assigned cluster),
    * exact cosines inside the probed clusters, top-10.
    */
  private def ivfRecall(s: SparkSession, dir: String, nprobe: Int,
                        name: String, nc: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding",
      nCentroids = nc)
    val centsArr = emb.filter(col("vec_id") < nc)
      .agg(collect_list(struct(col("vec_id").as("cid"), col("embedding").as("cv")))
        .as("__cents"))
    val probes = emb.filter(col("vec_id") < RecallTruth.NumQueries)
      .crossJoin(broadcast(centsArr))
      .select(col("vec_id").as("qid"), col("embedding").as("__qv"), explode(expr(
        """transform(__cents, c -> struct(
          |  round(graft_dot(embedding, c.cv) /
          |    (sqrt(graft_dot(embedding, embedding)) * sqrt(graft_dot(c.cv, c.cv))), 6) AS sim,
          |  c.cid AS cid))""".stripMargin)).as("__p"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("__p.sim").desc, col("__p.cid").asc)))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("__qv"), col("__p.cid").as("cluster"))
    val cand = assigned.join(broadcast(probes), "cluster")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine"))
    recallRow(name, topPerQuery(cand), RecallTruth.ensureBuilt(s, dir))
  }

  /** Shared truth CTEs for the per-method recall oracles: exact round-6
    * cosine top-10 per query id < 20 — replaying [[RecallTruth]].
    */
  private val truthCtes: String =
    s"""qst AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  WHERE vec_id < 20),
       |scoredt AS (SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |  FROM embeddings e CROSS JOIN qst q WHERE e.vec_id <> q.qid),
       |truth AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
       |  FROM scoredt) WHERE rn <= 10)""".stripMargin

  private def recallRowSql(name: String, cte: String): String =
    s"""SELECT '$name' AS method, CAST(COUNT(*) AS BIGINT) AS hits,
       |  CAST(20 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
       |  round(CAST(COUNT(*) AS DOUBLE) / 200.0, 6) AS avg_recall
       |FROM $cte c JOIN truth t ON c.qid = t.qid AND c.vec_id = t.vec_id""".stripMargin

  /** SRP-sketch per-method recall oracle at a Hamming radius. */
  private def lshRecallSql(name: String, radius: Int): String =
    s"""WITH ${sigCtes()},
       |$truthCtes,
       |qsig AS (SELECT e.vec_id AS qid, e.embedding AS qv,
       |    s.w0 AS qw0, s.w1 AS qw1, s.w2 AS qw2, s.w3 AS qw3
       |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id WHERE e.vec_id < 20),
       |cand AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id ASC) AS rn
       |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id CROSS JOIN qsig q
       |  WHERE e.vec_id <> q.qid AND ${hamSql("s", "q")} <= $radius)
       |  WHERE rn <= 10)
       |${recallRowSql(name, "cand")}""".stripMargin

  /** IVF per-method recall oracle at an nprobe (rank 1 = assigned). */
  private def ivfRecallSql(name: String, nprobe: Int,
                           ncSql: String = "8"): String =
    s"""WITH $truthCtes,
       |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < $ncSql),
       |sim AS (SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (SELECT vec_id, embedding, cid AS cluster FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM sim) WHERE rn = 1),
       |probes AS (SELECT qid, qv, cid FROM (SELECT vec_id AS qid, embedding AS qv, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM sim WHERE vec_id < 20) WHERE rn <= $nprobe),
       |ivfc AS (SELECT p.qid, a.vec_id, ${cosSql("a.embedding", "p.qv")} AS cosine
       |  FROM assigned a JOIN probes p ON a.cluster = p.cid AND a.vec_id <> p.qid),
       |cand AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
       |  FROM ivfc) WHERE rn <= 10)
       |${recallRowSql(name, "cand")}""".stripMargin

  /** Flat-PQ multi-query recall oracle (the monolith's pq chain: one
    * codebook train, per-query LUTs, ADC top-40, exact rerank top-10).
    * Shared verbatim by the ad-hoc and store-served rows (deterministic
    * artifacts, shared scoring algebra).
    */
  private def pqRecallSql(name: String, ksub: Int = 8): String =
    s"""WITH $truthCtes,
       |${pqTrainCtes("p", ksub = ksub)},
       |qp AS (SELECT vec_id AS qid, s, sv AS qsv FROM subp WHERE vec_id < 20),
       |lutp AS (SELECT q.qid, c.s, c.cid,
       |    round(list_sum(list_transform(range(1, 9), i -> c.cv[i] * q.qsv[i])), 6) AS pdot,
       |    round(list_sum(list_transform(c.cv, x -> x * x)), 6) AS pnorm2
       |  FROM c1p c JOIN qp q ON c.s = q.s),
       |qnp AS (SELECT vec_id AS qid,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm, v AS qv
       |  FROM embp WHERE vec_id < 20),
       |adcp AS (SELECT l.qid, k.vec_id,
       |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
       |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
       |  FROM codesp k JOIN lutp l ON k.s = l.s AND k.cid = l.cid
       |  GROUP BY l.qid, k.vec_id),
       |candsp AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id,
       |    row_number() OVER (PARTITION BY a.qid
       |      ORDER BY round(a.adc_dot / (n.qnorm * sqrt(a.apx2)), 6) DESC,
       |        a.vec_id ASC) AS rn
       |  FROM adcp a JOIN qnp n ON a.qid = n.qid WHERE a.vec_id <> a.qid)
       |  WHERE rn <= 40),
       |pqr AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
       |    row_number() OVER (PARTITION BY c.qid
       |      ORDER BY ${cosSql("e.v", "n.qv")} DESC, c.vec_id ASC) AS rn
       |  FROM candsp c JOIN embp e ON c.vec_id = e.vec_id
       |  JOIN qnp n ON c.qid = n.qid) WHERE rn <= 10)
       |${recallRowSql(name, "pqr")}""".stripMargin

  /** IVFADC multi-query recall oracle, parameterized by (nc, ksub,
    * nprobe) in lockstep with the store metadata: coarse assignment,
    * residual codebook train (non-centroid ids), per-(query, probed
    * cluster) shifted-codebook LUTs, ADC restricted to each vector's OWN
    * cluster among the probes, top-40, exact rerank top-10 — the
    * [[graft.similarity.Similarity.ivfPqMultiFromParts]] algebra.
    */
  private def ivfPqRecallSql(name: String, nc: Int, ksub: Int,
                             nprobe: Int, sd: Int = 8, m: Int = 8): String =
    s"""WITH $truthCtes,
       |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $nc),
       |csim AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cluster FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim) WHERE rn = 1),
       |resid AS (SELECT e.vec_id,
       |    list_transform(range(1, 65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) AS embedding
       |  FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id
       |  JOIN cents c ON a.cluster = c.cid),
       |${pqTrainCtes("v", id => s"$id >= $nc", src = "resid", m = m,
            sd = sd, ksub = ksub)},
       |embq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |probes AS (SELECT qid, cluster FROM (SELECT vec_id AS qid, cid AS cluster,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim WHERE vec_id < 20) WHERE rn <= $nprobe),
       |csl AS (SELECT c.cid AS cluster, ss.s, c.cv[ss.s*$sd+1:ss.s*$sd+$sd] AS csv
       |  FROM cents c CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |qsub AS (SELECT vec_id AS qid, ss.s, v[ss.s*$sd+1:ss.s*$sd+$sd] AS qsv
       |  FROM embq CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss
       |  WHERE vec_id < 20),
       |lutv AS (SELECT p.qid, p.cluster, c.s, c.cid,
       |    round(list_sum(list_transform(range(1, ${sd + 1}),
       |      i -> (l.csv[i] + c.cv[i]) * q.qsv[i])), 6) AS pdot,
       |    round(list_sum(list_transform(range(1, ${sd + 1}),
       |      i -> (l.csv[i] + c.cv[i]) * (l.csv[i] + c.cv[i]))), 6) AS pnorm2
       |  FROM c1v c JOIN qsub q ON c.s = q.s
       |  JOIN probes p ON p.qid = q.qid
       |  JOIN csl l ON l.cluster = p.cluster AND l.s = c.s),
       |qnv AS (SELECT vec_id AS qid,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm, v AS qv
       |  FROM embq WHERE vec_id < 20),
       |adcv AS (SELECT l.qid, k.vec_id,
       |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
       |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
       |  FROM codesv k JOIN asg av ON k.vec_id = av.vec_id
       |  JOIN lutv l ON l.cluster = av.cluster AND k.s = l.s AND k.cid = l.cid
       |  GROUP BY l.qid, k.vec_id),
       |candsv AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id,
       |    row_number() OVER (PARTITION BY a.qid
       |      ORDER BY round(a.adc_dot / (n.qnorm * sqrt(a.apx2)), 6) DESC,
       |        a.vec_id ASC) AS rn
       |  FROM adcv a JOIN qnv n ON a.qid = n.qid WHERE a.vec_id <> a.qid)
       |  WHERE rn <= 40),
       |pqrv AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
       |    row_number() OVER (PARTITION BY c.qid
       |      ORDER BY ${cosSql("e.v", "n.qv")} DESC, c.vec_id ASC) AS rn
       |  FROM candsv c JOIN embq e ON c.vec_id = e.vec_id
       |  JOIN qnv n ON c.qid = n.qid) WHERE rn <= 10)
       |${recallRowSql(name, "pqrv")}""".stripMargin

  /** Dequantized-int8 corpus CTE (the q_embedding_quant algebra —
    * scale = max|x|/127, x̂ = round(x/s)·s, zero-vector guard) shared by
    * the SQ8 serve oracles: yields dq (vec_id, v raw doubles, dqv).
    */
  private val sq8DqCte: String =
    """dq AS (SELECT vec_id, v,
      |    CASE WHEN scale = 0 THEN v
      |         ELSE list_transform(v, x -> round(x / scale) * scale) END AS dqv
      |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |        list_max(list_transform(CAST(embedding AS DOUBLE[]),
      |          x -> abs(x))) / 127.0 AS scale
      |        FROM embeddings))""".stripMargin

  /** Count-derived nCentroids for the IVF×SQ8 auto twin — the engine
    * persists ⌈N / AutoCellSize⌉ in params.txt; the oracle derives the
    * identical value from COUNT(*) (the q_ann_ivfpq_auto precedent).
    */
  private lazy val ivfSq8AutoNcSql: String =
    s"(SELECT CAST(ceil(COUNT(*) / " +
      s"${IvfStore.AutoCellSize}.0) AS BIGINT) FROM embeddings)"

  /** IVF×SQ8 serve oracle, parameterized on (nCentroids, nprobe) —
    * seed-centroid assignment (the ivfOracle CTEs), ranked top-nprobe
    * probe set per the exact assignment formula (rank 1 ≡ assignment, so
    * nprobe=1 instantiations hash identically), dequantized-int8 scoring
    * INSIDE the probed clusters, exact rerank. Both SQL fragments may be
    * scalar subqueries (the auto twin passes COUNT-derived values).
    */
  private def ivfSq8TopKSql(ncSql: String, nprobeSql: String): String =
    s"""WITH $sq8DqCte,
       |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id < $ncSql),
       |csim AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cluster FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim) WHERE rn = 1),
       |qc AS (SELECT cid AS cluster FROM (SELECT cid,
       |    row_number() OVER (ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim WHERE vec_id = 0) WHERE rn <= $nprobeSql),
       |q AS (SELECT v AS qv FROM dq WHERE vec_id = 0),
       |cands AS (SELECT d.vec_id, ${cosSql("d.dqv", "q.qv")} AS approx_cosine
       |  FROM dq d JOIN asg a ON d.vec_id = a.vec_id
       |  JOIN qc ON a.cluster = qc.cluster
       |  CROSS JOIN q WHERE d.vec_id <> 0
       |  ORDER BY approx_cosine DESC, d.vec_id ASC LIMIT 40)
       |SELECT c.vec_id, c.approx_cosine, ${cosSql("d.v", "q.qv")} AS cosine
       |FROM cands c JOIN dq d ON c.vec_id = d.vec_id CROSS JOIN q
       |ORDER BY cosine DESC, c.vec_id ASC LIMIT 5""".stripMargin

  /** IVF×SQ8 recall-row oracle over the shared truth CTEs, same
    * (nCentroids, nprobe) parameterization as [[ivfSq8TopKSql]].
    */
  private def ivfSq8RecallSql(method: String, ncSql: String,
                              nprobeSql: String): String =
    s"""WITH $truthCtes,
       |$sq8DqCte,
       |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id < $ncSql),
       |csim AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cluster FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim) WHERE rn = 1),
       |qprobe AS (SELECT qid, cluster FROM (SELECT vec_id AS qid, cid AS cluster,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |  FROM csim WHERE vec_id < 20) WHERE rn <= $nprobeSql),
       |qsq AS (SELECT vec_id AS qid, v AS qv FROM dq WHERE vec_id < 20),
       |candsq AS (SELECT qid, vec_id FROM (SELECT p.qid, d.vec_id,
       |    row_number() OVER (PARTITION BY p.qid
       |      ORDER BY ${cosSql("d.dqv", "q.qv")} DESC, d.vec_id ASC) AS rn
       |  FROM dq d JOIN asg a ON d.vec_id = a.vec_id
       |  JOIN qprobe p ON a.cluster = p.cluster
       |  JOIN qsq q ON p.qid = q.qid
       |  WHERE d.vec_id <> p.qid) WHERE rn <= 40),
       |sqr AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
       |    row_number() OVER (PARTITION BY c.qid
       |      ORDER BY ${cosSql("d.v", "q.qv")} DESC, c.vec_id ASC) AS rn
       |  FROM candsq c JOIN dq d ON c.vec_id = d.vec_id
       |  JOIN qsq q ON c.qid = q.qid) WHERE rn <= 10)
       |${recallRowSql(method, "sqr")}""".stripMargin

  /** SQ8 serve oracle (dequantized-int8 candidates, exact rerank) —
    * shared verbatim by the in-plan audit and the persisted-store twin.
    */
  private lazy val sq8TopKSql: String =
    s"""WITH $sq8DqCte,
       |q AS (SELECT v AS qv FROM dq WHERE vec_id = 0),
       |cands AS (SELECT d.vec_id, ${cosSql("d.dqv", "q.qv")} AS approx_cosine
       |  FROM dq d CROSS JOIN q WHERE d.vec_id <> 0
       |  ORDER BY approx_cosine DESC, d.vec_id ASC LIMIT 40)
       |SELECT c.vec_id, c.approx_cosine, ${cosSql("d.v", "q.qv")} AS cosine
       |FROM cands c JOIN dq d ON c.vec_id = d.vec_id CROSS JOIN q
       |ORDER BY cosine DESC, c.vec_id ASC LIMIT 5""".stripMargin

  /** SQ8 recall oracle, parameterized only by the method label (the
    * in-plan and served twins compute identical candidates).
    */
  private def sq8RecallSql(name: String): String =
    s"""WITH $truthCtes,
       |$sq8DqCte,
       |qsq AS (SELECT vec_id AS qid, v AS qv FROM dq WHERE vec_id < 20),
       |candsq AS (SELECT qid, vec_id FROM (SELECT q.qid, d.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${cosSql("d.dqv", "q.qv")} DESC, d.vec_id ASC) AS rn
       |  FROM dq d CROSS JOIN qsq q WHERE d.vec_id <> q.qid)
       |  WHERE rn <= 40),
       |sqr AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
       |    row_number() OVER (PARTITION BY c.qid
       |      ORDER BY ${cosSql("d.v", "q.qv")} DESC, c.vec_id ASC) AS rn
       |  FROM candsq c JOIN dq d ON c.vec_id = d.vec_id
       |  JOIN qsq q ON c.qid = q.qid) WHERE rn <= 10)
       |${recallRowSql(name, "sqr")}""".stripMargin

  /** SemDeDup oracle body over the `a2` assignment — shared by the
    * pinned-k and auto-k entries (same pruning, different k source).
    */
  private val semdedupBody: String =
    s"""dup AS (SELECT DISTINCT b.vec_id
       |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.v", "b.v")} >= 0.45)
       |SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
       |FROM a2 a LEFT JOIN dup d ON a.vec_id = d.vec_id""".stripMargin

  /** Same-label filtered SRP top-k oracle — shared by the
    * predicate-inside-scan shape and the label-partitioned store
    * (identical semantics; the store is a layout).
    */
  private lazy val filteredTopKSql: String =
    s"""WITH ${sigCtes()},
       |q AS (SELECT e.embedding AS qv, e.label AS ql,
       |    s.w0 AS qw0, s.w1 AS qw1, s.w2 AS qw2, s.w3 AS qw3
       |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id WHERE e.vec_id = 0)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id CROSS JOIN q
       |WHERE e.vec_id <> 0 AND e.label = q.ql
       |  AND ${hamSql("s", "q")} <= ${Similarity.SrpRadius}
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT 5""".stripMargin

  /** Lloyd-coarse drift twin-pair oracle, parameterized over the
    * coarse cell count, residual codebook size, and serve width — the
    * toy (nc=8, ksub=8, nprobe=1) and big (nc=64, ksub=256, nprobe=4)
    * configurations replay the identical chain. At nprobe = 1 the
    * ranked probe CTE reduces to the assigned cluster (rank 1 IS the
    * assignment), so the toy rows' hashes are unchanged by the
    * generalization. `tag` keys the emitted method names.
    */
  private def lloydDriftSql(tag: String, nc: Int, ksub: Int,
                            nprobe: Int): String = {
      val driftCte =
        """embdrift AS (SELECT vec_id,
          |    CASE WHEN vec_id % 5 = 0
          |      THEN list_transform(embedding,
          |             x -> CAST(CAST(x AS DOUBLE) + 0.25 AS FLOAT))
          |      ELSE embedding END AS embedding
          |  FROM embeddings),
          |embbase AS (SELECT * FROM embdrift WHERE vec_id % 5 <> 0)"""
          .stripMargin
      // 2-iteration Lloyd centroid frame over `src` (kmeansCentroids:
      // first-8-by-id seeds, ONE decimal-exact round-6 mean update)
      def lloydCtes(x: String, src: String): String =
        s"""lemb$x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
           |lc0$x AS (SELECT CAST(vec_id AS BIGINT) AS cid, v AS cv FROM lemb$x
           |  ORDER BY vec_id ASC LIMIT $nc),
           |ls1$x AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS s
           |  FROM lemb$x e CROSS JOIN lc0$x c),
           |la1$x AS (SELECT vec_id, v, cluster FROM (SELECT vec_id, v,
           |    cid AS cluster, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY s DESC, cid ASC) AS rn FROM ls1$x) WHERE rn = 1),
           |lu1$x AS (SELECT cluster AS cid, pos,
           |    round(CAST(SUM(CAST(v[pos] AS DECIMAL(38,12))) AS DOUBLE)
           |      / COUNT(*), 6) AS m
           |  FROM (SELECT cluster, v, unnest(range(1, len(v) + 1)) AS pos
           |        FROM la1$x)
           |  GROUP BY cluster, pos),
           |cl$x AS (SELECT cid, list(m ORDER BY pos) AS cv FROM lu1$x
           |  GROUP BY cid)""".stripMargin
      // one twin's store replay + nprobe=1 serve over the drifted corpus
      def twin(x: String, train: String => String): String =
        s"""lsim$x AS (SELECT e.vec_id, c.cid,
           |    ${cosSql("e.embedding", "c.cv")} AS s
           |  FROM embdrift e CROSS JOIN cl$x c),
           |asg$x AS (SELECT vec_id, cid AS cluster FROM (SELECT *,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
           |  FROM lsim$x) WHERE rn = 1),
           |resid$x AS (SELECT e.vec_id,
           |    list_transform(range(1, 65),
           |      i -> CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) AS embedding
           |  FROM embdrift e JOIN asg$x a ON e.vec_id = a.vec_id
           |  JOIN cl$x c ON a.cluster = c.cid),
           |${pqTrainCtes(x, train, src = s"resid$x", ksub = ksub)},
           |qc$x AS (SELECT vec_id AS qid, cid AS cluster FROM (SELECT vec_id, cid,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY s DESC, cid ASC) AS rn
           |  FROM lsim$x WHERE vec_id < 20) WHERE rn <= $nprobe),
           |csl$x AS (SELECT c.cid AS cluster, ss.s, c.cv[ss.s*8+1:ss.s*8+8] AS csv
           |  FROM cl$x c CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss),
           |lut$x AS (SELECT q.qid, l.cluster, c.s, c.cid,
           |    round(list_sum(list_transform(range(1, 9),
           |      i -> (l.csv[i] + c.cv[i]) * q.qsv[i])), 6) AS pdot,
           |    round(list_sum(list_transform(range(1, 9),
           |      i -> (l.csv[i] + c.cv[i]) * (l.csv[i] + c.cv[i]))), 6) AS pnorm2
           |  FROM c1$x c JOIN qsub q ON c.s = q.s
           |  JOIN qc$x qc ON q.qid = qc.qid
           |  JOIN csl$x l ON l.cluster = qc.cluster AND l.s = c.s),
           |adc$x AS (SELECT l.qid, k.vec_id,
           |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
           |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
           |  FROM codes$x k JOIN asg$x av ON k.vec_id = av.vec_id
           |  JOIN lut$x l ON l.cluster = av.cluster AND k.s = l.s AND k.cid = l.cid
           |  GROUP BY l.qid, k.vec_id),
           |cands$x AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id,
           |    row_number() OVER (PARTITION BY a.qid
           |      ORDER BY round(a.adc_dot / (n.qnorm * sqrt(a.apx2)), 6) DESC,
           |        a.vec_id ASC) AS rn
           |  FROM adc$x a JOIN qn n ON a.qid = n.qid WHERE a.vec_id <> a.qid)
           |  WHERE rn <= 40),
           |pqr$x AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
           |    row_number() OVER (PARTITION BY c.qid
           |      ORDER BY ${cosSql("e.v", "n.qv")} DESC, c.vec_id ASC) AS rn
           |  FROM cands$x c JOIN embq e ON c.vec_id = e.vec_id
           |  JOIN qn n ON c.qid = n.qid) WHERE rn <= 10)""".stripMargin
      def row(name: String, cte: String): String =
        s"""SELECT '$name' AS method, CAST(COUNT(*) AS BIGINT) AS hits,
           |  CAST(20 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
           |  round(CAST(COUNT(*) AS DOUBLE) / 200.0, 6) AS avg_recall
           |FROM $cte c JOIN truth t ON c.qid = t.qid AND c.vec_id = t.vec_id"""
          .stripMargin
      s"""WITH $driftCte,
         |qsd AS (SELECT vec_id AS qid, embedding AS qv FROM embdrift
         |  WHERE vec_id < 20),
         |scoredd AS (SELECT q.qid, e.vec_id,
         |    ${cosSql("e.embedding", "q.qv")} AS cosine
         |  FROM embdrift e CROSS JOIN qsd q WHERE e.vec_id <> q.qid),
         |truth AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM scoredd) WHERE rn <= 10),
         |embq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embdrift),
         |qsub AS (SELECT vec_id AS qid, ss.s, v[ss.s*8+1:ss.s*8+8] AS qsv
         |  FROM embq CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss
         |  WHERE vec_id < 20),
         |qn AS (SELECT vec_id AS qid,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm, v AS qv
         |  FROM embq WHERE vec_id < 20),
         |${lloydCtes("lf", "embbase")},
         |${twin("lf", id => s"$id % 5 <> 0")},
         |${lloydCtes("lr", "embdrift")},
         |${twin("lr", _ => "TRUE")}
         |${row(s"ivfpq_lloyd${tag}_frozen_drift", "pqrlf")}
         |UNION ALL
         |${row(s"ivfpq_lloyd${tag}_retrain_drift", "pqrlr")}""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 10)),

    // SRP-LSH (Charikar sketch) at the default probe radius — the ANN path
    // a user should actually call: avg recall@10 0.88/0.93 (sf0.01/0.1).
    "q_ann_lsh" -> ((s, dir) =>
      Similarity.srpTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5)),

    "q_embedding_stats" -> ((s, dir) =>
      Similarity.vectorStats(Tables.embeddings(s, dir), "vec_id", "embedding",
        extraCols = Seq("label"))),

    // Int8 symmetric quantization audit — per-vector reconstruction error
    // for the serving-side compression decision. Pure projection.
    "q_embedding_quant" -> ((s, dir) =>
      Similarity.quantizeAudit(Tables.embeddings(s, dir), "vec_id", "embedding")),

    "q_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, nCentroids = 8)),

    // IVF served from the cluster-PARTITIONED store: the probe cluster
    // prunes to a partition directory at planning time (PartitionFilters)
    // instead of post-filtering a full scan. Same oracle as q_ann_ivf.
    "q_ann_ivf_served" -> ((s, dir) =>
      IvfStore.topK(s, dir, queryId = 0L, k = 5)),

    // Product quantization: per-subspace codebooks + ADC lookup-table
    // scoring (codes, not raw floats) + exact re-rank of the top-40.
    // m=8 × ksub=8 → 24-bit codes; measured recall@5 vs brute force = 0.8
    // at sf0.01 (rerank is the recall/cost knob; doubling ksub and rerank
    // measured no gain on this corpus).
    "q_ann_pq" -> ((s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, m = 8, ksub = 8, rerank = 40)),

    // PQ served from the persisted codebook+codes (the deployment shape
    // the ad-hoc entry's doc promises): per-query cost is the m-byte
    // codes scan + LUT, never a retrain. Same oracle as q_ann_pq.
    "q_ann_pq_served" -> ((s, dir) =>
      PqStore.topK(s, dir, queryId = 0L, k = 5, rerank = 40)),

    // PQ at the NON-TOY codebook size (ksub=256 — the packed byte
    // layout's full ordinal ceiling; round-14 verdict item 7): same
    // serve path, same byte cost (m bytes/vector), tighter quantization.
    "q_ann_pq_big" -> ((s, dir) =>
      PqStore.topKAt(s, PqStore.ensureBuiltBig(s, dir),
        Tables.embeddings(s, dir), queryId = 0L, k = 5, rerank = 40)),

    // Same sketch, wider Hamming ball — multi-probe generalized to a radius
    // expansion (recall ≈ 0.99 at ~42% candidates; the recall/cost knob).
    "q_ann_multiprobe" -> ((s, dir) =>
      Similarity.srpTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, radius = Similarity.SrpRadiusWide)),

    // FILTERED vector search (the vector-DB metadata-predicate primitive):
    // top-5 among vectors sharing query 0's label — the predicate rides
    // the sketch candidate scan, shrinking (never diluting) the rerank.
    // The query label is a serving-boundary point read, so the predicate
    // is a literal both engines apply identically.
    "q_ann_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qLabel = emb.filter(col("vec_id") === 0L)
        .select(col("label")).head().getInt(0)
      Similarity.srpTopKFiltered(emb, "vec_id", "embedding", queryId = 0L,
        k = 5, pred = col("label") === lit(qLabel))
    }),

    // Filtered search served from the LABEL-PARTITIONED sketch store
    // (round-14 verdict item 6): identical results — same oracle — but
    // the sketch scan prunes to ONE label partition directory at
    // planning time instead of riding the predicate through a full
    // sketch scan. The layout is what lets a deployment WIDEN the
    // radius for rare strata at lower cost than the flat shape (the
    // measured story: q_ann_filtered_recall_part).
    "q_ann_filtered_served" -> ((s, dir) =>
      SrpLabelStore.topKFiltered(s, dir, queryId = 0L, k = 5)),

    // MMR diversity rerank (Carbonell–Goldstein): greedy λ-tradeoff over
    // a 20-candidate relevance pool — the post-ANN rerank every RAG
    // serving stack runs; constant-size rounds, corpus cost lives in the
    // candidate generator.
    "q_mmr" -> ((s, dir) =>
      Similarity.mmrSelect(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, poolSize = 20, lambda = 0.5)),

    // SQ8 serve audit (FAISS IndexScalarQuantizer shape): candidate pass
    // scores against dequantized-int8 vectors (asymmetric — query stays
    // exact), exact rerank on raw floats — the q_matryoshka question
    // asked of the 4x-smaller-scan compression; accuracy measured by
    // q_ann_recall_sq8.
    "q_ann_sq8" -> ((s, dir) =>
      Similarity.sq8TopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, rerank = 40)),

    // The PERSISTED SQ8 artifact (round-14 verdict item 2): identical
    // ranking served from packed int8 codes + one fp64 scale per vector
    // — the candidate scan reads d+8 bytes instead of 4d (the byte
    // savings the in-plan audit's scaladoc promised; measured free at
    // recall@10 = 1.0). Same oracle as q_ann_sq8: the decode reproduces
    // the dequantized doubles bit-for-bit.
    "q_ann_sq8_served" -> ((s, dir) =>
      Sq8Store.topK(s, dir, queryId = 0L, k = 5, rerank = 40)),

    // IVF × SQ8 composed (FAISS IndexIVFScalarQuantizer): the candidate
    // pass reads (d+8) bytes × N·nprobe/nCentroids — partition pruning
    // COMPOUNDED with the measured-free int8 compression. nprobe=2:
    // two pruned directories of the 8 (the multi-probe knob).
    "q_ann_ivfsq8_served" -> ((s, dir) =>
      IvfSq8Store.topK(s, dir, queryId = 0L, k = 5, rerank = 40,
        nprobe = IvfSq8Store.DefaultNprobe)),

    // k ∝ N for the composed store (round-15's one weak flag): at the
    // fixed nc=8 the candidate pass reads a CONSTANT nprobe/8 = 25% of
    // the corpus at ANY size; here nCentroids = ceil(N / 50) is resolved
    // at build time and persisted, so a probe reads ~50·nprobe int8 rows
    // no matter how large N grows. Serve width clamped to the persisted
    // cell count (the q_ann_ivfpq_auto pattern; oracle mirrors with
    // LEAST).
    "q_ann_ivfsq8_auto" -> ((s, dir) => {
      val dest = IvfSq8Store.ensureBuiltAuto(s, dir)
      val nprobe = math.min(IvfSq8Store.AutoNprobe,
        AnnMeta.readKey(dest, "nCentroids"))
      IvfSq8Store.topKAt(s, dest, Tables.embeddings(s, dir), queryId = 0L,
        k = 5, rerank = 40, nprobe = nprobe)
    }),

    // The drift measurement's ACTUATOR (round-15 verdict item 1):
    // q_ann_drift_lloyd_big priced WHAT coarse retraining buys (+0.095
    // recall@10 at production cell counts); this gate pins the policy
    // that DECIDES — RetrainPolicy's appended-mass-vs-train-mass proxy
    // over a clean store (quiet), the q_ann_drift fixture shape (fires
    // at the default threshold, rebuild runs under the store lock), and
    // the post-retrain re-assess (quiet again). The oracle derives every
    // number from corpus counts — the decision needs nothing more.
    "q_ann_retrain_policy" -> ((s, dir) =>
      graft.search.RetrainPolicy.auditRows(s, dir)),

    // The SERVED ANN path: identical ranking from the persisted sketch
    // store (the BM25Index / SimHashStore build-once split) — the sketch
    // parquet is scanned for the Hamming filter, vectors join in only for
    // the survivors' exact rerank. Same oracle as q_ann_lsh.
    // The LIFECYCLE twin under the driver hash gate: the store is built
    // from 80% of the vectors, the rest appended, then compacted — and
    // the probe must hash-match q_ann_lsh's oracle verbatim (append ≡
    // rebuild for per-row signatures, checked by the driver, not a spec).
    "q_ann_lsh_incr" -> ((s, dir) =>
      SrpStore.topKOver(SrpStore.ensureBuiltIncremental(s, dir),
        Tables.embeddings(s, dir), queryId = 0L, k = 5)),

    // The STREAMING loop closed for the ANN family (round-15 verdict
    // item 5): the base builds batch, the last 20% arrives through a
    // real file-triggered Structured Streaming source feeding
    // StreamSinks.annIngestSink (per-batch apply = the store's own
    // id-keyed upsert — the replay-idempotent path), then one compact.
    // Same oracle as q_ann_lsh verbatim: streamed ingest ≡ batch build.
    "q_ann_lsh_stream" -> ((s, dir) =>
      SrpStore.topKOver(SrpStore.ensureBuiltStreamed(s, dir),
        Tables.embeddings(s, dir), queryId = 0L, k = 5)),

    // Same lifecycle gate for IVF: frozen-centroid append ≡ rebuild
    // exactly (the base keeps every seed id), q_ann_ivf's oracle verbatim.
    "q_ann_ivf_incr" -> ((s, dir) =>
      IvfStore.topKAt(s, IvfStore.ensureBuiltIncremental(s, dir),
        queryId = 0L, k = 5)),

    // k ∝ N for the flat IVF store (round-14 verdict item 7): nCentroids
    // = ceil(N / 50) resolved at build time and persisted — the oracle
    // derives the same count-based value in SQL.
    "q_ann_ivf_auto" -> ((s, dir) =>
      IvfStore.topKAt(s, IvfStore.ensureBuiltAuto(s, dir),
        queryId = 0L, k = 5)),

    // PQ's lifecycle gate: codebook trained on the 80% base, the rest
    // frozen-codebook-appended, codes compacted. Append ≢ full rebuild
    // here BY DESIGN (retraining would invalidate every existing code),
    // so this carries its OWN oracle replaying the incremental
    // construction — train CTEs over the base, codes for all vectors.
    "q_ann_pq_incr" -> ((s, dir) =>
      PqStore.topKAt(s, PqStore.ensureBuiltIncremental(s, dir),
        Tables.embeddings(s, dir), queryId = 0L, k = 5, rerank = 40)),

    "q_ann_lsh_served" -> ((s, dir) =>
      SrpStore.topK(s, dir, queryId = 0L, k = 5)),

    // IVF-PQ with residual encoding (IVFADC): coarse centroid + PQ over
    // residuals — the ANN layout whose candidate pass reads
    // m bytes × N/nCentroids (the IVF and PQ savings COMPOUND). Ad-hoc
    // twin trains in-plan; scoring is flat-PQ ADC over the probe
    // cluster's shifted codebook, so the oracle chain is shared.
    "q_ann_ivfpq" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, k = 5, nCentroids = 8, m = 8, ksub = 8, rerank = 40)),

    // Served from the persisted store: probe cluster resolves from the
    // forward table and prunes the packed-codes scan to ONE partition
    // directory at planning time. Same oracle as q_ann_ivfpq.
    "q_ann_ivfpq_served" -> ((s, dir) =>
      IvfPqStore.topK(s, dir, queryId = 0L, k = 5, rerank = 40)),

    // The lifecycle gate: centroids + residual codebook train on the 80%
    // base, the rest arrives as a frozen-space appended batch, then the
    // store compacts. Like PQ, append ≢ rebuild BY DESIGN, so this
    // carries its OWN oracle replaying the incremental construction.
    "q_ann_ivfpq_incr" -> ((s, dir) =>
      IvfPqStore.topKAt(s, IvfPqStore.ensureBuiltIncremental(s, dir),
        Tables.embeddings(s, dir), queryId = 0L, k = 5, rerank = 40)),

    // The NON-TOY configuration gate (round-13 verdict item 1): the same
    // store family at nCentroids=64 / m=8 / ksub=256 — the k ∝ N scale
    // path the scaladoc prescribes and the full byte-ordinal range the
    // packed layout claims to survive, both previously untested (and
    // round 13's residual-codebook collapse showed tiny-k degeneracies
    // slip past twin-replay oracles). nprobe=4: at 64 cells a single
    // probe holds too few members — the widening IS the IVFADC
    // recall/cost contract. Params come back from the store's own
    // params.txt; the oracle instantiates the identical (nc, ksub,
    // nprobe) template.
    "q_ann_ivfpq_big" -> ((s, dir) =>
      IvfPqStore.topKAt(s, IvfPqStore.ensureBuiltBig(s, dir),
        Tables.embeddings(s, dir), queryId = 0L, k = 5, rerank = 40,
        nprobe = IvfPqStore.BigNprobe)),

    // k ∝ N executable: nCentroids = ceil(N / 50) resolved at build time
    // and persisted — per-cell population ~constant at any corpus size.
    "q_ann_ivfpq_auto" -> ((s, dir) => {
      val dest = IvfPqStore.ensureBuiltAuto(s, dir)
      // serve width clamped to the persisted store's own cell count: a
      // corpus with N <= AutoCellSize builds ONE cell, where a fixed
      // nprobe=2 would fail topKAt's nprobe <= nCentroids contract —
      // the clamp reads the store's persisted choice, oracle mirrors
      // with LEAST(AutoNprobe, nc)
      val nprobe = math.min(IvfPqStore.AutoNprobe,
        AnnMeta.readKey(dest, "nCentroids"))
      IvfPqStore.topKAt(s, dest, Tables.embeddings(s, dir), queryId = 0L,
        k = 5, rerank = 40, nprobe = nprobe)
    }),

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

    // Topic-balanced resampling: the same Lloyd clustering, every cluster
    // capped at 40 docs by content-hash priority — dominant topics
    // trimmed, small topics pass whole.
    "q_topic_balance" -> ((s, dir) =>
      Similarity.topicBalance(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 2, perClusterCap = 40)),

    // The scale path: same threshold semantics, candidates bounded by
    // auto-k clusters with a 2-probe final assignment — O(N) candidate
    // volume by construction (probes²·targetClusterSize per vector,
    // constant as N grows). Replaces the round-9/10 SRP banding whose
    // candidate volume is provably Ω(N^1.63) at this threshold (the
    // three-point sweep measured 135 s at sf1; ρ analysis in the operator
    // Scaladoc — banding stays shipped for the high-threshold domain).
    // Recall measured by q_dedup_recall_clustered: 13/14 at 19%
    // candidate fraction on the fixture.
    "q_dedup_embedding_bucketed" -> ((s, dir) =>
      Similarity.cosineNearDupPairsClustered(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45)),

    // The SAME operator on the 100-TB centroid transport: forced 3-way
    // centroid sharding replaces every broadcast of the centroid table
    // with a SHUFFLE_HASH equi-join (vector-salt × centroid-shard), and
    // the oracle is the SAME SQL as q_dedup_embedding_bucketed — the
    // driver hash gate is the proof that transport is semantics-blind
    // (identical cosines, identical tie-breaks, identical pairs).
    "q_dedup_clustered_sharded" -> ((s, dir) =>
      Similarity.cosineNearDupPairsClustered(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45,
        centroidShards = Some(3))),

    // Recall audit for the banded scale path, mirroring q_dedup_recall's
    // contract for MinHash: exact pairs (capped input, so the oracle's
    // quadratic side stays constant-size) left-joined to the banded
    // pairs → one (n_exact, n_found, recall) row. SimilaritySpec pins
    // the ≥0.8 floor; the oracle hash-checks the measured value.
    "q_dedup_recall_emb" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.45).select("vec_a", "vec_b")
      val found = Similarity.cosineNearDupPairsSrp(emb, "vec_id", "embedding",
        threshold = 0.45).select(col("vec_a"), col("vec_b"), lit(1L).as("__f"))
      exact.join(found, Seq("vec_a", "vec_b"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("__f")).as("n_found"),
          round(count(col("__f")) / greatest(count(lit(1)), lit(1L)), 4)
            .as("recall"))
    }),

    // Recall audit for the CLUSTERED scale path (the shipped
    // q_dedup_embedding_bucketed implementation), same contract: exact
    // pairs on the capped fixture left-joined to the cluster-bounded
    // pairs → one (n_exact, n_found, recall) row, floor ≥0.8 pinned in
    // SimilaritySpec, value hash-checked by the oracle.
    "q_dedup_recall_clustered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.45).select("vec_a", "vec_b")
      val found = Similarity.cosineNearDupPairsClustered(emb, "vec_id",
        "embedding", threshold = 0.45)
        .select(col("vec_a"), col("vec_b"), lit(1L).as("__f"))
      exact.join(found, Seq("vec_a", "vec_b"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("__f")).as("n_found"),
          round(count(col("__f")) / greatest(count(lit(1)), lit(1L)), 4)
            .as("recall"))
    }),

    // SemDeDup: k-means clusters bound the near-dup pair generation, then
    // lowest-id-wins pruning inside each cluster — the published semantic-
    // dedup recipe, hash-checked end-to-end (clustering AND pruning).
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 2, threshold = 0.45)),

    // Auto-k SemDeDup — the configuration a growing corpus actually runs:
    // k = ceil(N / 50) keeps per-cluster population (and so the quadratic
    // verify step) bounded as N scales. Hash-checked against an oracle
    // that derives k from the same COUNT.
    "q_semdedup_auto" -> ((s, dir) =>
      Similarity.semDedupAuto(Tables.embeddings(s, dir), "vec_id", "embedding",
        targetClusterSize = 50L, iters = 2, threshold = 0.45)),

    // Hard-negative mining: per anchor (first 20 vectors), the top-3 most
    // similar vectors with a DIFFERENT label — the pairs a contrastive
    // trainer wants. One anchor broadcast + one scored scan.
    "q_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir), "vec_id", "embedding",
        "label", nQueries = 20, k = 3)),

    // Diverse coreset selection: greedy k-center (farthest-point) over
    // the embedding space, seed vec 0, k=5 — the curation step that picks
    // a coverage sample instead of oversampling dense modes.
    "q_coreset" -> ((s, dir) =>
      Similarity.kCenterSelect(Tables.embeddings(s, dir), "vec_id", "embedding",
        seedId = 0L, k = 5)),

    // Embedding-space drift: pairwise cosine between per-label centroids.
    "q_centroid_sim" -> ((s, dir) =>
      Similarity.labelCentroidSimilarity(Tables.embeddings(s, dir),
        "label", "embedding")),

    // Exact dimension-covariance matrix (whitening/PCA prep): one HOF
    // explode + combinable cell groupBy; shuffle is d(d+1)/2 cells per
    // partition regardless of N.
    "q_embedding_cov" -> ((s, dir) =>
      Similarity.covarianceMatrix(Tables.embeddings(s, dir), "embedding")),

    // Deterministic ±1 Johnson–Lindenstrauss projection to 8 real coords —
    // the matrix is md5-derived at plan time, the operator a shuffle-free
    // codegen projection.
    "q_rand_project" -> ((s, dir) =>
      Similarity.randomProjection(Tables.embeddings(s, dir), "vec_id",
        "embedding")),

    // MEASURED avg recall@10 of each ANN method against exact brute-force
    // truth, averaged over 20 query vectors — single-query recall is luck
    // (round 7's audit scored IVF 0.9 on query 0; the 20-query average is
    // 0.47, while the SRP sketch holds 0.88+). One broadcast of the 20
    // query signatures, one scored scan shared by truth and both radii.
    // Matryoshka truncation audit: the 16-dim-prefix top-5 vs the full
    // 64-dim top-5 for query 0 — the agreement measurement behind
    // serve-short/rerank-full MRL deployments. One scored scan per
    // ranking, full list joined as a k-row broadcast flag.
    "q_matryoshka" -> ((s, dir) =>
      Similarity.matryoshkaAudit(Tables.embeddings(s, dir), "vec_id",
        "embedding", queryId = 0L, k = 5, prefixDims = 16)),

    // ===== Per-method MEASURED recall@10 rows (round-13 verdict item 5:
    // the 7-method monolith was the suite's heaviest entry and grew every
    // round, hiding per-method cost and regressions in one number). Each
    // ANN method is ONE audit query joining its candidates to the SHARED
    // persisted exact ground truth ([[RecallTruth]] — the 20 × N scored
    // scan is computed once per corpus generation, not once per method),
    // so the split adds bench attribution without multiplying the audit's
    // dominant cost. Round-7 lesson throughout: unmeasured ANN accuracy
    // can be 0.0 — every serving path keeps a measured row.
    "q_ann_recall_lsh" -> ((s, dir) =>
      lshRecall(s, dir, Similarity.SrpRadius, "lsh")),
    "q_ann_recall_lsh_mp" -> ((s, dir) =>
      lshRecall(s, dir, Similarity.SrpRadiusWide, "lsh_mp")),
    "q_ann_recall_ivf" -> ((s, dir) => ivfRecall(s, dir, 1, "ivf")),
    // the k ∝ N configuration's accuracy — cells of ~50 rows, nprobe=1
    "q_ann_recall_ivf_auto" -> ((s, dir) =>
      ivfRecall(s, dir, 1, "ivf_auto",
        nc = Similarity.autoK(Tables.embeddings(s, dir).count(),
          IvfStore.AutoCellSize))),
    // nprobe = 3: rank all 8 centroids per query, scan the top 3 clusters
    // — the classic IVF recall knob, measured next to the sketch paths
    "q_ann_recall_ivf_mp" -> ((s, dir) => ivfRecall(s, dir, 3, "ivf_mp")),
    "q_ann_recall_pq" -> ((s, dir) =>
      recallRow("pq",
        Similarity.pqTopKMultiQuery(Tables.embeddings(s, dir), "vec_id",
          "embedding", maxQid = 20, k = 10, m = 8, ksub = 8, rerank = 40),
        RecallTruth.ensureBuilt(s, dir))),
    "q_ann_recall_pq_served" -> ((s, dir) =>
      recallRow("pq_served",
        PqStore.topKMulti(s, dir, maxQid = 20, k = 10, rerank = 40),
        RecallTruth.ensureBuilt(s, dir))),
    // the ksub=256 codebook's measured accuracy from the persisted store
    "q_ann_recall_pq_big" -> ((s, dir) =>
      recallRow("pq_big",
        PqStore.topKMultiAt(s, PqStore.ensureBuiltBig(s, dir),
          Tables.embeddings(s, dir), maxQid = 20, k = 10, rerank = 40),
        RecallTruth.ensureBuilt(s, dir))),
    "q_ann_recall_ivfpq" -> ((s, dir) =>
      recallRow("ivfpq",
        Similarity.ivfPqTopKMultiQuery(Tables.embeddings(s, dir), "vec_id",
          "embedding", maxQid = 20, k = 10, nCentroids = 8, m = 8, ksub = 8,
          rerank = 40),
        RecallTruth.ensureBuilt(s, dir))),
    // the NON-TOY configuration's measured accuracy (verdict item 1's
    // recall row): nc=64 / ksub=256 served from the persisted big store
    // at nprobe=4
    "q_ann_recall_ivfpq_big" -> ((s, dir) =>
      recallRow("ivfpq_big",
        IvfPqStore.topKMultiAt(s, IvfPqStore.ensureBuiltBig(s, dir),
          Tables.embeddings(s, dir), maxQid = 20, k = 10, rerank = 40,
          nprobe = IvfPqStore.BigNprobe),
        RecallTruth.ensureBuilt(s, dir))),

    // SQ8's measured accuracy next to its peers (the round-7 rule).
    "q_ann_recall_sq8" -> ((s, dir) =>
      recallRow("sq8",
        Similarity.sq8TopKMultiQuery(Tables.embeddings(s, dir), "vec_id",
          "embedding", maxQid = 20, k = 10, rerank = 40),
        RecallTruth.ensureBuilt(s, dir))),
    // the persisted store's own measured accuracy row — must equal the
    // in-plan audit's (identical dequantized doubles), pinning that the
    // packed artifact loses nothing the decision was measured on
    "q_ann_recall_sq8_served" -> ((s, dir) =>
      recallRow("sq8_served",
        Sq8Store.topKMulti(s, dir, maxQid = 20, k = 10, rerank = 40),
        RecallTruth.ensureBuilt(s, dir))),
    // the composition's accuracy: quantization contributes ZERO loss
    // inside the probed cells (sq8 is recall-1.0 here), so this row
    // reads as the pure IVF cluster ceiling at nprobe=2
    "q_ann_recall_ivfsq8" -> ((s, dir) =>
      recallRow("ivfsq8",
        IvfSq8Store.topKMulti(s, dir, maxQid = 20, k = 10, rerank = 40,
          nprobe = IvfSq8Store.DefaultNprobe),
        RecallTruth.ensureBuilt(s, dir))),
    // the auto configuration's accuracy over the same shared truth —
    // cells of ~50 rows at nprobe ≤ 2, i.e. the scale-path recall the
    // composed store actually serves at
    "q_ann_recall_ivfsq8_auto" -> ((s, dir) => {
      val dest = IvfSq8Store.ensureBuiltAuto(s, dir)
      val nprobe = math.min(IvfSq8Store.AutoNprobe,
        AnnMeta.readKey(dest, "nCentroids"))
      recallRow("ivfsq8_auto",
        IvfSq8Store.topKMultiAt(s, dest, Tables.embeddings(s, dir),
          maxQid = 20, k = 10, rerank = 40, nprobe = nprobe),
        RecallTruth.ensureBuilt(s, dir))
    }),

    // PER-STRATUM recall for FILTERED search (round-13 verdict item 4):
    // the classic filtered-ANN failure is that a predicate riding the
    // sketch scan degrades recall for RARE strata — few same-stratum
    // vectors survive the Hamming ball, so the filtered top-k starves
    // precisely where the filter matters most. Round-7 rule: that is a
    // measurement, not a scaladoc caveat. Queries = ids < 20 filtered to
    // their OWN label; truth = exact same-label top-10; strata = labels
    // ranked by corpus frequency, bottom half 'rare' (deterministic
    // count-then-label rank, replayed by the oracle). Micro-averaged
    // per stratum: sum(hits)/sum(truth rows) — per-query truths can be
    // short where a label is thin, and that shortness IS the signal.
    "q_ann_filtered_recall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val e = Similarity.srpSignature(emb, "embedding")
      val qs = e.filter(col("vec_id") < RecallTruth.NumQueries)
        .select((col("vec_id").as("qid") +: col("embedding").as("__qv") +:
          col("label").as("__qlabel") +:
          (0 until 4).map(w => col(s"__w$w").as(s"__qw$w"))): _*)
      // scored feeds BOTH the truth and the candidate top-k — cut it so the
      // 20 × N same-label scored scan runs once (guide §1.2 / §5)
      val scored = e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid") &&
          col("label") === col("__qlabel"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine"),
          Similarity.srpHamming("__w", "__qw").as("__ham"))
        .cutLineage()
      val truth = topPerQuery(scored)
      val cand = topPerQuery(
        scored.filter(col("__ham") <= Similarity.SrpRadius))
      // the rank window is over the POST-AGGREGATION label table (one row
      // per distinct label — allowlisted in PlanHealthSpec as bounded);
      // the label-cardinality denominator is a broadcast 1-row aggregate,
      // not a second global window
      val nlab = emb.select(countDistinct(col("label")).as("__nlab"))
      val labStrata = emb.groupBy(col("label"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rk", row_number().over(
          Window.orderBy(col("__n").asc, col("label").asc)))
        .crossJoin(broadcast(nlab))
        .select(col("label").as("__qlabel"),
          when(col("__rk") <= col("__nlab") / 2, lit("rare"))
            .otherwise(lit("common")).as("stratum"))
      val perQuery = truth
        .join(cand.withColumn("__hit", lit(1)), Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("__truth_n"),
          count(col("__hit")).cast("long").as("__hits"))
      perQuery
        .join(broadcast(qs.select(col("qid"), col("__qlabel"))), "qid")
        .join(broadcast(labStrata), "__qlabel")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          sum(col("__hits")).cast("long").as("hits"),
          sum(col("__truth_n")).cast("long").as("truth_rows"),
          round(sum(col("__hits")).cast("double") /
            sum(col("__truth_n")).cast("double"), 6).as("avg_recall"))
        .orderBy(col("stratum"))
    }),

    // The ESCALATION the tripwire above points at, measured (round-14
    // verdict item 6): the same per-stratum recall computed from the
    // LABEL-PARTITIONED store at the WIDE radius. The layout pays for
    // the wider ball: a label-filtered query scans ONE label partition
    // (avg_scan_rows, the per-query pruned read) instead of the full
    // N-row sketch table (full_scan_rows — what the predicate-inside-
    // scan shape reads per query set), so rare-stratum recall is
    // recovered at FEWER scan rows than the flat shape's narrow radius.
    "q_ann_filtered_recall_part" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.expressions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val store = SrpLabelStore.read(s, SrpLabelStore.ensureBuilt(s, dir))
      val qs = Similarity.srpSignature(
          emb.filter(col("vec_id") < RecallTruth.NumQueries), "embedding")
        .select((col("vec_id").as("qid") +: col("embedding").as("__qv") +:
          col("label").as("__qlabel") +:
          (0 until 4).map(w => col(s"__w$w").as(s"__qw$w"))): _*)
      // truth: exact same-label top-10 (identical to the flat row's)
      val truth = topPerQuery(emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid") &&
          col("label") === col("__qlabel"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine")))
      // candidates: the store's label partitions at the WIDE radius;
      // exact cosine only for ball survivors (the serve shape)
      val cand = topPerQuery(store.crossJoin(broadcast(qs))
        .filter(col("label") === col("__qlabel") &&
          col("vec_id") =!= col("qid") &&
          Similarity.srpHamming("__w", "__qw") <= Similarity.SrpRadiusWide)
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine")))
      val nlab = emb.select(countDistinct(col("label")).as("__nlab"))
      val labStrata = emb.groupBy(col("label"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rk", row_number().over(
          Window.orderBy(col("__n").asc, col("label").asc)))
        .crossJoin(broadcast(nlab))
        .select(col("label").as("__qlabel"), col("__n").as("__labn"),
          when(col("__rk") <= col("__nlab") / 2, lit("rare"))
            .otherwise(lit("common")).as("stratum"))
      val perQuery = truth
        .join(cand.withColumn("__hit", lit(1)), Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("__truth_n"),
          count(col("__hit")).cast("long").as("__hits"))
      val total = emb.select(count(lit(1)).as("full_scan_rows"))
      perQuery
        .join(broadcast(qs.select(col("qid"), col("__qlabel"))), "qid")
        .join(broadcast(labStrata), "__qlabel")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          sum(col("__hits")).cast("long").as("hits"),
          sum(col("__truth_n")).cast("long").as("truth_rows"),
          round(sum(col("__hits")).cast("double") /
            sum(col("__truth_n")).cast("double"), 6).as("avg_recall"),
          // per-query pruned-scan size: the query label's partition rows
          round(avg(col("__labn")), 6).as("avg_scan_rows"))
        .crossJoin(broadcast(total))
        .orderBy(col("stratum"))
    }),

    // Recall-under-DRIFT audit (round-12 verdict item 4): the 20% append
    // batch arrives from a SHIFTED distribution (+0.25 per coordinate),
    // runs through PqStore's own incremental chain (codebook frozen on
    // the 80% base), and its recall@10 over 20 queries is measured next
    // to a codebook RETRAINED on the drifted corpus — the gap is the
    // measured price of the frozen-space append contract, the row that
    // says when a rebuild stops being optional. PQ only: SRP signatures
    // are per-row (append ≡ rebuild bit-for-bit on any data) and IVF's
    // incr chain keeps every seed id in the base, so incr and rebuild
    // assign against identical centroids — zero delta by construction
    // for both (argued in the driftedEmbeddings scaladoc), measured for
    // the one store with trained state.
    "q_ann_drift" -> ((s, dir) => {
      // register up front: every store ensure* may be stamp-fresh (and
      // thus register nothing) in a scoped run, while the recall joins
      // analyze eagerly
      graft.expressions.GraftFunctions.register(s)
      val drifted = Similarity.driftedEmbeddings(Tables.embeddings(s, dir))
      val destIncr = PqStore.ensureBuiltDrift(s, dir)
      val destFull = PqStore.ensureBuiltDriftRebuild(s, dir)
      // exact truth from the stamped drift-truth artifact (identical
      // formula — RecallTruth.compute over the drifted corpus): the
      // 20 × N brute-force scan is computed once per corpus generation
      // instead of once per run × four union branches (r16 verdict
      // item 4; the in-plan subtree WAS exchange-reused across branches
      // but still recomputed per bench rep)
      val truth = RecallTruth.ensureBuiltDrifted(s, dir)
      def recallOf(method: String, cand: DataFrame): DataFrame =
        cand.join(truth, Seq("qid", "vec_id"))
          .agg(count(lit(1)).cast("long").as("hits"))
          .select(lit(method).as("method"), col("hits"),
            lit(20L).as("n_queries"), lit(10L).as("k"),
            round(col("hits").cast("double") / 200.0, 6).as("avg_recall"))
      // IVF-PQ rows: the coarse centroids (ids < 8 of the drifted corpus)
      // are IDENTICAL for incr and rebuild by construction, so this pair
      // isolates exactly the residual-codebook staleness — the clean
      // experiment PQ's single-artifact space can't run
      val ipIncr = IvfPqStore.ensureBuiltDrift(s, dir)
      val ipFull = IvfPqStore.ensureBuiltDriftRebuild(s, dir)
      recallOf("pq_incr_drift",
          PqStore.topKMultiAt(s, destIncr, drifted, maxQid = 20, k = 10))
        .unionByName(recallOf("pq_rebuild_drift",
          PqStore.topKMultiAt(s, destFull, drifted, maxQid = 20, k = 10)))
        .unionByName(recallOf("ivfpq_incr_drift",
          IvfPqStore.topKMultiAt(s, ipIncr, drifted, maxQid = 20, k = 10)))
        .unionByName(recallOf("ivfpq_rebuild_drift",
          IvfPqStore.topKMultiAt(s, ipFull, drifted, maxQid = 20, k = 10)))
    }),

    // COARSE-CENTROID staleness under drift (round-13 verdict item 2):
    // q_ann_drift's IVF twins share coarse centroids by deterministic
    // id-seeding, so coarse staleness — the dominant IVF drift failure
    // (a stale router scans the wrong cell; rerank can't recover what
    // the candidate pass never read) — was never measured. Here the
    // frozen twin Lloyd-trains coarse + residual artifacts on the CLEAN
    // 80% base and frozen-space-appends the shifted 20%; the retrained
    // twin runs 2 Lloyd iterations on the full drifted corpus. Both
    // serve through the identical store path; the gap vs the
    // residual-only gap attributes the loss between the two artifacts.
    "q_ann_drift_lloyd" -> ((s, dir) => {
      graft.expressions.GraftFunctions.register(s)
      val drifted = Similarity.driftedEmbeddings(Tables.embeddings(s, dir))
      val frozen = IvfPqStore.ensureBuiltDriftLloyd(s, dir)
      val retrained = IvfPqStore.ensureBuiltDriftLloydRebuild(s, dir)
      // stamped drift-truth artifact, not an in-plan scan — see q_ann_drift
      val truth = RecallTruth.ensureBuiltDrifted(s, dir)
      recallRow("ivfpq_lloyd_frozen_drift",
          IvfPqStore.topKMultiAt(s, frozen, drifted, maxQid = 20, k = 10),
          truth)
        .unionByName(recallRow("ivfpq_lloyd_retrain_drift",
          IvfPqStore.topKMultiAt(s, retrained, drifted, maxQid = 20, k = 10),
          truth))
    }),

    // The same Lloyd-coarse drift experiment AT THE BIG CONFIGURATION
    // (round-14 verdict item 3): coarse staleness binds hardest at high
    // nc (small cells ⇒ a stale router misses membership more often) —
    // the regime the toy nc=8 audit could not observe. nc=64 /
    // ksub=256, served at nprobe=4 like every big-config gate; same
    // parameterized oracle template as the toy rows.
    "q_ann_drift_lloyd_big" -> ((s, dir) => {
      graft.expressions.GraftFunctions.register(s)
      val drifted = Similarity.driftedEmbeddings(Tables.embeddings(s, dir))
      val frozen = IvfPqStore.ensureBuiltDriftLloydBig(s, dir)
      val retrained = IvfPqStore.ensureBuiltDriftLloydBigRebuild(s, dir)
      // stamped drift-truth artifact, not an in-plan scan — see q_ann_drift
      val truth = RecallTruth.ensureBuiltDrifted(s, dir)
      recallRow("ivfpq_lloydbig_frozen_drift",
          IvfPqStore.topKMultiAt(s, frozen, drifted, maxQid = 20, k = 10,
            nprobe = IvfPqStore.BigNprobe),
          truth)
        .unionByName(recallRow("ivfpq_lloydbig_retrain_drift",
          IvfPqStore.topKMultiAt(s, retrained, drifted, maxQid = 20, k = 10,
            nprobe = IvfPqStore.BigNprobe),
          truth))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_embedding_cov" ->
      """WITH c AS (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS i
        |        FROM embeddings)),
        |m AS (SELECT i, CAST(SUM(CAST(x AS DECIMAL(20,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mu
        |  FROM c GROUP BY i),
        |p AS (SELECT a.i AS di, b.i AS dj, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CAST(round(a.x * b.x, 12) AS DECIMAL(38,12))
        |        * 1000000000000 AS HUGEINT)) AS DOUBLE)
        |      / CAST(1000000000000 AS DOUBLE) AS sxy
        |  FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY a.i, b.i)
        |SELECT p.di, p.dj, p.n,
        |  round(p.sxy / CAST(p.n AS DOUBLE) - ma.mu * mb.mu, 6) + 0.0 AS cov
        |FROM p JOIN m ma ON p.di = ma.i JOIN m mb ON p.dj = mb.i""".stripMargin,

    // The ±1 matrix is regenerated from the same md5 parity formula the
    // engine bakes in at plan time — engine-independent by construction.
    "q_rand_project" ->
      """WITH c AS (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS i
        |        FROM embeddings)),
        |s AS (SELECT t.k, u.i,
        |    CASE WHEN CAST(concat('0x', substring(md5(CAST(t.k AS VARCHAR)
        |      || ':' || CAST(u.i AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM range(8) t(k) CROSS JOIN range(64) u(i))
        |SELECT c.vec_id, CAST(s.k AS INTEGER) AS k,
        |  round(CAST(SUM(CAST(CAST(c.x * s.sgn AS DECIMAL(20,12))
        |      * 1000000000000 AS BIGINT)) AS DOUBLE)
        |    / CAST(1000000000000 AS DOUBLE), 6) + 0.0 AS proj
        |FROM c JOIN s ON c.i = s.i GROUP BY c.vec_id, s.k""".stripMargin,

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

    "q_matryoshka" ->
      s"""WITH q AS (SELECT embedding[1:16] AS qp, embedding AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |t AS (SELECT e.vec_id,
         |    ${cosSql("e.embedding[1:16]", "q.qp")} AS cosine_prefix
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
         |  ORDER BY cosine_prefix DESC, e.vec_id ASC LIMIT 5),
         |f AS (SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS c
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
         |  ORDER BY c DESC, e.vec_id ASC LIMIT 5)
         |SELECT t.vec_id, t.cosine_prefix,
         |  t.vec_id IN (SELECT vec_id FROM f) AS in_full_topk
         |FROM t""".stripMargin,

    "q_ann_lsh" -> srpTopKSql(Similarity.SrpRadius, 5),

    // Served path must reproduce the ad-hoc ranking exactly.
    "q_ann_lsh_served" -> srpTopKSql(Similarity.SrpRadius, 5),

    // lifecycle twins: append+compact must serve the one-shot answer
    "q_ann_lsh_incr" -> srpTopKSql(Similarity.SrpRadius, 5),
    "q_ann_lsh_stream" -> srpTopKSql(Similarity.SrpRadius, 5),
    "q_ann_ivf_incr" -> ivfOracle,
    "q_ann_pq_incr" -> pqOracleTrainedOn(id => s"$id % 5 <> 0"),

    "q_ann_ivf" -> ivfOracle,
    // k ∝ N auto gate: nCentroids derived from COUNT(*) in SQL, same
    // seed/assign/probe chain
    "q_ann_ivf_auto" -> ivfOracleAt(ivfAutoNcSql),

    // The partition-pruned store must land on the identical ranking.
    "q_ann_ivf_served" -> ivfOracle,

    "q_ann_multiprobe" -> srpTopKSql(Similarity.SrpRadiusWide, 5),

    // Filtered search: the label predicate lands INSIDE the candidate
    // scan, before the rerank — same sketch algebra as q_ann_lsh.
    // the label-partitioned store serves the identical semantics — one
    // oracle for both shapes (layout, not algebra)
    "q_ann_filtered" -> filteredTopKSql,
    "q_ann_filtered_served" -> filteredTopKSql,

    "q_mmr" -> mmrOracle(k = 5, poolSize = 20, lambda = 0.5),

    // SQ8 serve: dequantized-int8 candidate scores (asymmetric — raw
    // query), exact rerank — the quantizeAudit algebra end-to-end. The
    // SERVED twin shares it verbatim: the persisted decode (u−128)·s
    // reproduces round(x/s)·s bit-for-bit (q integer-valued in double).
    "q_ann_sq8" -> sq8TopKSql,
    "q_ann_sq8_served" -> sq8TopKSql,

    // IVF × SQ8 composition: seed-centroid assignment (the ivfOracle
    // CTEs), top-nprobe probe set per the exact assignment formula,
    // dequantized-int8 scoring INSIDE the probed clusters, exact rerank.
    "q_ann_ivfsq8_served" -> ivfSq8TopKSql(
      IvfSq8Store.DefaultNumCentroids.toString,
      IvfSq8Store.DefaultNprobe.toString),

    // the auto twin: SAME template with nCentroids derived from COUNT(*)
    // and the serve width clamped to it (LEAST — the engine's clamp reads
    // the store's persisted choice)
    "q_ann_ivfsq8_auto" -> ivfSq8TopKSql(ivfSq8AutoNcSql,
      s"LEAST(${IvfSq8Store.AutoNprobe}, $ivfSq8AutoNcSql)"),

    "q_ann_recall_sq8" -> sq8RecallSql("sq8"),
    "q_ann_recall_sq8_served" -> sq8RecallSql("sq8_served"),

    // the retrain-policy decision rows: every value is a corpus count —
    // train mass = what the router was built over (full corpus for the
    // clean store and the post-retrain state; the vec_id < nc OR
    // vec_id % 5 <> 0 base for the drifted store pre-retrain), live mass
    // = the full corpus, stale fraction = appended share, retrain =
    // fraction >= the default threshold
    "q_ann_retrain_policy" ->
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
         |  CAST(COUNT(*) FILTER (WHERE vec_id < ${IvfStore.DefaultNumCentroids}
         |    OR vec_id % 5 <> 0) AS BIGINT) AS base FROM embeddings)
         |SELECT * FROM (
         |SELECT 'clean' AS store, total AS train_rows, total AS live_rows,
         |  CAST(0.0 AS DOUBLE) AS stale_fraction, FALSE AS retrain FROM n
         |UNION ALL
         |SELECT 'drift_after', total, total, CAST(0.0 AS DOUBLE), FALSE FROM n
         |UNION ALL
         |SELECT 'drift_before', base, total,
         |  round(CAST(total - base AS DOUBLE) / total, 6),
         |  (CAST(total - base AS DOUBLE) / total)
         |    >= ${graft.search.RetrainPolicy.DefaultThreshold} FROM n
         |) ORDER BY store""".stripMargin,

    "q_ann_recall_ivfsq8" -> ivfSq8RecallSql("ivfsq8",
      IvfSq8Store.DefaultNumCentroids.toString,
      IvfSq8Store.DefaultNprobe.toString),
    "q_ann_recall_ivfsq8_auto" -> ivfSq8RecallSql("ivfsq8_auto",
      ivfSq8AutoNcSql,
      s"LEAST(${IvfSq8Store.AutoNprobe}, $ivfSq8AutoNcSql)"),

    "q_dedup_embedding" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 500 AND b.vec_id < 500
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.45""".stripMargin,

    "q_dedup_embedding_bucketed" -> clusteredPairsSql("embeddings"),

    // Sharded transport, same semantics ⇒ literally the same oracle.
    "q_dedup_clustered_sharded" -> clusteredPairsSql("embeddings"),

    "q_dedup_recall_clustered" ->
      s"""WITH capped AS (SELECT * FROM embeddings WHERE vec_id < 500),
         |exact AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM capped a JOIN capped b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45),
         |clu AS (${clusteredPairsSql("capped")})
         |SELECT COUNT(*) AS n_exact, COUNT(c.vec_a) AS n_found,
         |  round(COUNT(c.vec_a) / greatest(COUNT(*), 1), 4) AS recall
         |FROM exact e LEFT JOIN clu c
         |  ON e.vec_a = c.vec_a AND e.vec_b = c.vec_b""".stripMargin,

    "q_dedup_recall_emb" ->
      s"""WITH capped AS (SELECT * FROM embeddings WHERE vec_id < 500),
         |exact AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM capped a JOIN capped b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45),
         |srp AS (${srpPairsSql("capped")})
         |SELECT COUNT(*) AS n_exact, COUNT(s.vec_a) AS n_found,
         |  round(COUNT(s.vec_a) / greatest(COUNT(*), 1), 4) AS recall
         |FROM exact e LEFT JOIN srp s
         |  ON e.vec_a = s.vec_a AND e.vec_b = s.vec_b""".stripMargin,

    "q_kmeans" ->
      s"""WITH ${kmeansCtes()}
         |SELECT vec_id, cluster, s AS centroid_sim FROM a2""".stripMargin,

    "q_topic_balance" ->
      s"""WITH ${kmeansCtes()},
         |bal AS (SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
         |    ORDER BY CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
         |      vec_id ASC) AS rk
         |  FROM a2)
         |SELECT vec_id, cluster FROM bal WHERE rk <= 40""".stripMargin,

    "q_semdedup" ->
      s"""WITH ${kmeansCtes()},
         |$semdedupBody""".stripMargin,

    // Auto-k: the seed count is derived from the corpus (k = ceil(N/50))
    // on BOTH engines, so cluster population stays bounded near the
    // target as N grows — the tested form of the published method's
    // "k grows with the corpus" scaling contract.
    "q_semdedup_auto" ->
      s"""WITH ${kmeansCtes("(SELECT CAST(ceil(COUNT(*) / 50.0) AS BIGINT) FROM emb)")},
         |$semdedupBody""".stripMargin,

    "q_coreset" -> kcenterOracle(5),

    "q_hard_negatives" ->
      s"""WITH anchors AS (SELECT vec_id AS anchor_id, embedding AS av, label AS al
         |  FROM embeddings WHERE vec_id < 20),
         |scored AS (SELECT a.anchor_id, e.vec_id,
         |    ${cosSql("e.embedding", "a.av")} AS cosine
         |  FROM embeddings e CROSS JOIN anchors a
         |  WHERE e.vec_id <> a.anchor_id AND e.label <> a.al),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cosine DESC, vec_id ASC) AS rn FROM scored)
         |SELECT anchor_id, vec_id, cosine FROM ranked WHERE rn <= 3""".stripMargin,

    "q_embedding_stats" ->
      s"""SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
         |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
         |  $bucketSql AS bucket
         |FROM embeddings""".stripMargin,

    "q_ann_pq" -> pqOracle,
    // ksub=256 gate: same train/serve chain, full byte-ordinal codebook
    "q_ann_pq_big" -> pqOracleTrainedOn(_ => "TRUE", ksub = PqStore.BigKsub),

    // The persisted codebook+codes path must land on the identical
    // ranking (the artifacts are deterministic; scoring is shared code).
    "q_ann_pq_served" -> pqOracle,

    "q_ann_ivfpq" -> ivfPqOracle,

    // The partition-pruned packed store must land on the identical
    // ranking — same artifacts, same shifted-codebook ADC algebra.
    "q_ann_ivfpq_served" -> ivfPqOracle,

    // Incremental twin: residual codebook trained on the base's
    // non-centroid rows (centroid ids excluded for the zero-residual
    // reason above; they stay in the base so the coarse assignment is
    // identical to the full build's); codes for ALL vectors.
    "q_ann_ivfpq_incr" ->
      ivfPqOracleTrainedOn(id => s"($id >= 8 AND $id % 5 <> 0)"),

    // Non-toy configuration: the SAME template at (nc=64, ksub=256,
    // nprobe=4) — oracle parameterized in lockstep with the store's
    // persisted params.txt.
    "q_ann_ivfpq_big" ->
      ivfPqOracleTrainedOn(id => s"$id >= ${IvfPqStore.BigNumCentroids}",
        ncSql = IvfPqStore.BigNumCentroids.toString,
        ksub = IvfPqStore.BigKsub, nprobe = IvfPqStore.BigNprobe),

    // k-proportional-to-N twin: BOTH engines derive nCentroids from the
    // corpus count (ceil(N / cellSize) — the q_semdedup_auto precedent),
    // so per-cell population holds as the corpus grows without a code
    // edit; the engine persists the RESOLVED value in params.txt.
    "q_ann_ivfpq_auto" -> {
      val ncSql = s"(SELECT CAST(ceil(COUNT(*) / " +
        s"${IvfPqStore.AutoCellSize}.0) AS BIGINT) FROM embeddings)"
      ivfPqOracleTrainedOn(id => s"$id >= $ncSql", ncSql = ncSql,
        nprobeSql = Some(s"LEAST(${IvfPqStore.AutoNprobe}, $ncSql)"))
    },

    "q_embedding_quant" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |err AS (SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0.0)
        |         ELSE list_transform(e, x -> x - round(x / scale) * scale) END AS d,
        |    len(e) AS n FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  round(list_max(list_transform(d, x -> abs(x))), 6) AS max_abs_err,
        |  round(list_sum(list_transform(d, x -> x * x)) / n, 6) AS mse
        |FROM err""".stripMargin,

    "q_ann_drift" -> {
      // the drift fixture in FLOAT, bit-matching the engine's
      // CAST(CAST(x AS DOUBLE) + 0.25D AS FLOAT) per element
      val driftCte =
        """embdrift AS (SELECT vec_id,
          |    CASE WHEN vec_id % 5 = 0
          |      THEN list_transform(embedding,
          |             x -> CAST(CAST(x AS DOUBLE) + 0.25 AS FLOAT))
          |      ELSE embedding END AS embedding
          |  FROM embeddings)""".stripMargin
      // the multi-query ADC + exact-rerank chain of the q_ann_recall
      // oracle, suffix-parameterized so the incr- and rebuild-trained
      // codebooks replay side by side over the drifted corpus
      def pqChain(x: String): String =
        s"""qp$x AS (SELECT vec_id AS qid, s, sv AS qsv FROM sub$x WHERE vec_id < 20),
           |lut$x AS (SELECT q.qid, c.s, c.cid,
           |    round(list_sum(list_transform(range(1, 9), i -> c.cv[i] * q.qsv[i])), 6) AS pdot,
           |    round(list_sum(list_transform(c.cv, x -> x * x)), 6) AS pnorm2
           |  FROM c1$x c JOIN qp$x q ON c.s = q.s),
           |qn$x AS (SELECT vec_id AS qid,
           |    sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm, v AS qv
           |  FROM emb$x WHERE vec_id < 20),
           |adc$x AS (SELECT l.qid, k.vec_id,
           |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
           |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
           |  FROM codes$x k JOIN lut$x l ON k.s = l.s AND k.cid = l.cid
           |  GROUP BY l.qid, k.vec_id),
           |cands$x AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id,
           |    row_number() OVER (PARTITION BY a.qid
           |      ORDER BY round(a.adc_dot / (n.qnorm * sqrt(a.apx2)), 6) DESC,
           |        a.vec_id ASC) AS rn
           |  FROM adc$x a JOIN qn$x n ON a.qid = n.qid WHERE a.vec_id <> a.qid)
           |  WHERE rn <= 40),
           |pqr$x AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
           |    row_number() OVER (PARTITION BY c.qid
           |      ORDER BY ${cosSql("e.v", "n.qv")} DESC, c.vec_id ASC) AS rn
           |  FROM cands$x c JOIN emb$x e ON c.vec_id = e.vec_id
           |  JOIN qn$x n ON c.qid = n.qid) WHERE rn <= 10)""".stripMargin
      def method(name: String, cte: String): String =
        s"""SELECT '$name' AS method, CAST(COUNT(*) AS BIGINT) AS hits,
           |  CAST(20 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
           |  round(CAST(COUNT(*) AS DOUBLE) / 200.0, 6) AS avg_recall
           |FROM $cte c JOIN truth t ON c.qid = t.qid AND c.vec_id = t.vec_id""".stripMargin
      // the ivfpq drift chains: shared coarse space over the drifted
      // corpus (centroids = ids < 8, identical for incr and rebuild), a
      // residual frame, two codebooks trained with the incr/rebuild
      // templates (non-centroid ids only — the degenerate-seeding rule),
      // and the per-query shifted-LUT ADC + exact rerank of the recall
      // oracle. Query subspaces/norms reuse the RAW drifted chains
      // (qpdi/qndi/embdi) the PQ rows already build.
      def ivfPqDriftChain(x: String): String =
        s"""lut$x AS (SELECT q.qid, c.s, c.cid,
           |    round(list_sum(list_transform(range(1, 9),
           |      i -> (l.csv[i] + c.cv[i]) * q.qsv[i])), 6) AS pdot,
           |    round(list_sum(list_transform(range(1, 9),
           |      i -> (l.csv[i] + c.cv[i]) * (l.csv[i] + c.cv[i]))), 6) AS pnorm2
           |  FROM c1$x c JOIN qpdi q ON c.s = q.s
           |  JOIN qcldd qc ON q.qid = qc.qid
           |  JOIN csldd l ON l.cid = qc.cluster AND l.s = c.s),
           |adc$x AS (SELECT l.qid, k.vec_id,
           |    CAST(SUM(CAST(l.pdot AS DECIMAL(38,12))) AS DOUBLE) AS adc_dot,
           |    CAST(SUM(CAST(l.pnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS apx2
           |  FROM codes$x k JOIN lut$x l ON k.s = l.s AND k.cid = l.cid
           |  GROUP BY l.qid, k.vec_id),
           |cands$x AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id,
           |    row_number() OVER (PARTITION BY a.qid
           |      ORDER BY round(a.adc_dot / (n.qnorm * sqrt(a.apx2)), 6) DESC,
           |        a.vec_id ASC) AS rn
           |  FROM adc$x a JOIN qndi n ON a.qid = n.qid
           |  JOIN asgdd av ON a.vec_id = av.vec_id
           |  JOIN qcldd qc ON a.qid = qc.qid AND av.cluster = qc.cluster
           |  WHERE a.vec_id <> a.qid) WHERE rn <= 40),
           |pqr$x AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id,
           |    row_number() OVER (PARTITION BY c.qid
           |      ORDER BY ${cosSql("e.v", "n.qv")} DESC, c.vec_id ASC) AS rn
           |  FROM cands$x c JOIN embdi e ON c.vec_id = e.vec_id
           |  JOIN qndi n ON c.qid = n.qid) WHERE rn <= 10)""".stripMargin
      s"""WITH $driftCte,
         |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embdrift WHERE vec_id < 20),
         |scored AS (SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
         |  FROM embdrift e CROSS JOIN qs q WHERE e.vec_id <> q.qid),
         |truth AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM scored) WHERE rn <= 10),
         |${pqTrainCtes("di", id => s"$id % 5 <> 0", src = "embdrift")},
         |${pqChain("di")},
         |${pqTrainCtes("df", _ => "TRUE", src = "embdrift")},
         |${pqChain("df")},
         |centsdd AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embdrift WHERE vec_id < 8),
         |csimdd AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS s
         |  FROM embdrift e CROSS JOIN centsdd c),
         |asgdd AS (SELECT vec_id, cid AS cluster FROM (SELECT *,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         |  FROM csimdd) WHERE rn = 1),
         |residdd AS (SELECT e.vec_id,
         |    list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) AS embedding
         |  FROM embdrift e JOIN asgdd a ON e.vec_id = a.vec_id
         |  JOIN centsdd c ON a.cluster = c.cid),
         |${pqTrainCtes("vi", id => s"($id >= 8 AND $id % 5 <> 0)", src = "residdd")},
         |${pqTrainCtes("vf", id => s"$id >= 8", src = "residdd")},
         |csldd AS (SELECT cd.cid, ss.s, cd.cv[ss.s*8+1:ss.s*8+8] AS csv
         |  FROM centsdd cd CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss),
         |qcldd AS (SELECT vec_id AS qid, cluster FROM asgdd WHERE vec_id < 20),
         |${ivfPqDriftChain("vi")},
         |${ivfPqDriftChain("vf")}
         |${method("pq_incr_drift", "pqrdi")}
         |UNION ALL
         |${method("pq_rebuild_drift", "pqrdf")}
         |UNION ALL
         |${method("ivfpq_incr_drift", "pqrvi")}
         |UNION ALL
         |${method("ivfpq_rebuild_drift", "pqrvf")}""".stripMargin
    },

    // Lloyd-coarse drift twins: each twin is (2-iteration Lloyd coarse
    // train on its corpus) → (assign all drifted rows) → (residual
    // codebook train on its train set) → (top-nprobe shifted-LUT ADC +
    // exact rerank), replayed end-to-end — the engine's
    // kmeansCentroids / buildAtWithCents / frozen-space append chain.
    // Parameterized over (nc, ksub, nprobe) so the toy and big configs
    // share one template.
    "q_ann_drift_lloyd" -> lloydDriftSql("", nc = 8, ksub = 8, nprobe = 1),
    "q_ann_drift_lloyd_big" -> lloydDriftSql("big",
      nc = IvfPqStore.BigNumCentroids, ksub = IvfPqStore.BigKsub,
      nprobe = IvfPqStore.BigNprobe),


    // per-method recall rows (the monolith's chains, one query each —
    // truth CTEs shared textually, persisted-artifact-shared in the
    // engine via RecallTruth)
    "q_ann_recall_lsh" -> lshRecallSql("lsh", Similarity.SrpRadius),
    "q_ann_recall_lsh_mp" -> lshRecallSql("lsh_mp", Similarity.SrpRadiusWide),
    "q_ann_recall_ivf" -> ivfRecallSql("ivf", 1),
    "q_ann_recall_ivf_mp" -> ivfRecallSql("ivf_mp", 3),
    "q_ann_recall_pq" -> pqRecallSql("pq"),
    // served twin: deterministic artifacts + shared scoring algebra ⇒
    // literally the same oracle
    "q_ann_recall_pq_served" -> pqRecallSql("pq_served"),
    "q_ann_recall_pq_big" -> pqRecallSql("pq_big", ksub = PqStore.BigKsub),
    "q_ann_recall_ivf_auto" -> ivfRecallSql("ivf_auto", 1,
      ncSql = ivfAutoNcSql),
    "q_ann_recall_ivfpq" -> ivfPqRecallSql("ivfpq", nc = 8, ksub = 8,
      nprobe = 1),
    "q_ann_recall_ivfpq_big" -> ivfPqRecallSql("ivfpq_big",
      nc = IvfPqStore.BigNumCentroids, ksub = IvfPqStore.BigKsub,
      nprobe = IvfPqStore.BigNprobe),

    // per-stratum filtered-search recall: same-label truth vs same-label
    // sketch candidates, strata = bottom-half labels by (count, label)
    // rank, micro-averaged hits / truth rows
    "q_ann_filtered_recall" ->
      s"""WITH ${sigCtes()},
         |qs AS (SELECT e.vec_id AS qid, e.embedding AS qv, e.label AS qlabel,
         |    s.w0 AS qw0, s.w1 AS qw1, s.w2 AS qw2, s.w3 AS qw3
         |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
         |  WHERE e.vec_id < 20),
         |scored AS (SELECT q.qid, e.vec_id,
         |    ${cosSql("e.embedding", "q.qv")} AS cosine,
         |    ${hamSql("s", "q")} AS ham
         |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
         |  CROSS JOIN qs q
         |  WHERE e.vec_id <> q.qid AND e.label = q.qlabel),
         |truth AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM scored) WHERE rn <= 10),
         |cand AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM scored WHERE ham <= ${Similarity.SrpRadius}) WHERE rn <= 10),
         |strata AS (SELECT label AS qlabel,
         |    CASE WHEN row_number() OVER (ORDER BY COUNT(*) ASC, label ASC)
         |           <= (COUNT(*) OVER ()) // 2
         |         THEN 'rare' ELSE 'common' END AS stratum
         |  FROM embeddings GROUP BY label),
         |perq AS (SELECT t.qid, CAST(COUNT(*) AS BIGINT) AS truth_n,
         |    CAST(COUNT(c.vec_id) AS BIGINT) AS hits
         |  FROM truth t LEFT JOIN cand c
         |    ON t.qid = c.qid AND t.vec_id = c.vec_id
         |  GROUP BY t.qid)
         |SELECT st.stratum, CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(SUM(p.hits) AS BIGINT) AS hits,
         |  CAST(SUM(p.truth_n) AS BIGINT) AS truth_rows,
         |  round(CAST(SUM(p.hits) AS DOUBLE) / SUM(p.truth_n), 6) AS avg_recall
         |FROM perq p JOIN qs q ON p.qid = q.qid
         |JOIN strata st ON q.qlabel = st.qlabel
         |GROUP BY st.stratum""".stripMargin,

    // label-partitioned store at the WIDE radius + scan accounting:
    // avg_scan_rows = the query label's partition size (the pruned
    // per-query read), full_scan_rows = N (what the predicate-inside-
    // scan shape reads)
    "q_ann_filtered_recall_part" ->
      s"""WITH ${sigCtes()},
         |qs AS (SELECT e.vec_id AS qid, e.embedding AS qv, e.label AS qlabel,
         |    s.w0 AS qw0, s.w1 AS qw1, s.w2 AS qw2, s.w3 AS qw3
         |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
         |  WHERE e.vec_id < 20),
         |scored AS (SELECT q.qid, e.vec_id,
         |    ${cosSql("e.embedding", "q.qv")} AS cosine,
         |    ${hamSql("s", "q")} AS ham
         |  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
         |  CROSS JOIN qs q
         |  WHERE e.vec_id <> q.qid AND e.label = q.qlabel),
         |truth AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM scored) WHERE rn <= 10),
         |cand AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM scored WHERE ham <= ${Similarity.SrpRadiusWide}) WHERE rn <= 10),
         |labn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM embeddings GROUP BY label),
         |strata AS (SELECT label AS qlabel,
         |    CASE WHEN row_number() OVER (ORDER BY COUNT(*) ASC, label ASC)
         |           <= (COUNT(*) OVER ()) // 2
         |         THEN 'rare' ELSE 'common' END AS stratum
         |  FROM embeddings GROUP BY label),
         |perq AS (SELECT t.qid, CAST(COUNT(*) AS BIGINT) AS truth_n,
         |    CAST(COUNT(c.vec_id) AS BIGINT) AS hits
         |  FROM truth t LEFT JOIN cand c
         |    ON t.qid = c.qid AND t.vec_id = c.vec_id
         |  GROUP BY t.qid)
         |SELECT st.stratum, CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(SUM(p.hits) AS BIGINT) AS hits,
         |  CAST(SUM(p.truth_n) AS BIGINT) AS truth_rows,
         |  round(CAST(SUM(p.hits) AS DOUBLE) / SUM(p.truth_n), 6) AS avg_recall,
         |  round(AVG(CAST(l.n AS DOUBLE)), 6) AS avg_scan_rows,
         |  (SELECT COUNT(*) FROM embeddings) AS full_scan_rows
         |FROM perq p JOIN qs q ON p.qid = q.qid
         |JOIN strata st ON q.qlabel = st.qlabel
         |JOIN labn l ON q.qlabel = l.label
         |GROUP BY st.stratum""".stripMargin
  )
}
