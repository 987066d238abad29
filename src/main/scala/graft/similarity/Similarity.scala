package graft.similarity

import graft.util.CacheLedger.CacheOps
import graft.expressions.GraftFunctions
import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths, mirroring what a 100 TB training-data pipeline needs:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    One broadcast of the query vector, one pass over the table, a
  *    TakeOrderedAndProject for the top-k. Scales linearly; use when the
  *    query set is small.
  *  - [[annTopK]]: sign-LSH bucketed approximate search — candidates are
  *    restricted to the query's hyperoctant bucket (sign pattern of the
  *    leading dimensions), then scored exactly. The bucket id is a plain
  *    integer column, so at scale the table can be written partitioned or
  *    bucketed by it and a query touches only its own partition. An IVF
  *    variant would swap the sign-bucket for a learned-centroid assignment;
  *    the plumbing (bucket column + bucket-pruned exact scoring) is the same.
  *
  * All arithmetic runs in double precision via sequential folds
  * (`aggregate`), giving bit-identical results to the DuckDB oracle's
  * sequential list_sum.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — the portable
    * reference formulation ([[graft.expressions.FloatVecDot]] is the
    * codegen'd fast path with identical bit-level semantics).
    */
  def dotd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** cosine(a,b) — shape-stable: dot / (sqrt(na) * sqrt(nb)). */
  def cosine(a: Column, b: Column): Column =
    dotd(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Codegen'd cosine via the custom [[graft.expressions.FloatVecDot]]
    * expression — bit-identical to [[cosine]], ~allocation-free. Callers
    * must have run [[GraftFunctions.register]] on the session.
    */
  def cosineFast(a: String, b: String): Column =
    expr(s"graft_dot($a, $b) / (sqrt(graft_dot($a, $a)) * sqrt(graft_dot($b, $b)))")

  /** Exact cosine top-k against the embedding of `queryId`. Scores rounded
    * to 6 decimals before ordering (ties then break on id) so ranking is
    * reproducible across engines.
    */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    embeddings
      .crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosineFast(vecCol, "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Matryoshka (MRL) truncation audit: rank the corpus by cosine on the
    * FIRST `prefixDims` dimensions only, and flag which of that top-k
    * also appear in the full-dimension top-k — the measurement behind
    * the "serve short prefixes, rerank with full vectors" deployment
    * (truncation is only admissible where this agreement is high).
    * Same single broadcast-scored scan as [[bruteForceTopK]], run on
    * `slice(vec, 1, prefixDims)`; the full top-k is a k-row broadcast
    * joined for the membership flag. Returns
    * (idCol, cosine_prefix, in_full_topk) ordered by prefix rank.
    */
  def matryoshkaAudit(embeddings: DataFrame, idCol: String, vecCol: String,
                      queryId: Long, k: Int, prefixDims: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings.filter(col(idCol) === queryId)
      .select(slice(col(vecCol), 1, prefixDims).as("__qp"),
        col(vecCol).as("__qv"))
    val scored = embeddings
      .crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .withColumn("__vp", slice(col(vecCol), 1, prefixDims))
    val truncated = scored
      .select(col(idCol), round(cosineFast("__vp", "__qp"), 6)
        .as("cosine_prefix"))
      .orderBy(col("cosine_prefix").desc, col(idCol).asc)
      .limit(k)
    val fullIds = scored
      .select(col(idCol), round(cosineFast(vecCol, "__qv"), 6).as("__cf"))
      .orderBy(col("__cf").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).as("__fid"), lit(true).as("__in"))
    truncated
      .join(broadcast(fullIds), col(idCol) === col("__fid"), "left")
      .select(col(idCol), col("cosine_prefix"),
        coalesce(col("__in"), lit(false)).as("in_full_topk"))
  }

  /** Hard-negative mining for contrastive training: for each of the query
    * vectors (`idCol < nQueries` — the anchor set), the top `k` most
    * cosine-similar vectors carrying a DIFFERENT label. Those are the
    * canonical "hard negatives": near in embedding space, wrong in label
    * space — the pairs a contrastive/reranker trainer wants most.
    *
    * Plan: ONE broadcast of the anchor rows, one scored corpus scan
    * (codegen'd [[cosineFast]]), per-anchor top-k via a rank window
    * partitioned by anchor (WindowGroupLimit pushes the k-cut map-side).
    * At 100 TB the anchor set stays broadcast-sized by construction and
    * the scan is embarrassingly parallel; an SRP pre-filter ([[srpTopK]]'s
    * sketch) is the drop-in to cut the scored fraction when exactness can
    * be traded.
    */
  def hardNegatives(embeddings: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, nQueries: Int, k: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val anchors = embeddings.filter(col(idCol) < nQueries)
      .select(col(idCol).as("anchor_id"), col(vecCol).as("__av"),
        col(labelCol).as("__al"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    embeddings
      .crossJoin(broadcast(anchors))
      .filter(col(idCol) =!= col("anchor_id") && col(labelCol) =!= col("__al"))
      .select(col("anchor_id"), col(idCol),
        round(cosineFast(vecCol, "__av"), 6).as("cosine"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("anchor_id"), col(idCol), col("cosine"))
  }

  /** Greedy k-center coreset selection (farthest-point traversal,
    * Gonzalez 1985 — the classic 2-approximation): pick `seedId`, then
    * k−1 times add the vector whose maximum cosine to the already-selected
    * set is LOWEST (i.e. the farthest point; ties break on id). The
    * training-data use is diverse-subset picking: a k-row sample that
    * covers the embedding space instead of oversampling its dense modes.
    *
    * Plan: per round, one corpus scan scored against a ≤k-row broadcast
    * of the selected set, a TakeOrdered(1) argmin, and a localCheckpoint
    * so the growing plan does not re-derive every prior round (the
    * PageRank lineage-truncation pattern). k is small by contract — the
    * output is a human/model-budget-sized coreset — so the k driver
    * rounds cost k tiny jobs, never a collect of data rows. Deterministic
    * end-to-end: cosines round(6), argmin ties on id.
    *
    * Returns (pick_order, idCol) in selection order.
    */
  def kCenterSelect(embeddings: DataFrame, idCol: String, vecCol: String,
                    seedId: Long, k: Int): DataFrame = {
    require(k >= 1, "kCenterSelect: k must be >= 1")
    GraftFunctions.register(embeddings.sparkSession)
    val emb = embeddings
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
    var sel = emb.filter(col("vid") === seedId)
      .select(col("vid"), col("v"), lit(0).as("pick_order"))
      .cutLineageEager()
    for (r <- 1 until k) {
      val picked = broadcast(
        sel.select(col("vid").as("svid"), col("v").as("sv")))
      val next = emb
        .join(sel.select(col("vid")), Seq("vid"), "left_anti")
        .crossJoin(picked)
        .groupBy(col("vid"))
        .agg(max(round(cosineFast("v", "sv"), 6)).as("__mc"),
          first(col("v")).as("v"))
        .orderBy(col("__mc").asc, col("vid").asc)
        .limit(1)
        .select(col("vid"), col("v"), lit(r).as("pick_order"))
      sel = sel.unionByName(next).cutLineageEager()
    }
    sel.select(col("pick_order").cast("long").as("pick_order"),
      col("vid").as(idCol))
  }

  /** Sign-LSH bucket id: bit i set iff vec[i] > 0, over the first `dims`
    * dimensions. Pure comparisons — no float arithmetic, bit-exact.
    * Uses null-safe `get` (0-based): vectors shorter than `dims` contribute
    * 0 bits instead of failing under ANSI mode.
    *
    * Used for per-vector stats and the bucketed near-dup candidate join;
    * for ANN retrieval use [[srpTopK]] — axis-aligned sign buckets carry no
    * similarity guarantee (the round-7 recall audit measured recall@10 ≈ 0
    * for bucket-equality ANN on this family).
    */
  def signBucket(vecCol: Column, dims: Int = 8): Column =
    (0 until dims).map { i =>
      when(get(vecCol, lit(i)) > lit(0.0f), lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")

  // ---------------------------------------------------------------------
  // SRP-LSH (signed random projections, Charikar 2002): the ANN scale path.
  // ---------------------------------------------------------------------

  /** Number of fixed random hyperplanes in the SRP sketch (4 × 32-bit words). */
  val SrpBits = 128

  /** Dimensionality the fixed hyperplanes are generated for. */
  val SrpDims = 64

  /** Default Hamming probe radius for [[srpTopK]] — tuned on the recall
    * audit: avg recall@10 = 0.88 (sf0.01) / 0.93 (sf0.1) over 20 queries at
    * ~24% candidate fraction on the near-isotropic test corpus.
    */
  val SrpRadius = 58

  /** Wide ("multi-probe") radius: avg recall@10 ≈ 0.99 at ~42% candidates —
    * the recall/cost knob turned toward recall.
    */
  val SrpRadiusWide = 62

  /** Deterministic ±1 hyperplane entry for flat index `s` — a 3-round
    * multiply–xorshift mix over 31-bit state (all intermediates < 2⁶³, so
    * the identical arithmetic is expressible in any SQL engine's BIGINT).
    *
    * Why this and not an LCG: round 7 shipped sign buckets whose measured
    * recall was ~0, and the diagnosis was NOT the LSH family but entry
    * correlation — consecutive seeds through a single LCG step leave the
    * ±1 matrix rank-deficient (observed: true neighbors at Hamming 90/128
    * when E[H] = 128·θ/π ≈ 50, an 7σ impossibility under independent
    * planes). The 3-round mix restores the Charikar bound empirically:
    * corpus Hamming std 7.4 vs the iid-theory 5.7.
    */
  private def srpSign(s: Long): Float = {
    val m = 1L << 31
    var v = s + 1
    v = (v * 2654435761L) % m; v ^= v >> 16
    v = (v * 2246822519L) % m; v ^= v >> 13
    v = (v * 3266489917L) % m; v ^= v >> 16
    if ((v & 1L) == 1L) 1.0f else -1.0f
  }

  /** Hyperplane `j` as a ±1 float vector (deterministic, fixed seed). */
  def srpPlane(j: Int, dims: Int = SrpDims): Array[Float] =
    Array.tabulate(dims)(i => srpSign(j.toLong * dims + i))

  /** The full fixed plane matrix — the constant baked into the codegen'd
    * [[graft.expressions.SrpSignatureWords]] AND interpolated into the
    * DuckDB oracle, so both engines project against identical ±1 entries.
    */
  lazy val srpPlanes: Array[Array[Float]] =
    Array.tabulate(SrpBits)(j => srpPlane(j))

  /** Attach the 128-bit SRP signature as four bigint words `w0..w3`,
    * computed by the single codegen'd `graft_srp` expression (the stacked
    * 128×`graft_dot` form exceeded whole-stage codegen's limits and fell
    * back to interpreted eval — ~20× slower at the sf1 sweep point; bit
    * semantics identical, see [[graft.expressions.SrpSignatureWords]]).
    * Bits live in 0..31 per word: values stay positive, no
    * two's-complement edge cases in either engine.
    *
    * At 100 TB this is the column you persist once next to the embedding:
    * 32 bytes/row vs 256 for the raw vector, and every subsequent query
    * filters on the sketch before touching the vectors.
    */
  def srpSignature(embeddings: DataFrame, vecCol: String): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    (0 until 4).foldLeft(
      embeddings.withColumn("__srp", expr(s"graft_srp($vecCol)"))) { (df, w) =>
      df.withColumn(s"__w$w", element_at(col("__srp"), w + 1))
    }.drop("__srp")
  }

  /** Hamming distance between two 4-word signatures — `bit_count(xor)` per
    * word, pure integer codegen.
    */
  def srpHamming(aPrefix: String, bPrefix: String): Column =
    (0 until 4).map(w => expr(s"bit_count($aPrefix$w ^ $bPrefix$w)")).reduce(_ + _)

  /** SRP-LSH approximate top-k: candidates are every vector whose 128-bit
    * sketch lies within Hamming `radius` of the query's, reranked exactly.
    * E[Hamming] = SrpBits·θ/π (Charikar), so the radius is a direct angular
    * cutoff; probing a Hamming ball generalizes bucket multi-probe — on a
    * corpus whose true neighbors sit at θ ≈ 68–75° (this one), exact-bucket
    * matching of ANY bit subset has vanishing collision probability, while
    * the radius scan keeps avg recall@10 ≥ 0.88 at ~24% candidate fraction
    * (measured by `q_ann_recall` over 20 queries, both SFs).
    *
    * Scale shape: one broadcast of the query signature, one scan that reads
    * (id, w0..w3) — 4 xor+popcount per row, no shuffle — and exact cosine
    * only on survivors, then TakeOrdered. The sketch column also bands into
    * a partition key (any word = a 32-bit band) when the table is written
    * bucketed; the predicate itself needs no index.
    */
  def srpTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, radius: Int = SrpRadius): DataFrame = {
    val sigs = srpSignature(embeddings, vecCol)
    val q = sigs.filter(col(idCol) === queryId)
      .select((col(vecCol).as("__qv") +: (0 until 4).map(w => col(s"__w$w").as(s"__qw$w"))): _*)
    sigs.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId && srpHamming("__w", "__qw") <= radius)
      .select(col(idCol), round(cosineFast(vecCol, "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style ANN: assign every vector to its nearest of `nCentroids`
    * seed centroids (here: the first `nCentroids` vectors by id — a
    * deterministic stand-in for trained k-means centroids; swap in learned
    * ones without changing the plan), then answer a query by scanning only
    * the query's cluster and reranking exactly.
    *
    * Scale: the cluster id is a plain int column → write the table
    * partitioned by it; a query prunes to 1/nCentroids of the data (nprobe
    * =1; union more clusters for higher recall). Assignment is one
    * broadcast of nCentroids vectors × a linear scan — or, past the
    * [[CentroidShardK]] crossover / broadcast byte ceiling (or when
    * `centroidShards` forces it), the same sharded shuffle transport as
    * every other assign in this module, with the FLOAT `graft_dot`
    * scoring kept verbatim so cluster ids and round6 sims are
    * value-identical across transports (argmax over (sim, −cid) ≡
    * window (sim desc, cid asc); spec-asserted).
    */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                nCentroids: Int,
                centroidShards: Option[Int] = None): DataFrame = {
    // explicit contract: with an empty centroid set every row would get a
    // null cluster (array_max over an empty array) — reject up front
    require(nCentroids > 0, "ivfAssign needs at least one centroid")
    GraftFunctions.register(embeddings.sparkSession)
    val simExpr =
      s"""round(graft_dot($vecCol, cv) /
         |  (sqrt(graft_dot($vecCol, $vecCol)) * sqrt(graft_dot(cv, cv))), 6)""".stripMargin
    val shards = centroidShards.getOrElse(
      if (nCentroids < CentroidShardK) 1
      else autoCentroidShards(embeddings, vecCol, nCentroids.toLong))
    if (shards > 1) {
      val salts = embeddings.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt.max(1)
      val cents = embeddings.filter(col(idCol) < nCentroids)
        .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"))
        .withColumn("__cs", pmod(col("cid"), lit(shards)).cast("int"))
        .withColumn("__vs", explode(sequence(lit(0), lit(salts - 1))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cid").asc)
      embeddings
        .withColumn("__vs", pmod(hash(col(idCol)), lit(salts)).cast("int"))
        .withColumn("__cs", explode(sequence(lit(0), lit(shards - 1))))
        .join(cents.hint("shuffle_hash"), Seq("__vs", "__cs"))
        .withColumn("__sim", expr(simExpr))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumn("cluster", col("cid"))
        .withColumn("centroid_sim", col("__sim"))
        .drop("cv", "cid", "__rn", "__vs", "__cs", "__sim")
    } else {
      // All centroids as ONE broadcast row (an array of (cid, vec)
      // structs); the argmax is then a pure projection — the fused
      // graft_cos_best loop (max round6 cosine, ties → smallest cid;
      // bit-parity with the previous array_max(transform(...)) pinned by
      // VecArgBestSpec, which also computed graft_dot(v, v) once per
      // CENTROID and a BigDecimal round(…, 6) per centroid per row) — so
      // assignment is ZERO-shuffle: no window, no groupBy. The original
      // formulation (crossJoin + row_number over partitionBy(id)) shuffled
      // nCentroids copies of the table just to pick the per-row max.
      val centsArr = embeddings.filter(col(idCol) < nCentroids)
        .agg(collect_list(struct(col(idCol).cast("long").as("cid"),
          col(vecCol).as("cv"))).as("__cents"))
      embeddings.crossJoin(broadcast(centsArr))
        .withColumn("__best", expr(s"graft_cos_best(__cents, $vecCol)"))
        .withColumn("cluster", col("__best.cid"))
        .withColumn("centroid_sim", col("__best.sim"))
        .drop("__cents", "__best")
    }
  }

  /** ANN query via IVF clusters: exact rerank within the query's `nprobe`
    * closest clusters (nprobe = 1 scans only the query's own cluster — the
    * classic IVF recall/cost knob; each +1 adds ~1/nCentroids of the
    * corpus). Measured on this corpus (q_ann_recall, 20-query average):
    * nprobe 1 → 0.47/0.53, nprobe 3 → 0.72/0.70 at ~37% candidates —
    * honestly dominated by the [[srpTopK]] sketch (0.88+ at ~24%) because
    * 8 seed centroids carve a near-isotropic space too coarsely; IVF wins
    * when the corpus actually clusters.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCentroids: Int = 8,
              nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "ivfTopK needs nprobe >= 1")
    val assigned = ivfAssign(embeddings, idCol, vecCol, nCentroids)
    val probes =
      if (nprobe == 1)
        assigned.filter(col(idCol) === queryId)
          .select(col(vecCol).as("__qv"), col("cluster"))
      else {
        // rank ALL centroids for the query (the assignment only keeps the
        // argmax) and probe the top nprobe — ties to the smallest cid,
        // matching ivfAssign's tiebreak
        val centsArr = embeddings.filter(col(idCol) < nCentroids)
          .agg(collect_list(struct(col(idCol).as("cid"), col(vecCol).as("cv")))
            .as("__cents"))
        embeddings.filter(col(idCol) === queryId)
          .crossJoin(broadcast(centsArr))
          .select(col(vecCol).as("__qv"), explode(expr(
            s"""transform(__cents, c -> struct(
               |  round(graft_dot($vecCol, c.cv) /
               |    (sqrt(graft_dot($vecCol, $vecCol)) * sqrt(graft_dot(c.cv, c.cv))), 6) AS sim,
               |  c.cid AS cid))""".stripMargin)).as("__p"))
          .orderBy(col("__p.sim").desc, col("__p.cid").asc)
          .limit(nprobe)
          .select(col("__qv"), col("__p.cid").as("cluster"))
      }
    assigned
      .join(broadcast(probes), "cluster")
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), round(cosineFast(vecCol, "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic Lloyd's k-means over embedding vectors — the trained
    * upgrade for [[ivfAssign]]'s seed centroids and the topic-clustering
    * pass of a training-data pipeline. Engine-parity by construction, so
    * the full iteration is hash-checkable against the DuckDB oracle:
    *
    *  - init: centroids = the first k vectors by id (deterministic seed;
    *    k-means|| would be the production seeding, same plan after init);
    *  - assignment: the zero-shuffle broadcast-centroid projection from
    *    [[ivfAssign]] (array_max over (round6 sim, -cid) structs — the
    *    round6+tiebreak makes the argmax engine-independent); past the
    *    [[CentroidShardK]] crossover (or forced via `centroidShards`)
    *    the value-identical sharded row formulation takes over — no
    *    broadcast of the centroid table, k/S build side per task;
    *  - update: per-(cluster, dim) means via DECIMAL(38,12) sums (decimal
    *    addition is exact ⇒ order-independent — double sums would vary
    *    with partitioning), then round6 back to double. One posexplode +
    *    one groupBy(cluster, dim) per iteration — map-side combinable,
    *    k·dim output rows.
    *
    * Empty clusters vanish (no member rows ⇒ no centroid next round) —
    * standard Lloyd behavior, identical in the oracle. Returns
    * (idCol, cluster, centroid_sim) after `iters` assignment rounds.
    */
  def kmeansAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int,
                   centroidShards: Option[Int] = None): DataFrame = {
    require(k > 0 && iters >= 1, "kmeansAssign needs k > 0 and iters >= 1")
    GraftFunctions.register(embeddings.sparkSession)
    // transport auto-selection (the [[cosineNearDupPairsClustered]]
    // contract, one level up): sub-CentroidShardK tables skip the dims
    // probe — the byte ceiling below 256 centroids would need ≥ 5k dims
    // (pass explicit shards for such corpora); at or past the crossover
    // the sharded row formulation replaces the broadcast argmax
    // projection, which is BOTH the 45 µs/eval interpreted HOF and the
    // broadcast ceiling. Assignments are value-identical: round6 cosine
    // + (sim desc, cid asc) tie-break in the window ≡ array_max over
    // (round6 sim, -cid) structs (spec-asserted in SimilaritySpec).
    val shards = centroidShards.getOrElse(
      if (k < CentroidShardK) 1 else autoCentroidShards(embeddings, vecCol, k))
    val withVd = embeddings.select(col(idCol), col(vecCol),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("__vd"))
    // genuinely the first k vectors BY id (TakeOrdered, k rows) — an
    // `id < k` filter would silently yield no centroids on id spaces that
    // don't start at 0
    var cents = withVd.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).cast("long").as("cid"), col("__vd").as("cv"))
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned =
        if (shards <= 1) assignNearest(withVd, cents)
        else assignTopPRows(withVd, cents, 1, idCol, shards)
          .withColumnRenamed("__cluster", "cluster")
          .withColumnRenamed("__sim", "centroid_sim")
      cents = updateCentroids(assigned)
    }
    assigned.select(col(idCol), col("cluster"), col("centroid_sim"))
  }

  /** The Lloyd-trained centroid FRAME (cid, cv double[]) that
    * [[kmeansAssign]]`(k, iters)` assigns against — i.e. `iters − 1`
    * decimal-exact mean updates from the first-k-by-id seeds (the
    * 2-iteration engine assigns against c1, the once-updated means;
    * DuckDB's `kmeansCtes` replays exactly that chain, so a store built
    * on these centroids is oracle-replayable end-to-end). This is the
    * "swap the seed centroids for trained ones" input for
    * [[IvfPqStore.buildAtWithCents]] — trained coarse quantizers without
    * changing the store layout, and the retrained twin of the
    * coarse-centroid drift audit.
    */
  def kmeansCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 1, "kmeansCentroids needs k > 0 and iters >= 1")
    GraftFunctions.register(embeddings.sparkSession)
    val withVd = embeddings.select(col(idCol),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("__vd"))
    var cents = withVd.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).cast("long").as("cid"), col("__vd").as("cv"))
    for (_ <- 1 until iters)
      cents = updateCentroids(assignNearest(withVd, cents))
    cents
  }

  /** Decimal-exact Lloyd centroid update from an assignment frame —
    * shared by [[kmeansAssign]] and [[cosineNearDupPairsClustered]] so
    * both replay the identical deterministic iteration.
    */
  private def updateCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster").as("cid"), posexplode(col("__vd")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("col").cast("decimal(38,12)")).as("__s"),
        count(lit(1)).cast("long").as("__n"))
      .withColumn("m",
        round(col("__s").cast("double") / col("__n").cast("double"), 6))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("cv"))

  /** Nearest-centroid assignment against an explicit (cid, cv: double[])
    * centroid frame — [[ivfAssign]]'s broadcast-projection argmax
    * generalized to computed centroids. collect_list order is
    * partitioning-dependent but harmless: array_max is order-independent.
    */
  private def assignNearest(withVd: DataFrame, cents: DataFrame): DataFrame = {
    val centsArr = cents
      .agg(collect_list(struct(col("cid").cast("long").as("cid"),
        col("cv").as("cv"))).as("__cents"))
    // the whole per-row argmax is the fused codegen graft_cos_best loop
    // (was: interpreted array_max(transform(...)) with a graft_dot(v, v)
    // recompute and a BigDecimal round(…, 6) PER CENTROID per row) —
    // bit-parity pinned by VecArgBestSpec. Callers all register
    // GraftFunctions.
    withVd.crossJoin(broadcast(centsArr))
      .withColumn("__best", expr("graft_cos_best(__cents, __vd)"))
      .withColumn("cluster", col("__best.cid"))
      .withColumn("centroid_sim", col("__best.sim"))
      .drop("__cents", "__best")
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with cosine
    * ≥ threshold. Baseline is the all-pairs scan (quadratic — fine for
    * dedup batches); the scale path pre-buckets with [[signBucket]] or
    * [[ivfAssign]] and only compares within buckets/clusters, trading
    * recall for the pruning exactly like [[annTopK]].
    */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val a = embeddings.select(col(idCol).as("vec_a"), col(vecCol).as("__va"))
    val b = embeddings.select(col(idCol).as("vec_b"), col(vecCol).as("__vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(cosineFast("__va", "__vb"), 6))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Bits per SRP band in [[cosineNearDupPairsSrp]] (5 ⇒ 6 bands per
    * 32-bit signature word, bits 30–31 of each word unused).
    */
  val SrpPairBandBits = 5

  /** Minimum shared bands for a candidate pair in [[cosineNearDupPairsSrp]].
    * ≥2 cuts the incidental-single-band background an order of magnitude
    * while keeping fixture recall 1.0 (measured — see the Scaladoc table).
    */
  val SrpPairMinBands = 2

  /** Scale path for near-dup pairs: candidates are vectors agreeing
    * EXACTLY on ≥ `minBands` of the 24 five-bit bands of the 128-bit SRP
    * signature ([[srpSignature]]), then scored exactly — MinHash-style
    * band-LSH transplanted onto Charikar sign projections. The candidate
    * step is one equi-join on (band, value) + one combinable pair count:
    * partitionable, shuffle-bounded, no crossJoin; at 100 TB the 24-row
    * band explosion is 24 × 8-byte keys per vector, and the signature is
    * the 32-byte column you persist next to the embedding anyway.
    *
    * Replaces the axis-aligned sign-bucket formulation whose fixture
    * recall was 0 (round-9 audit): per-bit agreement for a pair at angle
    * θ is 1 − θ/π under random hyperplanes REGARDLESS of the data's axis
    * alignment, so banding the sketch carries Charikar's guarantee where
    * raw-dimension signs carry none. Measured on the 500-vector fixture
    * (14 true pairs at threshold 0.45, a deliberately hard near-isotropic
    * corpus — neighbors at θ ≈ 63°): recall 14/14 at 19% candidate
    * fraction (bands=5 bits, minBands=2); exact banding (minBands=1,
    * 8-bit bands) gave 0.64, the old sign bucket 0.0. On a real near-dup
    * corpus (cosine ≥ 0.9, θ ≤ 26°) the banding separates far better.
    * Precision is always exact (full cosine verify). Audited end-to-end
    * by q_dedup_recall_emb with a floor in SimilaritySpec.
    *
    * DOMAIN (round-10 three-point sweep): candidate volume for ANY
    * sign-RP banding at recall r is Ω(N^(1+ρ)), ρ = ln(1/p_t)/ln(1/p_r)
    * — at threshold 0.45 that is N^1.63 and the sweep measured a 1.27
    * TIME exponent (0.39/1.14/135 s at sf0.01/0.1/1). Use this operator
    * at HIGH thresholds (≥ 0.8, ρ ≤ 0.34) where the bands separate;
    * at moderate thresholds use [[cosineNearDupPairsClustered]], whose
    * candidate volume is O(N) by construction.
    */
  def cosineNearDupPairsSrp(embeddings: DataFrame, idCol: String,
                            vecCol: String, threshold: Double,
                            minBands: Int = SrpPairMinBands): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val bandsPerWord = 30 / SrpPairBandBits  // 6
    val mask = (1L << SrpPairBandBits) - 1
    val sigs = srpSignature(embeddings.select(col(idCol), col(vecCol)), vecCol)
    val bandStructs = for { w <- 0 until 4; k <- 0 until bandsPerWord } yield
      struct(lit(w * bandsPerWord + k).as("band"),
        shiftrightunsigned(col(s"__w$w"), SrpPairBandBits * k)
          .bitwiseAND(lit(mask)).as("bv"))
    val bands = sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("__band"), col("__b.bv").as("__bv"))
    val cand = bands
      .select(col("__band"), col("__bv"), col(idCol).as("vec_a"))
      .join(bands.select(col("__band"), col("__bv"), col(idCol).as("vec_b")),
        Seq("__band", "__bv"))
      .filter(col("vec_a") < col("vec_b"))
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(count(lit(1)).as("__nb"))
      .filter(col("__nb") >= minBands)
      .select(col("vec_a"), col("vec_b"))
    cand
      .join(embeddings.select(col(idCol).as("vec_a"), col(vecCol).as("__va")), "vec_a")
      .join(embeddings.select(col(idCol).as("vec_b"), col(vecCol).as("__vb")), "vec_b")
      .withColumn("cosine", round(cosineFast("__va", "__vb"), 6))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Target per-cluster population for [[cosineNearDupPairsClustered]];
    * with `probes` = 2 the candidate set per vector is ≈ probes² ×
    * target = 100 — the constant that makes the operator linear.
    */
  val ClusteredPairTarget = 25L

  /** Final-assignment probe count for [[cosineNearDupPairsClustered]]. */
  val ClusteredPairProbes = 2

  /** Cluster-bounded near-dup pairs — the linear-by-construction scale
    * path for MODERATE thresholds, where sign-RP banding provably cannot
    * prune: for threshold t the per-bit agreement is p_t = 1 − arccos(t)/π
    * and unrelated pairs sit at p_r ≈ 0.5, so ANY banding scheme holding
    * recall r needs candidate volume Ω(N^(1+ρ)) with
    * ρ = ln(1/p_t)/ln(1/p_r) — at t = 0.45 (θ ≈ 63°, p_t ≈ 0.648),
    * ρ ≈ 0.63 ⇒ N^1.63 candidates no matter the band width/count. The
    * round-10 three-point sweep measured exactly that: the 24×5-bit SRP
    * banding ran 0.39 / 1.14 / 135 s at sf0.01/0.1/1 (time exponent
    * 1.27). [[cosineNearDupPairsSrp]] remains the right tool for HIGH
    * thresholds (t ≥ 0.8 ⇒ ρ ≤ 0.34, tiny constants); THIS operator is
    * the moderate-threshold path.
    *
    * Method: Lloyd rounds with k = ceil(N / targetClusterSize) (the
    * SemDeDup scaling contract, [[autoK]]) refine centroids; the FINAL
    * assignment keeps each vector's top-`probes` centroids (IVF
    * multi-probe transplanted to dedup — boundary pairs are recovered by
    * the second assignment, which single-assignment clustering misses:
    * measured fixture recall 0.50 at probes=1 vs 0.93 at probes=2).
    * Candidates are pairs sharing ANY assigned cluster; precision is
    * always exact (full cosine verify). Per vector the candidate count is
    * ≈ probes² × targetClusterSize — CONSTANT as N grows, so candidate
    * volume is O(N) by construction; the Lloyd assign is O(N·k·d) per
    * round. At corpus sizes where the N/25 centroids stop broadcasting,
    * the SAME single-level semantics runs on SHUFFLE transport: set
    * `centroidShards` (or leave None — auto-engages when the estimated
    * centroid bytes k·(8d+48) exceed spark.sql.autoBroadcastJoinThreshold)
    * and every assign — Lloyd rounds AND the final multi-probe — switches
    * to the sharded equi-join in [[assignTopPRows]]: bit-identical
    * scores/tie-breaks, same O(N·k·d) compute, per-task centroid build
    * side k/shards, no broadcast of the centroid table anywhere
    * (plan-asserted in SimilaritySpec). A refined two-level tree was
    * MEASURED instead (round-10 continuation, Lloyd at both levels +
    * multi-probe at both) and loses the recall-per-candidate trade at
    * this threshold — 0.71 recall at the single-level budget (~20%
    * candidates), 0.86–0.93 only at 38–59% candidates vs single-level's
    * 0.93 at 19%; fragmenting the quantizer splits true neighborhoods
    * across coarse cells faster than probing recovers them. Recall is
    * MEASURED, never assumed: q_dedup_recall_clustered audits against
    * the exact pairs with a ≥ 0.8 floor in SimilaritySpec (fixture:
    * 13/14 at 19% candidate fraction, target=25, probes=2 — the same
    * candidate budget the SRP banding spent for recall 1.0 at THIS N,
    * but spent linearly instead of quadratically).
    *
    * The one `count()` sizes k (metadata-scale scalar, as in
    * [[semDedupAuto]]). Returns (vec_a, vec_b, cosine), vec_a < vec_b.
    */
  def cosineNearDupPairsClustered(embeddings: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      targetClusterSize: Long = ClusteredPairTarget,
      probes: Int = ClusteredPairProbes, iters: Int = 2,
      centroidShards: Option[Int] = None): DataFrame = {
    require(probes >= 1 && iters >= 2,
      "cosineNearDupPairsClustered needs probes >= 1 and iters >= 2")
    GraftFunctions.register(embeddings.sparkSession)
    val k = autoK(embeddings.count(), targetClusterSize)
    val shards = centroidShards.getOrElse(
      autoCentroidShards(embeddings, vecCol, k))
    val withVd = embeddings.select(col(idCol), col(vecCol),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("__vd"))
    var cents = withVd.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).cast("long").as("cid"), col("__vd").as("cv"))
    // iters−1 argmax refinement rounds, then the multi-probe assignment
    // against the final centroids — mirroring the oracle's CTE chain
    // (c0 → a1 → c1 → a2(keep=probes)) value-for-value.
    for (_ <- 1 until iters)
      cents = updateCentroids(
        assignTopPRows(withVd, cents, 1, idCol, shards)
          .withColumnRenamed("__cluster", "cluster"))
    val asg = assignTopPRows(withVd, cents, probes, idCol, shards)
      .select(col(idCol), col("__cluster").as("cluster"))
    val cand = asg.select(col("cluster"), col(idCol).as("vec_a"))
      .join(asg.select(col("cluster"), col(idCol).as("vec_b")), Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    cand
      .join(embeddings.select(col(idCol).as("vec_a"), col(vecCol).as("__va")), "vec_a")
      .join(embeddings.select(col(idCol).as("vec_b"), col(vecCol).as("__vb")), "vec_b")
      .withColumn("cosine", round(cosineFast("__va", "__vb"), 6))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Top-`p` nearest-centroid assignment as per-(vector, centroid) ROWS:
    * each vector fans out against the k centroids, the cosine runs
    * through the codegen [[graft.expressions.FloatVecDot]] (double-array
    * side support) instead of an interpreted HOF over a nested struct
    * array, and the per-vector top-p comes from a `row_number ≤ p`
    * window that WindowGroupLimit prunes MAP-SIDE — the exchange carries
    * N·p rows (N·shards·p sharded), never N·k. This is the assign
    * formulation that makes auto-k clustering usable as k grows with N:
    * the round-10 sweep measured the HOF formulation at 45 µs per
    * (vector, centroid) evaluation (733 s for one assign at N=20k,
    * k=800); the row formulation runs the same 16M cosines in seconds.
    *
    * TRANSPORT is the knob, the scoring is not: `centroidShards ≤ 1`
    * fans out with a broadcast cross join (centroid table must fit the
    * broadcast ceiling — driver + every executor hold all k vectors);
    * `centroidShards = S > 1` is the 100-TB path — a SHUFFLE_HASH
    * equi-join on the composite key (vector-salt × centroid-shard):
    * vectors carry their hash-salt and explode S shard ids, centroids
    * carry cid % S and explode P salt ids, so every (vector, centroid)
    * pair meets EXACTLY once, each task builds on k/S centroids (memory
    * bounded by S), parallelism is P·S tasks, and no broadcast of the
    * centroid table exists anywhere in the plan (asserted in
    * SimilaritySpec). Transport: N·S vector rows + k·P centroid rows —
    * choose S ≈ centroid-bytes / broadcast-threshold ([[
    * autoCentroidShards]]) so S stays small while each build side fits.
    * Cosine values and (sim desc, cid asc) tie-breaks are bit-identical
    * between the two transports and to the oracle's `row_number OVER
    * (ORDER BY s DESC, cid ASC)` replay — same doubles, same rounding,
    * same total order, so every downstream hash gate is transport-blind.
    * Returns the input columns plus (__cluster, __sim).
    */
  private[graft] def assignTopPRows(withVd: DataFrame, cents: DataFrame,
      p: Int, idCol: String, centroidShards: Int = 1): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sim").desc, col("cid").asc)
    val fanned =
      if (centroidShards <= 1) withVd.crossJoin(broadcast(cents))
      else {
        val salts = withVd.sparkSession.conf
          .get("spark.sql.shuffle.partitions").toInt.max(1)
        val v = withVd
          .withColumn("__vs", pmod(hash(col(idCol)), lit(salts)).cast("int"))
          .withColumn("__cs",
            explode(sequence(lit(0), lit(centroidShards - 1))))
        val c = cents
          .withColumn("__cs", pmod(col("cid"), lit(centroidShards)).cast("int"))
          .withColumn("__vs", explode(sequence(lit(0), lit(salts - 1))))
        v.join(c.hint("shuffle_hash"), Seq("__vs", "__cs")).drop("__vs", "__cs")
      }
    fanned
      .withColumn("__sim", round(cosineFast("__vd", "cv"), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= p)
      .withColumn("__cluster", col("cid"))
      .drop("cv", "cid", "__rn")
  }

  /** BNLJ→sharded crossover for [[autoCentroidShards]] (measured, see
    * SCALE.md round 11): at k = 80 the two transports tie within noise
    * (1.7 vs 2.1 s at sf0.1); at k = 800 the sharded join is 2.5×
    * faster (22.6 vs 57.5 s at sf1) — the broadcast nested-loop fan-out
    * degrades before its BYTES stop fitting.
    */
  val CentroidShardK = 256L

  /** Shard count for [[assignTopPRows]]'s centroid transport: 1
    * (broadcast) while the estimated centroid bytes k·(8·dims + 48)
    * fit spark.sql.autoBroadcastJoinThreshold AND the fan-out stays
    * under [[CentroidShardK]] centroids (past that the shuffled hash
    * join is measurably faster than the broadcast nested loop even
    * though the bytes still fit — 2.5× at k = 800); else the smallest
    * S whose per-task build side k/S fits the threshold again (≥ 2 at
    * the compute crossover). The dims probe reads ONE row
    * (metadata-scale, like the operator's own count()); a disabled
    * threshold (≤ 0) falls back to the 10 MB default so the guardrail
    * can't be configured away by the conf that disables broadcast
    * JOINS (which would need MORE sharding, not none).
    */
  private[graft] def autoCentroidShards(embeddings: DataFrame,
      vecCol: String, k: Long): Int = {
    val dims = embeddings.select(size(col(vecCol)).as("d")).head.getInt(0)
    val raw = embeddings.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val thresholdBytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      catch { case _: Exception => 10485760L }
    val limit = if (thresholdBytes > 0) thresholdBytes else 10485760L
    val centroidBytes = k * (8L * dims + 48L)
    val byBytes = math.max(1L, (centroidBytes + limit - 1) / limit).toInt
    if (k >= CentroidShardK) math.max(2, byBytes) else byBytes
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    * semantic dedup by clustering the embedding space ([[kmeansAssign]])
    * and dropping, within each cluster, every vector whose cosine to a
    * LOWER-id cluster-mate reaches `threshold`. The clustering is what
    * makes the quadratic step tractable: candidate pairs come from an
    * equi-join on the cluster id — per-cluster-bounded work after one
    * shuffle on cluster, never a corpus-wide cross join (the published
    * method's own scaling argument; at 100 TB, k grows with the corpus so
    * cluster size stays bounded). Deterministic keep rule (lowest id per
    * near-dup neighbourhood survives) instead of the paper's random
    * representative, so results are engine-reproducible.
    * Returns one row per vector: (idCol, cluster, kept).
    */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, threshold: Double,
               centroidShards: Option[Int] = None): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val assigned =
      kmeansAssign(embeddings, idCol, vecCol, k, iters, centroidShards)
        .select(col(idCol), col("cluster"))
    val withVec = embeddings.select(col(idCol), col(vecCol))
      .join(assigned, Seq(idCol))
    val a = withVec.select(col("cluster"), col(idCol).as("__id_a"),
      col(vecCol).as("__va"))
    val b = withVec.select(col("cluster"), col(idCol).as("__id_b"),
      col(vecCol).as("__vb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(round(cosineFast("__va", "__vb"), 6) >= threshold)
      .select(col("__id_b").as(idCol)).distinct()
    assigned
      .join(dropped.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("__drop").isNull.as("kept"))
  }

  /** [[semDedup]] with k derived from the corpus instead of caller-pinned:
    * k = ceil(N / targetClusterSize). This is the published method's own
    * scaling contract made executable — cluster population stays bounded
    * near `targetClusterSize` as N grows, so the per-cluster quadratic
    * verify step is O(N · targetClusterSize) total, linear in the corpus.
    * The one `count()` is a metadata-scale scalar (it sizes k, nothing
    * else); the pinned-k overload remains the oracle path because k is
    * part of the pinned recall curve the oracle replays.
    */
  def semDedupAuto(embeddings: DataFrame, idCol: String, vecCol: String,
                   targetClusterSize: Long, iters: Int,
                   threshold: Double,
                   centroidShards: Option[Int] = None): DataFrame = {
    require(targetClusterSize > 0, "semDedupAuto: targetClusterSize must be positive")
    val k = autoK(embeddings.count(), targetClusterSize)
    semDedup(embeddings, idCol, vecCol, k, iters, threshold, centroidShards)
  }

  /** The auto-k rule alone (spec-checkable without running the dedup). */
  def autoK(n: Long, targetClusterSize: Long): Int =
    math.max(1L, (n + targetClusterSize - 1) / targetClusterSize).toInt

  /** Topic-balanced resampling: cluster the corpus by embedding
    * ([[kmeansAssign]]'s deterministic Lloyd rounds), then cap every
    * cluster at `perClusterCap` docs — the curation step that stops a
    * dominant topic (one crawl's boilerplate genre, one language's news
    * sphere) from swamping the training mixture, while topics under the
    * cap pass through whole. Selection within a cluster is
    * [[graft.operators.Relational.reservoirSample]]'s content-hash
    * priority: a pure function of the ids, so the balanced subset is
    * reproducible across runs/engines/partitionings and STABLE under
    * incremental growth (new docs displace only hash-later docs in their
    * own cluster).
    *
    * Plan: the Lloyd rounds are broadcast-projection argmaxes (no N×k
    * shuffle; sharded row-join transport past the [[CentroidShardK]]
    * crossover, as everywhere), and the cap is one cluster-partitioned
    * rank window with WindowGroupLimit's map-side partial top-k.
    * Returns (idCol, cluster) for the kept rows.
    */
  def topicBalance(embeddings: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, perClusterCap: Int,
                   centroidShards: Option[Int] = None): DataFrame =
    graft.operators.Relational.reservoirSample(
      kmeansAssign(embeddings, idCol, vecCol, k, iters, centroidShards)
        .select(col(idCol), col("cluster")),
      idCol, "cluster", perClusterCap)

  /** Per-vector stats: dimension, L2 norm, sign bucket, plus any
    * caller-selected passthrough columns.
    */
  def vectorStats(embeddings: DataFrame, idCol: String, vecCol: String,
                  extraCols: Seq[String] = Nil): DataFrame =
    embeddings.select(
      (col(idCol) +: extraCols.map(col)) ++ Seq(
        size(col(vecCol)).cast("long").as("dim"),
        round(sqrt(norm2(col(vecCol))), 6).as("l2_norm"),
        signBucket(col(vecCol)).as("bucket")): _*)

  /** Product-quantization top-k (Jégou et al. 2011, "Product Quantization
    * for Nearest Neighbor Search"): vectors are split into `m` subvectors,
    * each subspace gets its own tiny k-means codebook (`ksub` centroids,
    * deterministic first-`ksub`-by-id seeds + one Lloyd round — the same
    * oracle-replayable recipe as [[kmeansAssign]]), and every vector is
    * stored as `m` small codes. Query scoring is ADC (asymmetric distance
    * computation): ONE `m × ksub` lookup table of subspace dot products,
    * then each candidate costs m table lookups instead of a d-dim float
    * scan — at 100 TB the scored pass reads m bytes/vector (codes) plus a
    * broadcast LUT, not 4d bytes/vector of raw floats, which is the whole
    * point of PQ. The top `rerank` ADC candidates are re-ranked exactly
    * against the raw vectors (the standard two-stage recipe), so the final
    * ordering is exact over the candidate set.
    *
    * Engine parity: subspace distances and LUT entries round(6); the
    * across-subspace sums go through DECIMAL(38,12) (4 exact addends —
    * order-independent), so the whole chain is hash-checkable in DuckDB.
    * Approximate cosine uses the codebook reconstruction norm
    * sqrt(Σ_s ||c_s||²) — deterministic, no per-vector raw access.
    */
  def pqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int, m: Int = 4, ksub: Int = 4,
             rerank: Int = 20): DataFrame = {
    require(m >= 1 && ksub >= 1 && rerank >= k, "pqTopK: bad parameters")
    val (withVd, c1, codes, sd) = pqModel(embeddings, idCol, vecCol, m, ksub)
    pqServe(withVd, c1, codes, queryId, k, rerank, m, sd, idCol)
  }

  /** PQ train + encode: deterministic codebooks (seeded Lloyd round) and
    * the per-(vector, subspace) codes. Returns (withVd, codebook, codes,
    * subdim) — the persistable artifacts [[PqStore]] writes once.
    */
  private[similarity] def pqModel(embeddings: DataFrame, idCol: String,
                                  vecCol: String, m: Int, ksub: Int)
      : (DataFrame, DataFrame, DataFrame, Int) = {
    GraftFunctions.register(embeddings.sparkSession)
    // withVd feeds the dim probe, the seed broadcast and (via the caller)
    // the query/rerank subtrees; subs feeds the seed join plus BOTH assign
    // passes — cut each once so the scan + per-subspace explode runs one
    // time instead of once per consumer (optimization guide §1.2 step 1:
    // fix recomputed passes before per-task work; §5 cache-when-reused)
    val withVd = embeddings.select(col(idCol).cast("long").as("vid"),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("v"))
      .cutLineage()
    val dim = withVd.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"pqModel: dim $dim not divisible by m=$m")
    val sd = dim / m
    val subs = withVd
      .select(col("vid"), col("v"), explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("vid"), col("s"),
        slice(col("v"), col("s") * sd + 1, lit(sd)).as("sv"))
      .cutLineage()
    // assignment: per (vector, subspace) argmin L2² over the codebook —
    // ONE broadcast of the collected codebook and an array_min over
    // (dist, cid) structs, so encoding is a pure projection (no shuffle,
    // no window; lexicographic struct order = the d-then-cid tiebreak).
    // The distance is the codegen graft_l2sq — bit-identical to the
    // portable (x−y)² fold (FloatVecL2sqSpec), evaluated ksub times per
    // row, which made the interpreted-HOF formulation the train's hot spot
    // (optimization guide §1.2 step 2 / the FloatVecDot rationale).
    // ... and the codebook broadcasts as a subspace-keyed MAP so each row
    // scans only its own subspace's ksub codewords instead of filtering
    // all m·ksub entries per row (same argmin domain — array_min is
    // order-independent, so collect_list order cannot matter).
    // ... and the whole per-row argmin is ONE fused codegen loop
    // (graft_pq_argmin — bit-parity with the array_min(transform(...))
    // formulation pinned by VecArgBestSpec): the interpreted per-codeword
    // lambda + struct alloc + BigDecimal round(…, 6) were the remaining
    // train hot spot after graft_l2sq (r17; guide §1.2 step 2)
    def assign(cents: DataFrame): DataFrame = {
      val centsMap = cents
        .groupBy(col("s").as("cs"))
        .agg(collect_list(struct(col("cid"), col("cv"))).as("__ca"))
        .agg(map_from_entries(collect_list(struct(col("cs"), col("__ca"))))
          .as("__cmap"))
      subs.crossJoin(broadcast(centsMap))
        .withColumn("cid",
          expr("graft_pq_argmin(element_at(__cmap, s), sv)"))
        .select(col("vid"), col("s"), col("cid"), col("sv"))
    }
    val seeds = subs
      .join(broadcast(withVd.orderBy(col("vid").asc).limit(ksub)
        .select(col("vid").as("cid"))), subs("vid") === col("cid"))
      .select(col("s"), col("cid"), col("sv").as("cv"))
    // the trained codebook feeds the encode pass AND the caller's LUT —
    // cut it so the seed-assignment aggregation chain runs once
    val c1 = assign(seeds)
      .select(col("s"), col("cid"), posexplode(col("sv")))
      .groupBy(col("s"), col("cid"), col("pos"))
      .agg(sum(col("col").cast("decimal(38,12)")).as("__sum"),
        count(lit(1)).cast("long").as("__n"))
      .withColumn("m", round(col("__sum").cast("double") / col("__n"), 6))
      .groupBy(col("s"), col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), e -> e.m)").as("cv"))
      .cutLineage()
    val codes = assign(c1).select(col("vid"), col("s"), col("cid"))
    (withVd, c1, codes, sd)
  }

  /** Encode vectors against a FROZEN codebook — [[pqModel]]'s assignment
    * projection exposed for incremental [[PqStore.appendBatch]]: a new
    * batch gets codes under the shipped codebook (retraining per batch
    * would invalidate every existing code — the standard PQ serving
    * contract), via the identical round-6 subspace distance and
    * d-then-cid tie-break. Returns (vid, s, cid).
    */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, m: Int, sd: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val withVd = embeddings.select(col(idCol).cast("long").as("vid"),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("v"))
    val subs = withVd
      .select(col("vid"), col("v"), explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("vid"), col("s"), slice(col("v"), col("s") * sd + 1, lit(sd)).as("sv"))
    // codegen graft_l2sq + subspace-keyed codebook map — the pqModel
    // assign shape (bit-identical argmin; see the notes there)
    val centsMap = codebook
      .groupBy(col("s").as("cs"))
      .agg(collect_list(struct(col("cid"), col("cv"))).as("__ca"))
      .agg(map_from_entries(collect_list(struct(col("cs"), col("__ca"))))
        .as("__cmap"))
    subs.crossJoin(broadcast(centsMap))
      .withColumn("cid",
        expr("graft_pq_argmin(element_at(__cmap, s), sv)"))
      .select(col("vid"), col("s"), col("cid"))
  }

  /** [[ivfAssign]]'s broadcast argmax against an EXPLICIT (cid, cv)
    * centroid frame — the frozen-model assignment an incremental
    * [[IvfStore.appendBatch]] needs: identical similarity rounding and
    * smallest-cid tie-break, so appending ids outside the seed range
    * under the store's own centroids assigns exactly what a full rebuild
    * would (the seeds are by-construction unchanged by new higher ids).
    */
  def assignToCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val centsArr = centroids
      .agg(collect_list(struct(col("cid").cast("long").as("cid"),
        col("cv").as("cv"))).as("__cents"))
    embeddings.crossJoin(broadcast(centsArr))
      .withColumn("__best", expr(s"graft_cos_best(__cents, $vecCol)"))
      .withColumn("cluster", col("__best.cid"))
      .withColumn("centroid_sim", col("__best.sim"))
      .drop("__cents", "__best")
  }

  /** ADC scoring + exact rerank over a (codebook, codes) pair — shared by
    * the ad-hoc [[pqTopK]] (which trains in-plan) and [[PqStore]] (which
    * reads the persisted artifacts), so both produce the identical
    * ranking by construction.
    */
  private[similarity] def pqServe(withVd: DataFrame, c1: DataFrame,
                                  codes: DataFrame, queryId: Long, k: Int,
                                  rerank: Int, m: Int, sd: Int,
                                  idCol: String): DataFrame = {
    GraftFunctions.register(withVd.sparkSession)
    // ADC lookup table: m × ksub subspace dot products against the query
    val qsubs = withVd.filter(col("vid") === queryId)
      .select(col("vid"), col("v"), explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("s").as("qs"), slice(col("v"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val lut = c1.join(broadcast(qsubs), c1("s") === col("qs"))
      .select(col("s"), col("cid"),
        round(expr("graft_dot(cv, qsv)"), 6)
          .as("pdot"),
        round(expr("graft_dot(cv, cv)"), 6).as("pnorm2"))
    val qn = withVd.filter(col("vid") === queryId)
      .select(sqrt(expr("graft_dot(v, v)")).as("qnorm"),
        col("v").as("qv"))
    val cands = codes.join(broadcast(lut), Seq("s", "cid"))
      .groupBy(col("vid"))
      .agg(sum(col("pdot").cast("decimal(38,12)")).cast("double").as("__adc"),
        sum(col("pnorm2").cast("decimal(38,12)")).cast("double").as("__apx2"))
      .crossJoin(broadcast(qn.select(col("qnorm"))))
      .filter(col("vid") =!= queryId)
      .select(col("vid"),
        round(col("__adc") / (col("qnorm") * sqrt(col("__apx2"))), 6).as("adc_cosine"))
      .orderBy(col("adc_cosine").desc, col("vid").asc)
      .limit(rerank)
    cands.join(withVd, "vid")
      .crossJoin(broadcast(qn.select(col("qv"))))
      .select(col("vid").as(idCol), col("adc_cosine"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-query face of [[pqServe]] for the recall audit (round-11
    * verdict item 2 — PQ was the only ANN path whose accuracy was a
    * Scaladoc claim, and round 7 proved exactly that can hide recall
    * 0.0): every vector with id < `maxQid` queries the SAME trained
    * (codebook, codes) pair at once — ONE broadcast LUT of
    * (queries × m × ksub) subspace dot products, one codes-scan ADC
    * pass grouped by (query, vector), per-query top-`rerank` exact
    * rerank, top-`k` kept. Identical scoring algebra to [[pqServe]]
    * (round-6 LUT entries, DECIMAL(38,12) across-subspace sums, rounded
    * exact rerank), so the audit measures the path users actually run.
    * Returns (qid, vec_id).
    */
  private[similarity] def pqTopKMulti(withVd: DataFrame, c1: DataFrame,
                                      codes: DataFrame, maxQid: Long,
                                      k: Int, rerank: Int, m: Int,
                                      sd: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(withVd.sparkSession)
    val qsubs = withVd.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"), col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("qid"), col("s"),
        slice(col("v"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val lut = c1.join(broadcast(qsubs), Seq("s"))
      .select(col("qid"), col("s"), col("cid"),
        round(expr("graft_dot(cv, qsv)"), 6)
          .as("pdot"),
        round(expr("graft_dot(cv, cv)"), 6).as("pnorm2"))
    val qn = withVd.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"),
        sqrt(expr("graft_dot(v, v)")).as("qnorm"),
        col("v").as("qv"))
    val cands = codes.join(broadcast(lut), Seq("s", "cid"))
      .groupBy(col("qid"), col("vid"))
      .agg(sum(col("pdot").cast("decimal(38,12)")).cast("double").as("__adc"),
        sum(col("pnorm2").cast("decimal(38,12)")).cast("double").as("__apx2"))
      .join(broadcast(qn.select(col("qid"), col("qnorm"))), "qid")
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        round(col("__adc") / (col("qnorm") * sqrt(col("__apx2"))), 6)
          .as("adc_cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("adc_cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("vid"))
    cands.join(withVd, "vid")
      .join(broadcast(qn.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("vid"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("vid").as("vec_id"))
  }

  /** [[pqTopKMulti]] with in-plan training — the recall audit's ad-hoc
    * twin of [[pqTopK]] (identical codebook recipe, every id < `maxQid`
    * as a query at once).
    */
  def pqTopKMultiQuery(embeddings: DataFrame, idCol: String, vecCol: String,
                       maxQid: Long, k: Int, m: Int = 8, ksub: Int = 8,
                       rerank: Int = 40): DataFrame = {
    val (withVd, c1, codes, sd) = pqModel(embeddings, idCol, vecCol, m, ksub)
    pqTopKMulti(withVd, c1, codes, maxQid, k, rerank, m, sd)
  }

  /** FILTERED vector search — the vector-DB primitive every retrieval
    * deployment needs (FAISS IDSelector / Elastic kNN filter): SRP sketch
    * candidates within Hamming `radius`, restricted by an arbitrary
    * candidate-row predicate BEFORE the exact rerank, so the filter
    * shrinks (never dilutes) the rerank budget and the returned k are
    * all predicate-true. The predicate rides the same candidate scan as
    * the Hamming filter — one pass, no extra join when it references the
    * embedding table's own columns. At 100 TB a highly selective
    * predicate should ALSO prune physically (write the table partitioned
    * or z-ordered by the filter column — the layout story of
    * `q_bucket_pruning`/`q_zorder`); the sketch+filter+rerank algebra is
    * unchanged by the layout. Recall caveat measured in the scaladoc of
    * [[srpTopK]] applies per-stratum: the sketch's candidate set is
    * filter-agnostic, so a predicate selecting a tiny stratum wants a
    * wider radius (the knob, not a new code path).
    */
  def srpTopKFiltered(embeddings: DataFrame, idCol: String, vecCol: String,
                      queryId: Long, k: Int, pred: Column,
                      radius: Int = SrpRadius): DataFrame = {
    val sigs = srpSignature(embeddings, vecCol)
    val q = sigs.filter(col(idCol) === queryId)
      .select((col(vecCol).as("__qv") +:
        (0 until 4).map(w => col(s"__w$w").as(s"__qw$w"))): _*)
    sigs.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId && srpHamming("__w", "__qw") <= radius)
      .filter(pred)
      .select(col(idCol), round(cosineFast(vecCol, "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversity-aware top-k every retrieval/RAG serving stack runs
    * after candidate generation: greedily select `k` of a `poolSize`
    * relevance pool, each round maximizing
    * λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s) (ties: smaller id).
    * λ = 1 is pure relevance; λ = 0 pure diversity.
    *
    * Plan shape ([[kCenterSelect]]'s): the pool is ONE scored scan +
    * top-`poolSize` cut; each greedy round is a broadcast of the ≤ k
    * selected vectors against the ≤ poolSize pool — constant-size work
    * per round regardless of corpus size, because diversification is a
    * RERANK, not a scan (the 100-TB cost lives in the candidate
    * generator, which is any of the ANN paths). Deterministic: cosines
    * round(6) before max, the marginal score round(6) before the argmax,
    * so the DuckDB oracle replays the greedy selection exactly.
    * Returns (pick_order, idCol, qsim).
    */
  def mmrSelect(embeddings: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, poolSize: Int = 20,
                lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && poolSize >= k, "mmrSelect: need 1 <= k <= poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, "mmrSelect: lambda in [0, 1]")
    GraftFunctions.register(embeddings.sparkSession)
    val emb = embeddings
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
    val qv = emb.filter(col("vid") === queryId).select(col("v").as("__qv"))
    val pool = emb.filter(col("vid") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vid"), col("v"),
        round(cosineFast("v", "__qv"), 6).as("qsim"))
      .orderBy(col("qsim").desc, col("vid").asc)
      .limit(poolSize)
      .cutLineageEager()
    var sel = pool.orderBy(col("qsim").desc, col("vid").asc).limit(1)
      .select(col("vid"), col("v"), col("qsim"), lit(0).as("pick_order"))
      .cutLineageEager()
    for (r <- 1 until k) {
      val picked = broadcast(
        sel.select(col("vid").as("svid"), col("v").as("sv")))
      // v/qsim ride the groupBy KEY (identical per vid by construction —
      // every row of a group comes from the same pool row crossed with
      // the selected set), so determinism is structural; first() would be
      // formally non-deterministic and silently desync from the oracle if
      // a refactor ever broke the invariant
      val next = pool
        .join(sel.select(col("vid")), Seq("vid"), "left_anti")
        .crossJoin(picked)
        .groupBy(col("vid"), col("v"), col("qsim"))
        .agg(max(round(cosineFast("v", "sv"), 6)).as("__ms"))
        .orderBy(
          round(lit(lambda) * col("qsim") - lit(1.0 - lambda) * col("__ms"), 6).desc,
          col("vid").asc)
        .limit(1)
        .select(col("vid"), col("v"), col("qsim"), lit(r).as("pick_order"))
      sel = sel.unionByName(next).cutLineageEager()
    }
    sel.select(col("pick_order").cast("long").as("pick_order"),
      col("vid").as(idCol), col("qsim"))
  }

  /** The coarse-centroid frame (cid, cv) as DOUBLEs — the first
    * `nCentroids` vectors by id, [[ivfAssign]]'s seed contract. Doubles
    * because every downstream use (residual subtraction, codebook shift)
    * is double math; the float→double cast is exact, so assignment
    * against these equals assignment against the raw floats.
    */
  private[similarity] def centroidFrame(embeddings: DataFrame, idCol: String,
                                        vecCol: String,
                                        nCentroids: Int): DataFrame =
    embeddings.filter(col(idCol) < nCentroids)
      .select(col(idCol).cast("long").as("cid"),
        expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("cv"))

  /** Residuals r = v − c(cluster) for IVF-PQ: each vector minus its
    * assigned coarse centroid, elementwise in double (exact float casts,
    * so the DuckDB oracle reproduces every coordinate bit-for-bit).
    * `assigned` is (idCol, cluster); `cents` is [[centroidFrame]]'s
    * (cid, cv). Returns (idCol, embedding=residual double[]).
    */
  private[similarity] def residualFrame(embeddings: DataFrame, idCol: String,
                                        vecCol: String, assigned: DataFrame,
                                        cents: DataFrame): DataFrame =
    embeddings.join(assigned, Seq(idCol))
      .join(broadcast(cents), col("cluster") === col("cid"))
      .select(col(idCol),
        expr(s"zip_with(CAST($vecCol AS ARRAY<DOUBLE>), cv," +
          " (x, y) -> x - y)").as("embedding"))

  /** Train the residual PQ codebook and encode ALL rows — the one
    * correct seeding for IVFADC: the train set EXCLUDES the coarse-
    * centroid ids (< nCentroids), because a centroid's residual is
    * exactly the zero vector — seeding [[pqModel]]'s first-ksub-by-id
    * Lloyd round with them collapses every subspace codebook to a single
    * codeword and makes every ADC score constant (found by an
    * adversarial review: the oracle replayed the same degenerate algebra,
    * so hash gates alone never caught it). Seeds are therefore the first
    * ksub NON-centroid ids' residuals; the excluded centroid rows are
    * still corpus members and get codes in the same frozen-codebook
    * [[pqEncode]] pass as everyone else (their zero residual lands on
    * the codeword nearest the origin). ONE encode pass over the full
    * residual frame — [[pqModel]]'s own assignment projection and
    * [[pqEncode]] share the identical round-6/d-then-cid algebra, so
    * encoding the train rows again is value-equal to keeping pqModel's
    * codes, and the residual subtree is scanned once instead of once per
    * union branch. Returns (codebook, codes-for-all, subdim).
    */
  private[similarity] def ivfPqCodebookAndCodes(resid: DataFrame,
                                                idCol: String,
                                                nCentroids: Int, m: Int,
                                                ksub: Int)
      : (DataFrame, DataFrame, Int) =
    ivfPqCodebookAndCodesFiltered(resid, idCol, col(idCol) >= nCentroids,
      m, ksub)

  /** [[ivfPqCodebookAndCodes]] with an EXPLICIT train predicate — for
    * builds whose coarse centroids are not data rows (Lloyd-trained
    * means): no row's residual is identically zero there, so the train
    * set is the whole corpus (`lit(true)`). Seed-id builds keep the
    * id-range exclusion via the named wrapper above.
    */
  private[similarity] def ivfPqCodebookAndCodesFiltered(resid: DataFrame,
                                                        idCol: String,
                                                        trainPred: Column,
                                                        m: Int, ksub: Int)
      : (DataFrame, DataFrame, Int) = {
    // the residual frame (scan + assignment join + centroid subtract) feeds
    // the guard count, the codebook train AND the full encode pass — cut it
    // once (guide §1.2 step 1); callers' repeated consumption is the whole
    // cost of the in-plan IVFADC audits
    val residCut = resid.cutLineage()
    val train = residCut.filter(trainPred)
    // loud guard, not a degenerate build: with 0 train rows pqModel's
    // dim probe throws an opaque empty-head error, and with 1 the
    // codebook is one-codeword-per-subspace — the constant-ADC collapse
    // this helper exists to prevent. A corpus this small has no business
    // in an IVFADC index (brute force or flat PQ instead).
    val n = train.limit(2).count()
    require(n >= 2, s"ivfPq: need >= 2 non-centroid vectors to train the " +
      s"residual codebook (got $n) — corpus too small for IVFADC")
    val (_, cb, _, sd) = pqModel(train, idCol, "embedding", m, ksub)
    (cb, pqEncode(residCut, idCol, "embedding", cb, m, sd), sd)
  }

  /** Shift a PQ codebook by one coarse centroid: cv′ = c_s + cv per
    * subspace — the algebraic trick that makes residual-PQ (IVFADC)
    * serving reuse the flat-PQ machinery verbatim. Since subspaces
    * partition the coordinates, dot(q, ĉ+r̂) = Σ_s dot(q_s, c_s+cv) and
    * ‖ĉ+r̂‖² = Σ_s ‖c_s+cv‖², so [[pqServe]] / [[pqServePacked]] over the
    * shifted codebook compute exactly the IVFADC approximation — and the
    * flat-PQ DuckDB oracle chain gates it with one extra CTE. `centroid`
    * is a 1-row (cv double[dim]) frame (the probed cluster); all other
    * codebook columns (cid, ord) pass through.
    */
  private[similarity] def shiftCodebook(codebook: DataFrame,
                                        centroid: DataFrame, m: Int,
                                        sd: Int): DataFrame = {
    val csl = centroid
      .select(explode(sequence(lit(0), lit(m - 1))).as("__cs"), col("cv").as("__cv"))
      .select(col("__cs"), slice(col("__cv"), col("__cs") * sd + 1, lit(sd)).as("__csv"))
    codebook.join(broadcast(csl), codebook("s") === csl("__cs"))
      .withColumn("cv", expr("zip_with(__csv, cv, (x, y) -> x + y)"))
      .drop("__cs", "__csv")
  }

  /** IVF-PQ with residual encoding (Jégou et al. 2011 §V, "IVFADC" — the
    * coarse-quantizer + product-quantized-residual layout FAISS ships as
    * IndexIVFPQ, and the one a 100-TB vector corpus actually deploys):
    * every vector is assigned to its nearest coarse centroid
    * ([[ivfAssign]]), the PQ codebook is trained on the RESIDUAL
    * r = v − c(cluster) — residuals concentrate around the origin, so the
    * same ksub codewords quantize them far tighter than raw vectors —
    * and a query ADC-scans ONLY its probe cluster's codes.
    *
    * Scale shape: the two knobs COMPOUND — the candidate pass reads
    * nprobe/nCentroids of the corpus (a partition-pruned directory read
    * in [[IvfPqStore]], never a post-filter) at m bytes per vector
    * (packed codes + one broadcast LUT). Flat PQ reads m bytes × N;
    * plain IVF reads 4d bytes × N/nCentroids; this reads
    * m bytes × N/nCentroids. The serve algebra is [[pqServe]] over the
    * probed cluster's SHIFTED codebook ([[shiftCodebook]]), so accuracy
    * and determinism contracts are inherited unchanged, and the top
    * `rerank` candidates re-rank exactly against raw vectors as always.
    */
  def ivfPqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, nCentroids: Int = 8, m: Int = 8,
                ksub: Int = 8, rerank: Int = 40): DataFrame = {
    require(rerank >= k, "ivfPqTopK: rerank must be >= k")
    // assignment feeds the residual frame, the probe-cluster point read and
    // the cluster-member list — one argmax pass, cut once (guide §1.2)
    val assigned = ivfAssign(embeddings, idCol, vecCol, nCentroids)
      .select(col(idCol), col("cluster"))
      .cutLineage()
    val cents = centroidFrame(embeddings, idCol, vecCol, nCentroids)
    val resid = residualFrame(embeddings, idCol, vecCol, assigned, cents)
    val (cb, codes, sd) =
      ivfPqCodebookAndCodes(resid, idCol, nCentroids, m, ksub)
    // serving-boundary point read (IvfStore.topKAt's idiom): the probe
    // cluster id becomes the literal that prunes the candidate set — in
    // the persisted layout, to a partition directory at planning time
    val qCluster = assigned.filter(col(idCol) === queryId)
      .head().getAs[Number]("cluster").longValue()
    val cshift = shiftCodebook(cb,
      cents.filter(col("cid") === qCluster).select(col("cv")), m, sd)
    val clusterIds = assigned.filter(col("cluster") === qCluster)
      .select(col(idCol).cast("long").as("vid"))
    // pqModel's vectors are RESIDUALS; rerank + the query's LUT slices
    // need the RAW vectors — dot(q_s, c_s + cv) takes the full query's
    // subspaces, and the exact rerank scores raw cosines. pqServe consumes
    // this frame from three subtrees (LUT slices, query norm, rerank) —
    // cut once.
    val rawVd = embeddings.select(col(idCol).cast("long").as("vid"),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("v"))
      .cutLineage()
    pqServe(rawVd, cshift, codes.join(clusterIds, "vid"), queryId, k, rerank,
      m, sd, idCol)
  }

  /** Multi-query face of [[ivfPqTopK]] for the recall audit — every ANN
    * path in the engine carries a measured recall row (the round-7
    * lesson: unmeasured ANN accuracy can be 0.0). Each query qid < maxQid
    * probes its top-`nprobe` clusters (ranked by the exact [[ivfAssign]]
    * sim formula, so rank 1 IS the assigned cluster) with a per-(query,
    * cluster) SHIFTED codebook LUT — the shift is the CANDIDATE cluster's
    * centroid, because the reconstruction is x̂ = c_x + r̂_x. Scoring
    * algebra is [[pqTopKMulti]]'s (round-6 LUT entries, DECIMAL(38,12)
    * across-subspace sums, exact rerank of the top `rerank`). The ADC
    * scores all (query, probed cluster, vector) triples and the
    * membership restriction filters BEFORE the rank cut —
    * value-identical to scoring only in-cluster pairs, and the audit is
    * bounded to maxQid queries, so the wasted pairs stay constant-size.
    * Returns (qid, vec_id).
    */
  def ivfPqTopKMultiQuery(embeddings: DataFrame, idCol: String, vecCol: String,
                          maxQid: Long, k: Int, nCentroids: Int = 8,
                          m: Int = 8, ksub: Int = 8, rerank: Int = 40,
                          nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCentroids,
      "ivfPqTopKMultiQuery: bad nprobe")
    GraftFunctions.register(embeddings.sparkSession)
    // the assignment pass feeds the residual frame AND the membership
    // filter; rawVd feeds the probe ranking, LUT slices, query norms and
    // the exact rerank — cut each once (guide §1.2 step 1)
    val assigned = ivfAssign(embeddings, idCol, vecCol, nCentroids)
      .select(col(idCol).cast("long").as("vid"), col("cluster"))
      .cutLineage()
    val cents = centroidFrame(embeddings, idCol, vecCol, nCentroids)
    val resid = residualFrame(embeddings, idCol, vecCol,
      assigned.select(col("vid").as(idCol), col("cluster")), cents)
    val (cb, codes, sd) =
      ivfPqCodebookAndCodes(resid, idCol, nCentroids, m, ksub)
    val rawVd = embeddings.select(col(idCol).cast("long").as("vid"),
      expr(s"CAST($vecCol AS ARRAY<DOUBLE>)").as("v"))
      .cutLineage()
    ivfPqMultiFromParts(rawVd, cents, cb, codes, assigned, maxQid, k, rerank,
      nprobe, m, sd)
  }

  /** The multi-query IVFADC scoring chain over EXPLICIT parts — shared by
    * the in-plan [[ivfPqTopKMultiQuery]] and [[IvfPqStore.topKMultiAt]]
    * (which reads persisted artifacts and unpacks its codes to this row
    * form), so the recall and drift audits measure the identical algebra
    * users serve with. `rawVd` = (vid, v doubles); `cents` = (cid, cv);
    * `cb` = codebook (s, cid, cv[, ord]); `codes` = row-form
    * (vid, s, cid); `assigned` = (vid, cluster). Returns (qid, vec_id).
    */
  private[similarity] def ivfPqMultiFromParts(rawVd: DataFrame,
                                              cents: DataFrame,
                                              cb: DataFrame, codes: DataFrame,
                                              assigned: DataFrame,
                                              maxQid: Long, k: Int,
                                              rerank: Int, nprobe: Int,
                                              m: Int, sd: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, "ivfPqMultiFromParts: bad nprobe")
    GraftFunctions.register(rawVd.sparkSession)
    // per-query probe set: top-nprobe clusters by the EXACT ivfAssign sim
    // formula (round-6 graft_dot cosine, cid-asc tie-break), so rank 1 is
    // the assigned cluster by construction
    val centsArr = cents
      .agg(collect_list(struct(col("cid"), col("cv"))).as("__cents"))
    val probes = rawVd.filter(col("vid") < maxQid)
      .crossJoin(broadcast(centsArr))
      .select(col("vid").as("qid"), explode(expr(
        """transform(__cents, c -> struct(
          |  round(graft_dot(v, c.cv) /
          |    (sqrt(graft_dot(v, v)) * sqrt(graft_dot(c.cv, c.cv))), 6) AS sim,
          |  c.cid AS cid))""".stripMargin)).as("__p"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("__p.sim").desc, col("__p.cid").asc)))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("__p.cid").as("__qc"))
    val qsubs = rawVd.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"), col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("qid"), col("s"),
        slice(col("v"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val csl = cents
      .select(col("cid").as("__ccid"),
        explode(sequence(lit(0), lit(m - 1))).as("__cs"), col("cv").as("__ccv"))
      .select(col("__ccid"), col("__cs"),
        slice(col("__ccv"), col("__cs") * sd + 1, lit(sd)).as("csv"))
    // per-(query, probed cluster) LUT over that cluster's shifted codebook
    // — the shift is the CANDIDATE cluster's centroid (x̂ = c_x + r̂_x),
    // which for nprobe = 1 coincides with the query's own cluster
    val lut = cb.join(broadcast(qsubs), Seq("s"))
      .join(broadcast(probes), Seq("qid"))
      .join(broadcast(csl),
        col("__qc") === col("__ccid") && col("s") === col("__cs"))
      .withColumn("__cvs", expr("zip_with(csv, cv, (x, y) -> x + y)"))
      .select(col("qid"), col("__qc"), col("s"), col("cid"),
        round(expr("graft_dot(__cvs, qsv)"), 6)
          .as("pdot"),
        round(expr("graft_dot(__cvs, __cvs)"), 6).as("pnorm2"))
    val qn = rawVd.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"),
        sqrt(expr("graft_dot(v, v)")).as("qnorm"),
        col("v").as("qv"))
    val vidCluster = assigned
      .select(col("vid").cast("long").as("vid"), col("cluster").as("__vc"))
    val cands = codes.join(broadcast(lut), Seq("s", "cid"))
      .groupBy(col("qid"), col("__qc"), col("vid"))
      .agg(sum(col("pdot").cast("decimal(38,12)")).cast("double").as("__adc"),
        sum(col("pnorm2").cast("decimal(38,12)")).cast("double").as("__apx2"))
      .join(vidCluster, "vid")
      .filter(col("__vc") === col("__qc") && col("vid") =!= col("qid"))
      .join(broadcast(qn.select(col("qid"), col("qnorm"))), "qid")
      .select(col("qid"), col("vid"),
        round(col("__adc") / (col("qnorm") * sqrt(col("__apx2"))), 6)
          .as("adc_cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("adc_cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("vid"))
    cands.join(rawVd, "vid")
      .join(broadcast(qn.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("vid"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("vid").as("vec_id"))
  }

  /** The deterministic DRIFT fixture behind `q_ann_drift` (round-12
    * verdict item 4): the 20%% append batch (vec_id % 5 == 0) shifts by
    * +0.25 in every coordinate — a hard mean drift, in FLOAT so the
    * DuckDB oracle reproduces it bit-exactly — while the 80%% base is
    * untouched. Feeding this corpus through a store's own incremental
    * chain measures what frozen-space quantization loses when the data
    * moves: the PQ codebook (Lloyd means trained on the base) is the one
    * store with trained state to go stale. SRP needs no audit — its
    * signatures are per-row with plan-time constant planes, so append ≡
    * rebuild bit-for-bit on ANY data; IVF likewise — its "training" is
    * seed selection (ids < NumCentroids), and the incremental chain
    * keeps every seed id in the base, so incr and rebuild assign against
    * the SAME centroid vectors and the stores are identical by
    * construction, drift or not. Zero by proof beats zero by
    * measurement for those two; PQ's delta is measured.
    */
  def driftedEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("embedding",
      when(col("vec_id") % 5 === 0,
        expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 0.25D AS FLOAT))"))
        .otherwise(col("embedding")))

  /** Pack row-form PQ codes into the byte-per-subquantizer layout the
    * Jégou paper stores (one `(vid, code)` row, `code` = m bytes of
    * per-subspace codebook ORDINALS): the persisted serving shape
    * [[PqStore]] writes, cutting the ADC pass's scan bytes ~m× vs the
    * (vid, s, cid) row form. Ordinals, not raw cids, because cids are
    * seed VECTOR ids (unbounded); `cbOrd` is the codebook with its
    * per-subspace rank-by-cid `ord` column, so the mapping is part of
    * the persisted codebook and probe-side unpacking can never disagree
    * with the packer. Requires every subspace's codebook ≤ 256 entries.
    */
  private[similarity] def pqPack(codes: DataFrame, cbOrd: DataFrame): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    codes
      .join(broadcast(cbOrd.select(col("s"), col("cid"), col("ord"))),
        Seq("s", "cid"))
      .groupBy(col("vid"))
      .agg(expr("transform(array_sort(collect_list(struct(s, ord))), e -> e.ord)")
        .as("__o"))
      .select(col("vid"), call_function("graft_u8_bytes", col("__o")).as("code"))
  }

  /** The packed codebook's query-time LUT as ONE nested broadcast array
    * (`__lut[s + 1][ord + 1] = (pdot, pnorm2)`), shared by the single-
    * and multi-query packed serves.
    */
  private def packedLutRows(c1Ord: DataFrame, qsubs: DataFrame,
                            extraKey: Seq[String]): DataFrame = {
    val keyCols = extraKey.map(col)
    val m = "aggregate(transform(__flat, x -> x.s), 0, (a, x) -> greatest(a, x)) + 1"
    // ONE collect_list aggregation (the LUT is m × ksub ≤ a few KB), then
    // the nested [s][ord] shape is carved out locally — a grouped
    // pre-aggregation here would add a whole tiny shuffle stage per query
    c1Ord.join(broadcast(qsubs), Seq("s"))
      .select(keyCols ++ Seq(col("s"), col("ord"),
        round(expr("graft_dot(cv, qsv)"), 6)
          .as("pdot"),
        round(expr("graft_dot(cv, cv)"), 6).as("pnorm2")): _*)
      .groupBy(keyCols: _*)
      .agg(collect_list(struct(col("s"), col("ord"), col("pdot"), col("pnorm2")))
        .as("__flat"))
      .select(keyCols :+ expr(
        s"""transform(sequence(0, $m - 1), s ->
           |  transform(array_sort(filter(__flat, e -> e.s = s)),
           |    e -> struct(e.pdot, e.pnorm2)))""".stripMargin).as("__lut"): _*)
  }

  /** The packed ADC fold: sum a LUT field across the m unpacked entries
    * with the exact-decimal contract, HOF-shaped. A decimal accumulator
    * cannot ride a HOF (decimal addition widens its type per step), so
    * this uses the [[graft.expressions.Round12Long]] route the
    * covariance operator established: each round-6 addend becomes its
    * exact unscaled long, the long fold is exact, and the final double
    * division reproduces the decimal(38,12)-sum-then-cast value the
    * row-form groupBy (and the DuckDB oracle) computes.
    */
  private def packedFoldSql(field: String): String =
    s"""CAST(aggregate(transform(__e, x -> graft_round12_long(x.$field)),
       |  CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) / 1.0e12""".stripMargin

  /** [[pqServe]] over the PACKED codes layout — identical scoring algebra
    * (round-6 LUT entries, exact DECIMAL(38,12) across-subspace sums —
    * a HOF fold of exact decimals equals the row-form groupBy sum in any
    * order, so the same DuckDB oracle gates both layouts), but the ADC
    * pass is now a pure PROJECTION over the m-byte codes scan: unpack
    * the byte per subspace, index the one broadcast nested LUT, fold.
    * No join, no shuffle, no groupBy before the top-`rerank` cut — at
    * 100 TB the candidate stage reads m bytes per vector and nothing
    * else. Raw vectors join in only for the exact rerank, as before.
    */
  private[similarity] def pqServePacked(withVd: DataFrame, c1Ord: DataFrame,
                                        packed: DataFrame, queryId: Long,
                                        k: Int, rerank: Int, m: Int, sd: Int,
                                        idCol: String): DataFrame = {
    GraftFunctions.register(withVd.sparkSession)
    val qsubs = withVd.filter(col("vid") === queryId)
      .select(col("vid"), col("v"), explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("s"), slice(col("v"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val lutArr = packedLutRows(c1Ord, qsubs, extraKey = Nil)
    val qn = withVd.filter(col("vid") === queryId)
      .select(sqrt(expr("graft_dot(v, v)")).as("qnorm"),
        col("v").as("qv"))
    val cands = packed.crossJoin(broadcast(lutArr))
      .select(col("vid"), expr("transform(graft_bytes_u8(code), " +
        "(o, s) -> element_at(element_at(__lut, s + 1), o + 1))").as("__e"))
      .select(col("vid"),
        expr(packedFoldSql("pdot")).as("__adc"),
        expr(packedFoldSql("pnorm2")).as("__apx2"))
      .crossJoin(broadcast(qn.select(col("qnorm"))))
      .filter(col("vid") =!= queryId)
      .select(col("vid"),
        round(col("__adc") / (col("qnorm") * sqrt(col("__apx2"))), 6).as("adc_cosine"))
      .orderBy(col("adc_cosine").desc, col("vid").asc)
      .limit(rerank)
    cands.join(withVd, "vid")
      .crossJoin(broadcast(qn.select(col("qv"))))
      .select(col("vid").as(idCol), col("adc_cosine"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** [[pqTopKMulti]] over the packed layout — one broadcast of the
    * per-query nested LUTs, one codes-scan explode to (vector, query)
    * pairs, the same exact-decimal fold per pair. Returns (qid, vec_id).
    */
  private[similarity] def pqTopKMultiPacked(withVd: DataFrame, c1Ord: DataFrame,
                                            packed: DataFrame, maxQid: Long,
                                            k: Int, rerank: Int, m: Int,
                                            sd: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(withVd.sparkSession)
    val qsubs = withVd.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"), col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("qid"), col("s"),
        slice(col("v"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val luts = packedLutRows(c1Ord, qsubs, extraKey = Seq("qid"))
      .agg(collect_list(struct(col("qid"), col("__lut"))).as("__qs"))
    val qn = withVd.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"),
        sqrt(expr("graft_dot(v, v)")).as("qnorm"),
        col("v").as("qv"))
    val cands = packed.crossJoin(broadcast(luts))
      .select(col("vid"), col("code"), explode(col("__qs")).as("__q"))
      .select(col("vid"), col("__q.qid").as("qid"),
        expr("transform(graft_bytes_u8(code), " +
          "(o, s) -> element_at(element_at(__q.__lut, s + 1), o + 1))").as("__e"))
      .select(col("qid"), col("vid"),
        expr(packedFoldSql("pdot")).as("__adc"),
        expr(packedFoldSql("pnorm2")).as("__apx2"))
      .join(broadcast(qn.select(col("qid"), col("qnorm"))), "qid")
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        round(col("__adc") / (col("qnorm") * sqrt(col("__apx2"))), 6)
          .as("adc_cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("adc_cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("vid"))
    cands.join(withVd, "vid")
      .join(broadcast(qn.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("vid"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("vid").as("vec_id"))
  }

  /** Packed IVFADC serve over an explicit probe-cluster list: ONE
    * codes scan pruned to the probe clusters' partition directories
    * (`cluster IN (…)` — static PartitionFilters), ONE broadcast of a
    * cluster-keyed map of shifted-codebook LUTs, and the shuffle-free
    * ADC projection looks its cluster's LUT up per row — so the
    * candidate pass is one stage with one broadcast at ANY nprobe,
    * instead of the previous nprobe unioned scan branches each carrying
    * its own LUT broadcast (measured 2.0 s → sub-second at nprobe=4;
    * at 1000 executors, nprobe stages of scheduling latency collapse to
    * one). Bytes read are identical — the pruning literal set is the
    * same. One global top-`rerank` cut (ADC cosines are comparable
    * across clusters — each approximates the same raw cosine), exact
    * rerank. For nprobe = 1 this is algebraically [[pqServePacked]]
    * over the probe cluster's shifted codebook; each extra probe adds
    * one partition directory (~N/nCentroids of the corpus at
    * m bytes/vector) to the scan — the IVFADC recall/cost knob.
    */
  private[similarity] def ivfPqServePacked(withVd: DataFrame, cbOrd: DataFrame,
                                           cents: DataFrame, packed: DataFrame,
                                           probes: Seq[Long], queryId: Long,
                                           k: Int, rerank: Int, m: Int,
                                           sd: Int, idCol: String): DataFrame = {
    require(probes.nonEmpty, "ivfPqServePacked: empty probe list")
    GraftFunctions.register(withVd.sparkSession)
    val qsubs = withVd.filter(col("vid") === queryId)
      .select(col("vid"), col("v"), explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("s"), slice(col("v"), col("s") * sd + 1, lit(sd)).as("qsv"))
    val qn = withVd.filter(col("vid") === queryId)
      .select(sqrt(expr("graft_dot(v, v)")).as("qnorm"),
        col("v").as("qv"))
    // ALL probe clusters' shifted codebooks in one frame ([[shiftCodebook]]
    // generalized by a cluster key), one LUT aggregation keyed by cluster,
    // one cluster-keyed map — the whole broadcast subtree is a single
    // tiny pipeline regardless of nprobe (m × ksub entries per cluster,
    // broadcast-tiny even at ksub=256)
    val csl = cents.filter(col("cid").isin(probes: _*))
      .select(col("cid").cast("long").as("__c"),
        explode(sequence(lit(0), lit(m - 1))).as("__cs"), col("cv").as("__cv"))
      .select(col("__c"), col("__cs"),
        slice(col("__cv"), col("__cs") * sd + 1, lit(sd)).as("__csv"))
    val cshiftAll = cbOrd.join(broadcast(csl), cbOrd("s") === csl("__cs"))
      .withColumn("cv", expr("zip_with(__csv, cv, (x, y) -> x + y)"))
      .drop("__cs", "__csv")
    val lutMap = packedLutRows(cshiftAll, qsubs, extraKey = Seq("__c"))
      .agg(map_from_arrays(collect_list(col("__c")),
        collect_list(col("__lut"))).as("__luts"))
    val scores = packed.filter(col("cluster").isin(probes: _*))
      .select(col("vid"), col("code"), col("cluster"))
      .crossJoin(broadcast(lutMap))
      .select(col("vid"), expr(
        """transform(graft_bytes_u8(code), (o, s) ->
          |  element_at(element_at(
          |    element_at(__luts, CAST(cluster AS BIGINT)), s + 1), o + 1))"""
          .stripMargin).as("__e"))
      .select(col("vid"),
        expr(packedFoldSql("pdot")).as("__adc"),
        expr(packedFoldSql("pnorm2")).as("__apx2"))
    val cands = scores
      .crossJoin(broadcast(qn.select(col("qnorm"))))
      .filter(col("vid") =!= queryId)
      .select(col("vid"),
        round(col("__adc") / (col("qnorm") * sqrt(col("__apx2"))), 6).as("adc_cosine"))
      .orderBy(col("adc_cosine").desc, col("vid").asc)
      .limit(rerank)
    cands.join(withVd, "vid")
      .crossJoin(broadcast(qn.select(col("qv"))))
      .select(col("vid").as(idCol), col("adc_cosine"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** SQ8 ANN serve audit — the [[matryoshkaAudit]] question asked of
    * int8 scalar quantization (FAISS IndexScalarQuantizer / SQ8, the
    * default "4× smaller and almost as good" serving compression):
    * would the top-k change if the CANDIDATE pass scored against
    * dequantized int8 vectors (x̂ = round(x/s)·s, s = max|x|/127 — the
    * exact [[quantizeAudit]] algebra, whose oracle parity is already
    * gated) instead of fp32? Asymmetric distance, the standard SQ
    * deployment: corpus quantized, query kept exact. Candidates =
    * top-`rerank` by round-6 cosine(q, x̂); exact rerank on raw vectors
    * as always, so SQ8 can only lose candidates, never mis-rank kept
    * ones. Returns (idCol, approx_cosine, cosine).
    *
    * Scale story: in-plan dequantization measures the ACCURACY of the
    * decision; the byte savings land when the int8 codes + scale are
    * PERSISTED ([[PqStore]]'s packed-artifact template — the candidate
    * scan then reads d bytes + 8 per vector instead of 4d). The
    * `q_ann_recall_sq8` row is the measurement that says whether the
    * 4× cheaper scan costs recall on this corpus.
    */
  def sq8TopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, rerank: Int = 40): DataFrame = {
    require(rerank >= k, "sq8TopK: rerank must be >= k")
    GraftFunctions.register(embeddings.sparkSession)
    val dq = sq8Dequant(embeddings, idCol, vecCol)
    val qn = dq.filter(col("vid") === queryId)
      .select(col("v").as("qv"))
    val cands = dq.filter(col("vid") =!= queryId)
      .crossJoin(broadcast(qn))
      .select(col("vid"), col("v"),
        round(expr("graft_dot(__dq, qv)") /
          (sqrt(expr("graft_dot(__dq, __dq)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6)
          .as("approx_cosine"))
      .orderBy(col("approx_cosine").desc, col("vid").asc)
      .limit(rerank)
    cands.crossJoin(broadcast(qn))
      .select(col("vid").as(idCol), col("approx_cosine"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-query face of [[sq8TopK]] for the recall audit. Returns
    * (qid, vec_id).
    */
  def sq8TopKMultiQuery(embeddings: DataFrame, idCol: String, vecCol: String,
                        maxQid: Long, k: Int, rerank: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(embeddings.sparkSession)
    // the dequant projection feeds the query broadcast AND the scored scan
    // — cut it once (guide §1.2 step 1)
    val dq = sq8Dequant(embeddings, idCol, vecCol).cutLineage()
    val qs = dq.filter(col("vid") < maxQid)
      .select(col("vid").as("qid"), col("v").as("qv"))
    val cands = dq.crossJoin(broadcast(qs))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), col("v"),
        round(expr("graft_dot(__dq, qv)") /
          (sqrt(expr("graft_dot(__dq, __dq)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6)
          .as("approx_cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("approx_cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= rerank)
    cands.join(broadcast(qs), "qid")
      .select(col("qid"), col("vid"),
        round(expr("graft_dot(v, qv)") /
          (sqrt(expr("graft_dot(v, v)")) *
            sqrt(expr("graft_dot(qv, qv)"))), 6).as("cosine"))
      .withColumn("__rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cosine").desc, col("vid").asc)))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("vid").as("vec_id"))
  }

  /** (vid, v raw doubles, __dq dequantized-int8 doubles) — the
    * [[quantizeAudit]] algebra factored for the SQ8 serve twins; the
    * all-zero vector dequantizes to itself (scale-0 guard).
    */
  private def sq8Dequant(embeddings: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    // codegen graft_sq8dq = the scale/round/dequant chain as one primitive
    // loop — the Column formulation ran Spark round() (a BigDecimal alloc)
    // per ELEMENT per row; bit parity pinned by Sq8DequantArrSpec
    // (optimization guide §1.2 step 2, the Round12Long rationale)
    GraftFunctions.register(embeddings.sparkSession)
    val v = transform(col(vecCol), x => x.cast("double"))
    embeddings.select(col(idCol).cast("long").as("vid"), v.as("v"),
      call_function("graft_sq8dq", col(vecCol)).as("__dq"))
  }

  /** Symmetric int8 quantization audit — the serving-side compression
    * every large vector store applies (scale = max|x|/127, q = round(x/s),
    * dequant x̂ = q·s), reported as per-vector reconstruction error so a
    * pipeline can gate "quantize or keep fp32" per source/label.
    *
    * Pure projection over the embedding column — zero shuffles, rides the
    * scan at any corpus size. All arithmetic is double (elements cast
    * before any divide) and the outputs round(6), the suite's float-parity
    * contract with the DuckDB oracle. The all-zero vector quantizes to
    * itself: scale 0, zero error (guarded — x/0 would be NaN).
    */
  def quantizeAudit(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    val err = when(scale === 0.0, transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x => x - round(x / scale) * scale))
    embeddings.select(
      col(idCol),
      round(scale, 6).as("scale"),
      round(array_max(transform(err, e => abs(e))), 6).as("max_abs_err"),
      round(aggregate(err, lit(0.0), (a, e) => a + e * e) / size(col(vecCol)), 6)
        .as("mse"))
  }

  /** Pairwise cosine similarity between per-label centroid embeddings —
    * the embedding-space drift monitor (are two sources/classes collapsing
    * together? is a new batch drifting off its label's centroid?).
    *
    * Engine parity: float→DECIMAL(20,12) casts can never hit a round-half
    * boundary (a dyadic float equal to X + 5·10⁻¹³ would need a 5¹² factor
    * in its denominator), so the component sums are engine-exact; the mean
    * is left UNROUNDED (cast-to-double ÷ count, identical IEEE); centroid
    * products are round(12)→DECIMAL before the dot-product sum (their
    * rational structure has a ~n²·10¹² denominator — no systematic halves);
    * the final cosine rounds 6 after an irrational sqrt.
    *
    * Plan: one posexplode + one combinable groupBy(label, pos); norms and
    * the pos-aligned pair join both read the persisted centroid table
    * (labels × dims rows — trivially broadcastable); the raw vectors are
    * scanned exactly once regardless of the label count.
    */
  /** Exact covariance matrix of the embedding dimensions — the statistic
    * behind whitening / PCA preprocessing. Each row's d(d+1)/2
    * upper-triangle products are generated by one nested-`transform` HOF
    * and exploded; the cell groupBy is combinable, so the shuffle carries
    * only d(d+1)/2 cells per map partition regardless of N (the N·d²/2
    * multiply count is the exact-covariance lower bound — there is nothing
    * to push down past it). Means come from a second, d-row-tiny aggregate
    * broadcast back onto the cells. Float algebra is routed through the
    * round-12 exact-sum contract (the [[labelCentroidSimilarity]]
    * pattern), but in its FAST form: each product's 12-dp rounding is
    * emitted as the unscaled LONG by the codegen
    * [[graft.expressions.Round12Long]] (same half-up semantics as
    * Spark's Round, proven in its scaladoc) and the cell sums run over
    * compact decimal(38,0) integers — overflow-free at any corpus size,
    * and 3× cheaper than Round + decimal(38,12) on the sf0.1 bench
    * (4.7 → 1.5 s). Both engines sum identical integers in any order;
    * the sum → double → ÷10¹² chain is the identical two correctly-
    * rounded IEEE steps in both.
    */
  def covarianceMatrix(embeddings: DataFrame, vecCol: String,
                       dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    // Flat position-encoded product array: the exploded element is a bare
    // long, not a (i, j, pp) struct — 2080 primitive values per row
    // instead of 2080 row objects (2.5× on the sf0.1 bench). (i, j) is
    // recovered by joining the broadcast 2080-row decode map.
    val decode = (for { i <- 0 until dim; j <- i until dim }
      yield (i * dim - i * (i - 1) / 2 + (j - i), i, j))
      .toDF("pos", "di", "dj")
    // graft_tri12 = the same flat round12 product array as the previous
    // nested-transform formulation (identical element order and per-element
    // widen·multiply·round12 — TriProducts12Spec pins bit parity), computed
    // by one codegen primitive loop instead of d(d+1)/2 interpreted lambda
    // evaluations per row (optimization guide §1.2 step 2)
    val flat = embeddings.select(posexplode(
      call_function("graft_tri12", col(vecCol))).as(Seq("pos", "pp")))
    val cells = flat.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        (sum(col("pp").cast("decimal(38,0)")).cast("double") / lit(1.0e12))
          .as("sxy"))
      .join(broadcast(decode), "pos")
    val means = embeddings
      .select(posexplode(col(vecCol)).as(Seq("mi", "xf")))
      .groupBy(col("mi"))
      .agg((sum(col("xf").cast("double").cast("decimal(20,12)"))
        .cast("double") / count(lit(1)).cast("double")).as("mu"))
    cells
      .join(broadcast(means.select(col("mi").as("ia"), col("mu").as("mua"))),
        col("di") === col("ia"))
      .join(broadcast(means.select(col("mi").as("ib"), col("mu").as("mub"))),
        col("dj") === col("ib"))
      .select(col("di"), col("dj"), col("n"),
        // + 0.0 canonicalizes −0.0 (a negative cov rounding to zero) so
        // both engines serialize the identical zero
        (round(col("sxy") / col("n").cast("double") -
          col("mua") * col("mub"), 6) + lit(0.0)).as("cov"))
  }

  /** Deterministic signed-random-projection to `outDims` REAL-VALUED
    * coordinates (not the sign bits of [[srpSignature]]) — the classic
    * Johnson–Lindenstrauss dimensionality reduction with a ±1 projection
    * matrix derived from the engine-independent md5 family (same family as
    * [[graft.graph.Graphs.vertexSample]]), so any engine regenerates the
    * identical matrix. The matrix is resolved AT PLAN TIME into literal
    * sign arrays (512 ints for 8×64) — zero per-row hashing — and each
    * output coordinate is one `zip_with`+`aggregate` fold, so the whole
    * operator is a shuffle-free codegen projection.
    */
  def randomProjection(embeddings: DataFrame, idCol: String, vecCol: String,
                       outDims: Int = 8, dim: Int = 64): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(k: Int, i: Int): Int = {
      val hex = md.digest(s"$k:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
    // The fold runs on exact unscaled longs (the DECIMAL(20,12) value ×
    // 10¹²): a decimal-typed HOF fold is impossible (each decimal add
    // widens the type, which the aggregate lambda contract forbids), but
    // the unscaled integer IS the decimal, so the sum is bit-exact and the
    // only float ops are the oracle-shared cast-in and the final /10¹².
    val scaleF = lit(1000000000000L)
    val projs = (0 until outDims).map { k =>
      val signs = array((0 until dim).map(i => lit(sign(k, i))): _*)
      val terms = zip_with(col(vecCol), signs,
        (x, s) => ((x.cast("double") * s.cast("double"))
          .cast("decimal(20,12)") * scaleF).cast("long"))
      struct(lit(k).as("k"),
        (round(aggregate(terms, lit(0L), (acc, v) => acc + v)
          .cast("double") / scaleF.cast("double"), 6) + lit(0.0)).as("proj"))
    }
    embeddings.select(col(idCol), explode(array(projs: _*)).as("p"))
      .select(col(idCol), col("p.k"), col("p.proj"))
  }

  def labelCentroidSimilarity(embeddings: DataFrame, labelCol: String,
                              vecCol: String): DataFrame = {
    val comp = embeddings.select(col(labelCol).as("lbl"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
    val cent = comp.groupBy(col("lbl"), col("pos"))
      .agg((sum(col("x").cast("decimal(20,12)")).cast("double") /
        count(lit(1)).cast("double")).as("mu"))
      .persistBounded()
    val norms = cent.groupBy(col("lbl"))
      .agg(sqrt(sum(round(col("mu") * col("mu"), 12).cast("decimal(38,12)"))
        .cast("double")).as("nrm"))
    val dots = cent.as("a")
      .join(cent.as("b"),
        col("a.pos") === col("b.pos") && col("a.lbl") < col("b.lbl"))
      .select(col("a.lbl").as("label_a"), col("b.lbl").as("label_b"),
        round(col("a.mu") * col("b.mu"), 12).cast("decimal(38,12)").as("__pp"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("__pp")).cast("double").as("__dot"))
    dots.join(norms.as("na"), col("label_a") === col("na.lbl"))
      .join(norms.as("nb"), col("label_b") === col("nb.lbl"))
      .select(col("label_a"), col("label_b"),
        round(col("__dot") / (col("na.nrm") * col("nb.nrm")), 6).as("cosine"))
  }
}
