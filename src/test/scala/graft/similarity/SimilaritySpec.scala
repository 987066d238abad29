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

  // deterministic 64-dim fixtures for the SRP sketch (planes are fixed for
  // SrpDims=64): a base direction, its copy, its negation, and a vector
  // orthogonal to it (disjoint support)
  private lazy val srpVecs = {
    val base = Array.tabulate(64)(i =>
      if (i < 32) math.sin(i + 1).toFloat else 0.0f)
    val ortho = Array.tabulate(64)(i =>
      if (i >= 32) math.cos(i + 1).toFloat else 0.0f)
    Seq(
      (0L, base),
      (1L, base.clone()),          // identical: Hamming 0
      (2L, base.map(-_)),          // antipodal: every plane sign flips
      (3L, ortho)                  // orthogonal: Hamming ≈ SrpBits/2
    ).toDF("vec_id", "embedding")
  }

  test("mmrSelect: pick 0 is the top-relevance candidate; a near-duplicate " +
      "of it is skipped for a diverse lower-relevance pick at λ=0.5") {
    // query 0; candidates: 1 ≈ 2 (a near-dup pair, most relevant but
    // distinct from the query — a pick equal to the query would collapse
    // every marginal to ~0), 3 diverse at moderate relevance, 4
    // orthogonal to everything selected. Pure relevance top-2 = {1, 2};
    // MMR(λ=0.5) must take 1 then 3 (2's marginal ≈ 0.5·0.99 − 0.5·1.0
    // < 3's 0.5·0.71 − 0.5·0.64)
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.11f, 0.0f, 0.0f)),
      (3L, Array(0.7f, 0.0f, 0.7f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val picks = Similarity.mmrSelect(df, "vec_id", "embedding", queryId = 0L,
      k = 3, poolSize = 4, lambda = 0.5)
      .orderBy(col("pick_order")).collect().map(_.getLong(1)).toSeq
    val rel = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(rel == Seq(1L, 2L), s"fixture broke: relevance top-2 was $rel")
    assert(picks == Seq(1L, 3L, 4L),
      s"λ=0.5 must skip the near-dup 2 for diverse 3 then orthogonal 4: $picks")
    // λ = 1 is pure relevance: the near-dup comes right back
    val pure = Similarity.mmrSelect(df, "vec_id", "embedding", 0L,
      k = 2, poolSize = 4, lambda = 1.0)
      .orderBy(col("pick_order")).collect().map(_.getLong(1)).toSeq
    assert(pure == Seq(1L, 2L), s"λ=1 must reduce to relevance order: $pure")
  }

  test("srpTopKFiltered: every result satisfies the predicate, ranking " +
      "matches the unfiltered scan restricted to the stratum") {
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val df = (0L until 12L).map { i =>
      val v = Array.tabulate(64)(j =>
        (math.sin(j + 1) + 0.03 * math.sin(i * 17 + j)).toFloat)
      (i, v, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val qLabel = 0
    val got = Similarity.srpTopKFiltered(df, "vec_id", "embedding",
      queryId = 0L, k = 3, pred = col("label") === lit(qLabel),
      radius = Similarity.SrpBits)
      .collect().map(_.getLong(0)).toSeq
    // radius = SrpBits admits every candidate, so the filtered result is
    // exactly the brute-force ranking over the label-0 stratum
    val want = Similarity.bruteForceTopK(
      df.filter(col("label") === qLabel
        || col("vec_id") === 0L), "vec_id", "embedding", 0L, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want, s"filtered ranking $got != stratum brute force $want")
    assert(got.forall(_ % 3 == 0), s"a non-label-0 id leaked: $got")
  }

  test("srp sketch Hamming estimates angle: 0 for identical, SrpBits for antipodal, ~half for orthogonal") {
    val sigs = Similarity.srpSignature(srpVecs, "embedding")
    val ham = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.vec_id") === 0L)
      .select(col("b.vec_id"),
        (0 until 4).map(w =>
          expr(s"bit_count(a.__w$w ^ b.__w$w)")).reduce(_ + _).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ham(1L) == 0)
    assert(ham(2L) == Similarity.SrpBits)
    // E[H] = 128·(π/2)/π = 64 for orthogonal vectors; allow ±4σ (σ≈5.7)
    assert(ham(3L) > 40 && ham(3L) < 88, s"orthogonal Hamming was ${ham(3L)}")
  }

  test("srpTopK: radius 0 finds the identical vector only; full radius = brute force") {
    val exactOnly = Similarity.srpTopK(srpVecs, "vec_id", "embedding", 0L, 10,
      radius = 0).collect().map(_.getLong(0)).toSet
    assert(exactOnly == Set(1L))
    val all = Similarity.srpTopK(srpVecs, "vec_id", "embedding", 0L, 10,
      radius = Similarity.SrpBits).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(srpVecs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(all == brute)
  }

  test("srpTopK: wider radius candidates are a superset (monotone recall knob)") {
    val narrow = Similarity.srpTopK(srpVecs, "vec_id", "embedding", 0L, 10,
      radius = Similarity.SrpRadius).collect().map(_.getLong(0)).toSet
    val wide = Similarity.srpTopK(srpVecs, "vec_id", "embedding", 0L, 10,
      radius = Similarity.SrpRadiusWide).collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(wide))
  }

  test("srp-banded near-dup pairs: precision exact, identical vectors always found") {
    val exact = Similarity.cosineNearDupPairs(srpVecs, "vec_id", "embedding", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val banded = Similarity.cosineNearDupPairsSrp(srpVecs, "vec_id", "embedding", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every banded pair is a true pair with the identical exact cosine
    assert(banded.subsetOf(exact))
    // identical vectors share all 24 bands — always a candidate
    assert(banded.contains((0L, 1L, 1.0)))
    // antipodal vectors share 0 bands — never a candidate
    assert(!banded.exists(p => p._1 == 0L && p._2 == 2L))
  }

  test("srp-banded near-dup recall floor >= 0.8 on the 14-pair fixture (round-9 verdict gate)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.cosineNearDupPairsSrp(emb, "vec_id", "embedding", 0.45)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture lost its near-dup pairs")
    val recall = banded.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.8, s"banded recall $recall < 0.8 (${banded.size}/${exact.size})")
    // and precision is exact-verify: banded ⊆ exact
    assert(banded.subsetOf(exact))
  }

  test("cluster-bounded near-dup recall floor >= 0.8 on the 14-pair fixture " +
      "(the linear scale path; measured 13/14 at probes=2)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = Similarity
      .cosineNearDupPairsClustered(emb, "vec_id", "embedding", 0.45)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture lost its near-dup pairs")
    val recall = clustered.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.8,
      s"clustered recall $recall < 0.8 (${clustered.size}/${exact.size})")
    assert(clustered.subsetOf(exact))
  }

  test("sharded centroid assign: bit-identical to broadcast, no broadcast " +
      "of the centroid table in the plan, recall floor holds") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // transport-blind results: forced 3-way sharding must reproduce the
    // broadcast path's pairs EXACTLY (same cosines, same tie-breaks)
    def pairs(shards: Option[Int]) = Similarity
      .cosineNearDupPairsClustered(emb, "vec_id", "embedding", 0.45,
        centroidShards = shards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBroadcast = pairs(Some(1))
    val viaShards = pairs(Some(3))
    assert(viaBroadcast.nonEmpty)
    assert(viaShards == viaBroadcast)
    // recall floor transfers (same pairs ⇒ same recall), pinned anyway
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = viaShards.count(p => exact.contains((p._1, p._2)))
      .toDouble / exact.size
    assert(recall >= 0.8, s"sharded recall $recall < 0.8")
    // the 100-TB contract: in sharded mode the assign's physical plan
    // carries NO broadcast exchange — centroids travel by shuffle only
    import org.apache.spark.sql.functions.{col, expr}
    val withVd = emb.select(col("vec_id"), col("embedding"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("__vd"))
    val cents = withVd.orderBy(col("vec_id").asc).limit(50)
      .select(col("vec_id").cast("long").as("cid"), col("__vd").as("cv"))
    val sharded = Similarity.assignTopPRows(withVd, cents, 2, "vec_id",
      centroidShards = 3)
    sharded.head() // force execution so AQE finalizes the plan
    val plan = sharded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"sharded assign plan still broadcasts:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"sharded assign plan lost its shuffle join:\n$plan")
    val bplan = Similarity.assignTopPRows(withVd, cents, 2, "vec_id")
      .queryExecution.executedPlan.toString
    assert(bplan.contains("BroadcastExchange")) // and broadcast mode does
    // auto-selection: tiny corpus fits the threshold → 1 shard; a huge
    // hypothetical k forces the ceiling division up
    assert(Similarity.autoCentroidShards(emb, "embedding", 50L) == 1)
    assert(Similarity.autoCentroidShards(emb, "embedding",
      50L * 1000 * 1000) > 1)
  }

  test("ivfAssign sharded transport: clusters and sims identical to the " +
      "broadcast float-scored projection") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def asg(shards: Option[Int]) = Similarity
      .ivfAssign(emb, "vec_id", "embedding", nCentroids = 8,
        centroidShards = shards)
      .select("vec_id", "cluster", "centroid_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = asg(Some(1))
    val b = asg(Some(4))
    assert(a.nonEmpty && b == a,
      "sharded ivfAssign diverged from the broadcast projection")
  }

  test("kmeans/semDedup sharded transport: assignments and kept sets " +
      "identical to the broadcast argmax projection") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def km(shards: Option[Int]) = Similarity
      .kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 2,
        centroidShards = shards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaProjection = km(Some(1)) // array_max broadcast projection
    val viaShards = km(Some(2))     // windowed row join, shuffle transport
    assert(viaProjection.nonEmpty)
    assert(viaShards == viaProjection,
      "sharded kmeans assign diverged from the broadcast projection")
    def sd(shards: Option[Int]) = Similarity
      .semDedup(emb, "vec_id", "embedding", k = 8, iters = 2,
        threshold = 0.45, centroidShards = shards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(sd(Some(2)) == sd(Some(1)))
  }

  test("cluster-bounded near-dup: single-probe candidates are a subset of " +
      "2-probe (monotone recall knob); output pairs are distinct") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val p1 = Similarity.cosineNearDupPairsClustered(emb, "vec_id", "embedding",
      0.45, probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p2 = Similarity.cosineNearDupPairsClustered(emb, "vec_id", "embedding",
      0.45, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(p1.toSet.subsetOf(p2.toSet))
    // a pair sharing BOTH probed clusters must still appear exactly once
    assert(p2.distinct.size == p2.size)
  }

  test("ivf nprobe: probing more clusters is a candidate superset; full probe = brute force") {
    // centroids = vecs 0..2; vec 3 orthogonal, vec 4 between 0 and 1
    val pts = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f)),
      (4L, Array(0.8f, 0.6f, 0.0f))
    ).toDF("vec_id", "embedding")
    def ids(nprobe: Int) =
      Similarity.ivfTopK(pts, "vec_id", "embedding", queryId = 0L, k = 5,
        nCentroids = 3, nprobe = nprobe).collect().map(_.getLong(0)).toSet
    val single = ids(1)
    val double = ids(2)
    assert(single.subsetOf(double))
    // vec 3 assigns to centroid 1 (cos .8 vs .6) — invisible at nprobe=1
    // from query 0's cluster, found once cluster 1 is probed
    assert(!single.contains(3L) && double.contains(3L))
    val full = Similarity.ivfTopK(pts, "vec_id", "embedding", 0L, 5,
      nCentroids = 3, nprobe = 3).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(pts, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute)
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

  test("semDedup drops higher-id near-dups within clusters, keeps across") {
    // two direction clusters; 2 duplicates 0 (same cluster, cosine ~1),
    // 5 duplicates 1; 3 and 4 are distinct enough to survive
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.001f)), (3L, Array(0.8f, 0.6f)),
      (1L, Array(0.0f, 1.0f)), (5L, Array(0.001f, 1.0f)), (4L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(pts, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 6)
    assert(out(0L) && out(1L), "lowest id of each near-dup pair survives")
    assert(!out(2L) && !out(5L), "higher-id near-dups are dropped")
    assert(out(3L) && out(4L), "sub-threshold cluster-mates survive")
  }

  test("semDedupAuto derives k = ceil(N / targetClusterSize) and matches pinned-k") {
    // the rule itself, including boundaries
    assert(Similarity.autoK(6, 3) == 2)
    assert(Similarity.autoK(7, 3) == 3)
    assert(Similarity.autoK(1, 100) == 1)
    assert(Similarity.autoK(0, 10) == 1, "empty corpus still gets one cluster")
    // end-to-end: 6 vectors / target 3 -> k=2, identical to semDedup(k=2)
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.001f)), (3L, Array(0.8f, 0.6f)),
      (1L, Array(0.0f, 1.0f)), (5L, Array(0.001f, 1.0f)), (4L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val auto = Similarity.semDedupAuto(pts, "vec_id", "embedding",
      targetClusterSize = 3L, iters = 2, threshold = 0.999)
    val pinned = Similarity.semDedup(pts, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.999)
    assert(auto.collect().toSet == pinned.collect().toSet)
  }

  test("IvfStore: served top-k equals ad-hoc ivfTopK and prunes to the probe partition") {
    val sfDir = "/root/testdata/sf0.001"
    val served = IvfStore.topK(spark, sfDir, queryId = 0L, k = 5)
    val plan = served.queryExecution.executedPlan.toString
    // the probe cluster must reach the scan as a PARTITION filter, not a
    // post-scan predicate — that is the store's whole point
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"probe cluster not partition-pruned:\n$plan")
    val adhoc = Similarity.ivfTopK(
        graft.util.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        queryId = 0L, k = 5, nCentroids = IvfStore.DefaultNumCentroids)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val got = served.collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == adhoc && got.nonEmpty)
  }

  test("PqStore: served top-k equals ad-hoc pqTopK, scores bit-equal") {
    val sfDir = "/root/testdata/sf0.001"
    val adhoc = Similarity.pqTopK(
        graft.util.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        queryId = 0L, k = 5, m = PqStore.DefaultM, ksub = PqStore.DefaultKsub, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val served = PqStore.topK(spark, sfDir, queryId = 0L, k = 5, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(served == adhoc && served.nonEmpty)
  }

  test("kCenterSelect walks farthest-first with deterministic ties") {
    // seed 0 at (1,0); 3 is antipodal (picked 2nd); 2 is orthogonal to
    // both (picked 3rd); 1 and 4 hug the seed and never get picked
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)), (4L, Array(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val picks = Similarity.kCenterSelect(pts, "vec_id", "embedding",
        seedId = 0L, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(picks == Seq(0L -> 0L, 1L -> 3L, 2L -> 2L))
  }

  test("hardNegatives ranks cross-label neighbours, skips same-label") {
    val pts = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.8f, 0.2f), 1), (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(pts, "vec_id", "embedding", "label",
        nQueries = 1, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // same-label vec 1 (the closest!) is excluded; order is cosine desc
    assert(out == Seq((0L, 2L), (0L, 3L)))
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

  test("pqTopKMultiQuery: recall floor on the clustered fixture — the " +
      "build-failing guard behind the q_ann_recall_pq row (round-7 lesson: " +
      "unmeasured ANN accuracy can hide recall 0.0)") {
    def v(base: Float, d: Int) = Array.tabulate(8)(i => base + 0.01f * i + 0.001f * d)
    val emb = (
      (0L to 4L).map(i => (i, v(1.0f, i.toInt))) ++
      (5L to 9L).map(i => (i, v(-1.0f, i.toInt))) ++
      (10L to 14L).map(i => (i, v(0.3f, i.toInt)))
    ).toDF("vec_id", "embedding")
    val cand = Similarity.pqTopKMultiQuery(emb, "vec_id", "embedding",
      maxQid = 5, k = 4, m = 2, ksub = 3, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly k rows per query — the serve contract
    cand.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == 4, s"query $q returned ${rows.length} rows") }
    val truth = (0L until 5L).flatMap(q =>
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k = 4)
        .collect().map(r => (q, r.getLong(0)))).toSet
    val recall = truth.count(cand.toSet.contains).toDouble / truth.size
    assert(recall >= 0.75, s"pq multi-query recall $recall < 0.75")
  }

  test("pqTopK: re-ranked results carry exact cosines and recover the true top-k") {
    // 3 tight clusters in 8-dim space; query vec 0 sits in cluster A, so
    // its true neighbors are the other A members
    def v(base: Float, d: Int) = Array.tabulate(8)(i => base + 0.01f * i + 0.001f * d)
    val emb = (
      (0L to 4L).map(i => (i, v(1.0f, i.toInt))) ++      // cluster A
      (5L to 9L).map(i => (i, v(-1.0f, i.toInt))) ++     // cluster B
      (10L to 14L).map(i => (i, v(0.3f, i.toInt)))       // cluster C
    ).toDF("vec_id", "embedding")
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 4, m = 2, ksub = 3, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the exact re-rank stage must reproduce brute-force cosines exactly
    pq.foreach { case (id, _, cos) =>
      exact.get(id).foreach(e => assert(e == cos, s"vec $id: $cos != $e")) }
    // and with rerank covering half the corpus, recall@4 is complete
    assert(pq.map(_._1).toSet == exact.keySet)
    // ADC approximation stays in cosine range
    pq.foreach { case (_, adc, _) => assert(adc >= -1.000001 && adc <= 1.000001) }
  }

  test("quantizeAudit: error bounded by scale/2, zero vector exact") {
    val emb = Seq(
      (1L, Array(1.27f, -0.635f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // all-zero: scale 0 guard
      (3L, Array(127.0f, -127.0f, 63.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeAudit(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // scale = max|x|/127: vec1 → 0.01, vec3 → 1.0
    assert(out(1L)._1 == 0.01)
    assert(out(2L) == ((0.0, 0.0, 0.0)))
    assert(out(3L)._1 == 1.0)
    // int8 round-off is at most half a quantization step
    out.values.foreach { case (scale, maxErr, mse) =>
      assert(maxErr <= scale / 2 + 1e-9 && mse <= maxErr * maxErr + 1e-9)
    }
    // 127.0 with scale 1.0 reconstructs exactly
    assert(out(3L)._2 <= 0.5)
  }

  test("topicBalance caps dominant clusters, passes small ones whole") {
    import spark.implicits._
    // two well-separated directions: ids 1..30 near e1 (dominant topic),
    // ids 31..35 near e2 (minority topic)
    val vecs = ((1 to 30).map(i =>
        (i.toLong, Array(10.0f + (i % 7), 1.0f * (i % 3), 0.0f))) ++
      (31 to 35).map(i =>
        (i.toLong, Array(0.0f, 1.0f * (i % 2), 10.0f + (i % 4))))
    ).toDF("vec_id", "embedding")
    val out = Similarity.topicBalance(vecs, "vec_id", "embedding",
      k = 2, iters = 2, perClusterCap = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.forall(_.size <= 8))
    // the minority topic survives intact
    val minority = out.filter(_._1 > 30L).map(_._1).toSet
    assert(minority == Set(31L, 32L, 33L, 34L, 35L))
    // deterministic: a repartitioned run selects the identical subset
    val again = Similarity.topicBalance(vecs.repartition(7), "vec_id",
      "embedding", k = 2, iters = 2, perClusterCap = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(again == out.toSet)
  }

  test("covarianceMatrix: hand-computed 2-dim covariance, upper triangle " +
    "only") {
    // x = (1,2,3), y = (2,4,0): E[x²]−µx² = 2/3; cov(x,y) = 2·8/3−2·2·... :
    // exact values: var(x)=2/3, var(y)=8/3, cov(x,y)=−2/3.
    val df = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(2.0f, 4.0f)),
      (2L, Array(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.covarianceMatrix(df, "embedding", dim = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set((0, 0), (0, 1), (1, 1)))
    assert(out((0, 0)) == ((3L, 0.666667)))
    assert(out((0, 1)) == ((3L, -0.666667)))
    assert(out((1, 1)) == ((3L, 2.666667)))
  }

  test("randomProjection: deterministic, repartition-invariant, and " +
    "linear in the input") {
    val base = (0L until 20L).map(i =>
      (i, Array.tabulate(64)(j => ((i * 31 + j) % 7 - 3).toFloat / 4f)))
    val df = base.toDF("vec_id", "embedding")
    val a = Similarity.randomProjection(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a.size == 20 * 8)
    val b = Similarity.randomProjection(df.repartition(5), "vec_id",
      "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a == b)
    // linearity: projecting 2x doubles every coordinate (±1 matrix)
    val doubled = base.map { case (i, v) => (i, v.map(_ * 2f)) }
      .toDF("vec_id", "embedding")
    val c = Similarity.randomProjection(doubled, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for ((k, v) <- a)
      assert(math.abs(c(k) - 2 * v) < 1e-9, s"$k: ${c(k)} vs ${2 * v}")
  }

  test("randomProjection: the plan is a shuffle-free projection") {
    val df = (0L until 4L).map(i => (i, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val plan = Similarity.randomProjection(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("matryoshkaAudit: prefix ranking diverges from full, flags catch it") {
    import spark.implicits._
    // query [1,0,0,0], prefix = first 2 dims:
    //  v1 agrees everywhere; v2 looks perfect in the prefix but its tail
    //  kills the full-dim cosine; v3 is mediocre in the prefix but beats
    //  v2 at full dims → full top-2 = {v1, v3}, prefix top-2 = {v1, v2}
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 10.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 3.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaAudit(emb, "vec_id", "embedding",
      queryId = 0L, k = 2, prefixDims = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.toSet == Set((1L, 1.0, true), (2L, 1.0, false)))
  }
}
