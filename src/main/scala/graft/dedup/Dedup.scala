package graft.dedup

import graft.util.CacheLedger.CacheOps
import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for a large-scale training-data pipeline: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Everything is hash-based DataFrame algebra with *engine-independent* hash
  * functions (md5 of explicit strings), so results are reproducible across
  * runs, partitionings, and engines (the DuckDB oracle computes the same
  * signatures).
  *
  * Scale notes (100 TB):
  *  - exact dedup is one groupBy(signature) shuffle with map-side combine;
  *  - the all-pairs shingle join in [[jaccardPairs]] is quadratic in docs
  *    sharing a shingle — it exists as the small-scale oracle/baseline; the
  *    scale path is [[minHashLsh]], whose candidate generation shuffles only
  *    (band, signature) keys, i.e. O(docs × bands), and whose verify step
  *    touches only candidate pairs;
  *  - at extreme skew (a shingle in millions of docs) drop top-frequency
  *    shingles first (stopword-shingle filter) — standard MinHash practice;
  *    wired as the `maxShingleDf` parameter on [[jaccardPairs]] and
  *    [[minHashLsh]] (candidate generation only; verification stays exact).
  */
object Dedup {

  // pointer jumps per checkpointed round in [[clusters]]: 2 measured best
  // at bench scale (1/2/3 jumps -> 8.3/7.3/8.0 s) — each extra jump
  // quarters the round count but doubles the per-round plan, and the round
  // count is what a real cluster pays in synchronization barriers. Env
  // knob kept for experiments.
  private[dedup] val jumpsPerRound: Int =
    sys.env.get("GRAFT_CC_JUMPS").flatMap(_.toIntOption).filter(_ >= 1).getOrElse(2)

  /** Exact duplicate groups keyed by an order-invariant content signature.
    * Returns one row per distinct signature with the kept (minimum) id and
    * the group size — the keep-latest/keep-first policy of the reference's
    * dedup (`Spark/Tweets_preprocessing.py:156-157`) generalized to
    * content-hash keys.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("signature"))
      .groupBy(col("signature"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).cast("long").as("n_docs"))

  /** INCREMENTAL exact dedup — the ingestion-time path (the
    * [[graft.search.BM25Index.incremental]] sibling): survivors of a new
    * batch against an existing signature store. A batch signature that
    * already exists in the store is dropped entirely; within the batch the
    * usual min-id representative wins. One combinable groupBy(signature)
    * over the BATCH ONLY plus one anti-join against the store's signature
    * column — the store (at 100 TB: billions of rows, but one narrow
    * column, bucketed by signature on disk) is probed, never rescanned or
    * regrouped per batch. Union the survivors' signatures back into the
    * store to advance it.
    */
  def exactIncremental(store: DataFrame, batch: DataFrame,
                       idCol: String, textCol: String): DataFrame =
    exact(batch, idCol, textCol)
      .join(store.select(col("signature")), Seq("signature"), "left_anti")

  /** Per-group duplication observability — the dashboard number a curation
    * pipeline watches per source/shard: docs, distinct signatures, and the
    * duplicate rate. One combinable groupBy; null-text docs count toward
    * n_docs but carry no signature (md5(null) is null, count distinct
    * ignores it), so dup_rate measures only signed content.
    */
  def dupRateByGroup(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(md5(col(textCol))).cast("long").as("n_unique"),
        count(col(textCol)).cast("long").as("n_signed"))
      .select(col(groupCol), col("n_docs"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast("double") /
          col("n_signed"), 6).as("dup_rate"))

  /** [[exactIncremental]] with a Bloom-filter pre-prune — the shape the
    * store-probe takes when the store is billions of signatures and the
    * batch is mostly NEW content: a bloom built once over the store (and
    * maintained alongside it; here rebuilt per call for self-containment)
    * answers "definitely not in store" for the typical batch row, so the
    * store-side anti-join shuffles only the bloom-positive sliver (true
    * dups + the false-positive rate) instead of the whole batch.
    *
    * The result is EXACTLY [[exactIncremental]]'s: bloom negatives are
    * guaranteed-new (no false negatives), positives are re-checked by the
    * exact anti-join, so false positives cost a probe, never an answer.
    *
    * Spark-native end to end: `bloom_filter_agg` builds the filter as an
    * aggregate (one scan, one 1-row result), and the probe is Spark's own
    * `BloomFilterMightContain` codegen expression (registered by
    * [[graft.expressions.GraftFunctions]]) over a foldable binary literal
    * — the same machinery InjectRuntimeFilter uses for runtime join
    * filters, driven explicitly.
    */
  def exactIncrementalBloom(store: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String,
                            expectedItems: Long = 1L << 20,
                            numBits: Long = 1L << 23): DataFrame = {
    graft.expressions.GraftFunctions.register(batch.sparkSession)
    val bloom = store
      .agg(expr(s"graft_bloom_agg(xxhash64(signature), " +
        s"CAST($expectedItems AS BIGINT), CAST($numBits AS BIGINT))"))
      .head().getAs[Array[Byte]](0)
    val batchSigs = exact(batch, idCol, textCol)
    if (bloom == null) batchSigs // empty store: everything survives
    else {
      val maybe = call_function("graft_bloom_contains",
        lit(bloom), xxhash64(col("signature")))
      val marked = batchSigs.withColumn("__maybe", maybe)
      marked.filter(!col("__maybe"))
        .unionByName(marked.filter(col("__maybe"))
          .join(store.select(col("signature")), Seq("signature"), "left_anti"))
        .drop("__maybe")
    }
  }

  /** Distinct word n-gram shingles per document: (doc, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ")
    // project the token array ONCE, then filter/explode over the
    // materialized column: the previous shape re-ran split() in the filter
    // and again in the explode bound (no CSE across operator boundaries —
    // the TextAnalysis.cdcChunks note; optimization guide §1.2 step 2)
    docs
      .select(col(idCol).as("doc"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - lit(n))).as("i"))
      .select(col("doc"), concat_ws(" ", slice(col("toks"), col("i") + 1, lit(n))).as("shingle"))
      .distinct()
  }

  private def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc")).agg(count(lit(1)).cast("long").as("n_sh"))

  /** Shingles restricted to those appearing in ≤ `cut` docs — the standard
    * frequent-shingle (stop-shingle) guardrail: a boilerplate shingle shared
    * by millions of docs makes the candidate self-join quadratic in that
    * shingle's df. Used for CANDIDATE GENERATION only; verification always
    * runs on the full shingle sets, so reported Jaccard values stay exact —
    * the cutoff can only lose candidate pairs whose every common shingle is
    * hot (which at high thresholds are boilerplate near-dups, the pairs the
    * cutoff exists to not drown in).
    */
  private[dedup] def capShingleDf(sh: DataFrame, cut: Long): DataFrame = {
    val hot = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).cast("long").as("__df"))
      .filter(col("__df") > cut)
      .select(col("shingle"))
    sh.join(hot, Seq("shingle"), "left_anti")
  }

  /** Verified Jaccard similarity for the given candidate pairs (doc_a, doc_b),
    * computed from the shingle sets. One join per side + one groupBy(pair).
    */
  private def verifyJaccard(sh: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val sz = shingleSizes(sh)
    val inter = pairs
      .join(sh.select(col("doc").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("long").as("inter"))
    inter
      .join(sz.select(col("doc").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sz.select(col("doc").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jacc",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jacc"))
  }

  /** All near-duplicate pairs by exact n-gram Jaccard ≥ threshold.
    * Baseline/oracle path — all-pairs via the shingle join (see scale notes).
    *
    * Plan shape: the shingle set is persisted (it feeds the pair join twice
    * plus the size aggregation — without the cache Spark recomputes the
    * tokenize+explode DAG per use), and intersection counts come straight
    * off the self-join — no separate candidate-distinct pass. The cache is
    * MEMORY_AND_DISK and evictable (LRU), so repeated calls are bounded by
    * executor storage, not leaked; callers running many dedup jobs in one
    * session can `spark.catalog.clearCache()` between them.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleDf: Option[Long] = None): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n).persistBounded()
    maxShingleDf match {
      case None =>
        val sz = shingleSizes(sh)
        val inter = sh.select(col("doc").as("doc_a"), col("shingle"))
          .join(sh.select(col("doc").as("doc_b"), col("shingle")), "shingle")
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).cast("long").as("inter"))
        inter
          .join(sz.select(col("doc").as("doc_a"), col("n_sh").as("na")), "doc_a")
          .join(sz.select(col("doc").as("doc_b"), col("n_sh").as("nb")), "doc_b")
          .withColumn("jacc",
            round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")).cast("double"), 6))
          .filter(col("jacc") >= threshold)
          .select(col("doc_a"), col("doc_b"), col("jacc"))
      case Some(cut) =>
        // candidates from the capped shingles, verification on the full
        // sets — see [[capShingleDf]].
        val capped = capShingleDf(sh, cut)
        val pairs = capped.select(col("doc").as("doc_a"), col("shingle"))
          .join(capped.select(col("doc").as("doc_b"), col("shingle")), "shingle")
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"))
          .distinct()
        verifyJaccard(sh, pairs, threshold)
    }
  }

  /** Modulus of the MinHash LCG family (2^31 − 1, prime). */
  val MinHashP: Long = 2147483647L

  /** MinHash signatures: minhash_i(doc) = min over shingles of
    * h_i(shingle), with an engine-independent two-stage hash family:
    * ONE md5 per shingle → 60-bit integer (first 15 hex digits) → per-i
    * linear-congruential mix  h_i(x) = ((2i+1)·(x mod p) + 12345·i) mod p.
    * Each odd multiplier induces an independent pseudo-random order, so the
    * min is a valid permutation surrogate; the integer stage costs ~nothing
    * versus the one-md5-per-(shingle, i) formulation (numHashes× fewer
    * digest calls — the GC hotspot at scale).
    *
    * Plan shape: all `numHashes` minhashes are computed as parallel MIN
    * aggregates in ONE groupBy(doc) over the shingle rows (wide form), then
    * unpivoted — the naive explode-by-hash-index formulation multiplies the
    * shuffle volume by numHashes for no benefit.
    *
    * Returns (doc, i, mh) with i in [0, numHashes).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val wide = minHashWide(sh, numHashes)
    val stackArgs = (0 until numHashes).map(i => s"$i, mh_$i").mkString(", ")
    wide.select(col("doc"),
      expr(s"stack($numHashes, $stackArgs) AS (i, mh)"))
  }

  /** Wide form: one row per doc, columns mh_0..mh_{H-1} (long-typed). */
  private def minHashWide(sh: DataFrame, numHashes: Int): DataFrame = {
    val withH = sh.withColumn("__hm",
      expr(s"CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT) % $MinHashP"))
    val aggs = (0 until numHashes).map { i =>
      min(expr(s"((${2 * i + 1} * __hm + ${12345L * i}) % $MinHashP)")).as(s"mh_$i")
    }
    withH.groupBy(col("doc")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: band the signature vector, bucket-join on
    * (band, band-signature), then verify candidates with true Jaccard.
    *
    * With rowsPerBand=2 and 6 bands, P(candidate | j=0.9) ≈ 0.99995.
    *
    * Scale guidance (round-8 sweep, SCALE.md §3): at FIXED band width the
    * random-pair collision rate is constant in corpus size, so candidate
    * pairs grow quadratically — the sf1 point measured ~18× cost per 10×
    * docs at r=2. rows-per-band is the corpus-size knob: grow r with
    * log N (r=4 by ~10⁷ docs) to hold the candidate budget, and engage
    * `maxShingleDf` (the guarded configuration, 3.6×/decade measured)
    * against boilerplate-shingle skew. The suite keeps r=2 because the
    * oracle pins the full recall curve these parameters define.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, numHashes: Int = 12, rowsPerBand: Int = 2,
                 threshold: Double = 0.5,
                 maxShingleDf: Option[Long] = None): DataFrame = {
    val shAll = shingles(docs, idCol, textCol, n).persistBounded()
    // candidate signatures over df-capped shingles (guardrail for skewed
    // corpora); verification below always uses the full sets.
    val sh = maxShingleDf.fold(shAll)(cut => capShingleDf(shAll, cut))
    val bands = bandsFromShingles(sh, numHashes, rowsPerBand)
    val pairs = bands.select(col("doc").as("doc_a"), col("band"), col("sig"))
      .join(bands.select(col("doc").as("doc_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    verifyJaccard(shAll, pairs, threshold)
  }

  /** Banded MinHash signatures (doc, band, sig) from a shingle table —
    * band signatures straight off the wide signature row, so groupBy(doc)
    * is the only exchange. sig is md5 over the band's minhash values.
    */
  private def bandsFromShingles(sh: DataFrame, numHashes: Int,
                                rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandExprs = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => s"CAST(mh_${b * rowsPerBand + r} AS STRING)").mkString(", ")
      s"$b, md5(concat_ws('|', $cols))"
    }.mkString(", ")
    minHashWide(sh, numHashes)
      .select(col("doc"), expr(s"stack($numBands, $bandExprs) AS (band, sig)"))
  }

  /** Banded MinHash signatures for a corpus — the MinHash-LSH SERVING
    * artifact: one (doc, band, sig) row per band. Persist this (bucketed
    * by (band, sig) on disk) and both [[minHashIncremental]] probes and
    * periodic in-corpus pair mining reuse it without re-shingling.
    */
  def minHashBands(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, numHashes: Int = 12,
                   rowsPerBand: Int = 2): DataFrame =
    bandsFromShingles(shingles(docs, idCol, textCol, n), numHashes, rowsPerBand)

  /** INCREMENTAL MinHash-LSH dedup — [[exactIncremental]]'s near-dup
    * sibling over Jaccard space (the [[simHashIncremental]] analogue for
    * shingle similarity): a batch doc is dropped when ANY of its band
    * signatures collides with the persisted store's banded signatures.
    * This is the standard production contract for streaming MinHash dedup
    * — collision ⇒ duplicate, no exact-Jaccard verify — because verifying
    * against the store would need the store docs' SHINGLE sets (corpus-
    * sized text re-reads per batch), while the banded store is a few
    * dozen bytes per doc. Precision is the banding's collision curve
    * (P(collide | j) = 1 − (1 − j^r)^b): tighten with wider bands
    * (`rowsPerBand`), audited by q_dedup_recall/_r4.
    *
    * Per-batch cost: shingle+sign the BATCH only, one equi-join probe on
    * (band, sig) against the store — at 100 TB the store side is bucketed
    * by (band, sig) so the probe is a co-located join; the store is never
    * re-signed. Returns the surviving batch docs' banded rows — union
    * them into the store to advance it.
    */
  def minHashIncremental(storeBands: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 3, numHashes: Int = 12,
                         rowsPerBand: Int = 2): DataFrame = {
    // the batch band table feeds the collision probe AND the surviving
    // anti-join — cut it so the shingle + minhash + banding chain runs
    // once (guide §1.2 step 1)
    val bb = minHashBands(batch, idCol, textCol, n, numHashes, rowsPerBand)
      .cutLineage()
    val dup = bb.join(
        storeBands.select(col("band"), col("sig")), Seq("band", "sig"))
      .select(col("doc")).distinct()
    bb.join(dup, Seq("doc"), "left_anti")
  }

  /** Cross-source overlap matrix — the "how much of source A is inside
    * source B" dashboard a mixture designer reads before weighting
    * sources: for every source pair, the number of DISTINCT word n-gram
    * shingles they share. Two common-crawl snapshots overlapping 80%
    * should be mixture-weighted as one source, not two — this is the
    * number that says so. Plan: distinct (shingle, source) projection
    * (one combinable groupBy), then a shingle equi-join producing only
    * cross-source pairs and one counting groupBy — cost is
    * O(shingles shared), never pairwise in docs. At 100 TB pass
    * `maxShingleDf` — the same [[capShingleDf]] guard as
    * [[minHashLsh]]: shingles appearing in more than that many docs
    * (boilerplate headers, licence blocks, navigation chrome) are
    * dropped BEFORE the equi-join, bounding the per-shingle source-set
    * rows the exchange carries; the overlap signal those shingles carry
    * is noise (every source shares boilerplate), so the cap sharpens
    * the statistic while capping the cost. Oracle-gated as
    * `q_source_overlap_capped` (the cap replayed in the oracle CTE).
    */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                    groupCol: String, n: Int = 3,
                    maxShingleDf: Option[Long] = None): DataFrame = {
    // under the df cap the shingle table feeds BOTH the hot-shingle count
    // and the anti-join — persist it (the minHashLsh idiom) so the
    // tokenize+explode+distinct chain runs once; the uncapped path has a
    // single consumer and skips the cache
    val shRaw = shingles(docs, idCol, textCol, n)
    val shAll = if (maxShingleDf.isDefined) shRaw.persistBounded() else shRaw
    val sh = maxShingleDf.fold(shAll)(cut => capShingleDf(shAll, cut))
    val sg = sh
      .join(docs.select(col(idCol).as("doc"), col(groupCol).as("__g")), "doc")
    // per-shingle source SET (bounded by the source count — a handful),
    // then the a<b pairs expand from the sorted set as a pure projection:
    // one exchange instead of the self-join's two-sided shuffle + probe.
    sg.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("__g"))).as("__gs"))
      .filter(size(col("__gs")) >= 2)
      .select(explode(expr(
        """flatten(transform(__gs, (a, i) ->
          |  transform(slice(__gs, i + 2, size(__gs) - i - 1),
          |    b -> struct(a AS src_a, b AS src_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
  }

  /** Benchmark decontamination: corpus docs sharing at least one word
    * n-gram with an eval corpus, with the shared-shingle count — the
    * standard pretraining "drop anything overlapping the benchmark" sweep.
    * One equi-join on the shingle key + one groupBy(doc): cost is
    * O(shingles matching the eval set), never pairwise. At 100 TB the eval
    * side is tiny and broadcasts; the corpus side streams through.
    */
  def contamination(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame = {
    val corpus = shingles(docs, idCol, textCol, n)
    val ev = shingles(evalDocs, idCol, textCol, n).select(col("shingle")).distinct()
    corpus.join(broadcast(ev), "shingle")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
  }

  /** [[contamination]] behind a bloom pre-filter on the eval shingles —
    * the [[exactIncrementalBloom]] pattern applied to decontamination.
    * The plain path broadcasts the full eval shingle STRING set; here the
    * broadcastable artifact is the bloom's bit array (orders of magnitude
    * smaller than the strings), and the corpus side is pruned to the
    * bloom-positive sliver BEFORE any join, so the equi-join shuffles
    * O(matches + false positives) shingle rows instead of every corpus
    * shingle. False positives are killed by the exact confirm join —
    * same answer, same oracle, always.
    */
  def contaminationBloom(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                         textCol: String, n: Int = 5,
                         expectedItems: Long = 1L << 20,
                         numBits: Long = 1L << 23): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    val ev = shingles(evalDocs, idCol, textCol, n)
      .select(col("shingle")).distinct().persistBounded()
    val bloom = ev
      .agg(expr(s"graft_bloom_agg(xxhash64(shingle), " +
        s"CAST($expectedItems AS BIGINT), CAST($numBits AS BIGINT))"))
      .head().getAs[Array[Byte]](0)
    val corpus = shingles(docs, idCol, textCol, n)
    if (bloom == null) corpus.filter(lit(false)) // empty eval set: no overlap
        .groupBy(col("doc")).agg(count(lit(1)).cast("long").as("n_shared"))
    else
      corpus
        .filter(call_function("graft_bloom_contains",
          lit(bloom), xxhash64(col("shingle"))))
        .join(ev, "shingle") // exact confirm: FPs cost a probe, never an answer
        .groupBy(col("doc"))
        .agg(count(lit(1)).cast("long").as("n_shared"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, found without
    * an all-pairs scan: split the 64-bit hash into 4 sixteen-bit bands; by
    * pigeonhole, any pair within hamming ≤ 3 shares at least one identical
    * band, so candidates come from a self-join on (band-index, band-value)
    * and only candidates pay the popcount verification. (For maxHamming > 3
    * the banding is a heuristic recall bound — widen the bands to keep the
    * pigeonhole guarantee.)
    *
    * Why 16-bit bands over a 64-bit hash (round-8 scale sweep finding):
    * with a 32-bit hash and 8-bit bands, two UNRELATED docs share a band
    * with probability ~4/256 — constant in corpus size — so candidate
    * pairs grow as N²/64 and the 10× sf1 sweep measured 25× growth in
    * this operator. 16-bit bands put the random-collision rate at 4/65536:
    * the same sweep point drops to ~linear, and at larger corpora the
    * signature/band width is the knob that keeps it there.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame =
    simHashPairsFromSig(simHash(docs, idCol, textCol).persistBounded(), maxHamming)

  /** [[simHashPairs]] over an EXISTING (doc, simhash) signature table —
    * the serving split: five of the suite's queries consume the same
    * near-dup graph, and a production pipeline persists the signatures
    * once ([[SimHashStore]]) instead of re-hashing the corpus per
    * consumer.
    */
  def simHashPairsFromSig(sig: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = sig.select(col("doc"), col("simhash"),
      explode(expr("sequence(0, 3)")).as("i"))
      .withColumn("band", expr("(simhash >> (16 * i)) & 65535"))
    val cands = bands.select(col("doc").as("doc_a"), col("simhash").as("ha"),
        col("i"), col("band"))
      .join(bands.select(col("doc").as("doc_b"), col("simhash").as("hb"),
        col("i"), col("band")), Seq("i", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** INCREMENTAL near-dup dedup — [[exactIncremental]]'s SimHash sibling:
    * a batch doc is dropped when its 64-bit SimHash is within `maxHamming`
    * of ANY stored signature. Candidates come from the same pigeonhole
    * byte-band equi-join as [[simHashPairs]], but batch bands probe STORE
    * bands only — the store (one (doc, simhash) row per corpus doc; write
    * it bucketed by the band byte) is never re-paired against itself, so
    * per-batch cost is batch-sized, not corpus-sized. In-batch near-dups
    * are the separate [[simHashPairs]]+[[clusters]] pass; this operator
    * answers "is it new vs the corpus so far". Returns surviving
    * (doc, simhash) rows — union them into the store to advance it.
    */
  def simHashIncremental(store: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String,
                         maxHamming: Int = 3): DataFrame = {
    // the 4-band pigeonhole only GUARANTEES candidate generation for
    // hamming <= 3 (4 bands, so <=3 flipped bits leave one band intact);
    // beyond that the stated "within maxHamming of ANY stored signature"
    // contract silently loses recall — reject rather than under-deliver
    require(maxHamming <= 3,
      s"simHashIncremental guarantees recall only for maxHamming <= 3 " +
        s"(got $maxHamming); use more/narrower bands for larger radii")
    val sig = simHash(batch, idCol, textCol)
    val batchBands = sig
      .select(col("doc"), col("simhash"), explode(expr("sequence(0, 3)")).as("i"))
      .withColumn("band", expr("(simhash >> (16 * i)) & 65535"))
    val storeBands = store
      .select(col("doc").as("__sdoc"), col("simhash").as("__sh"),
        explode(expr("sequence(0, 3)")).as("i"))
      .withColumn("band", expr("(__sh >> (16 * i)) & 65535"))
    val dup = batchBands.join(storeBands, Seq("i", "band"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("__sh"))) <= maxHamming)
      .select(col("doc")).distinct()
    sig.join(dup, Seq("doc"), "left_anti")
  }

  /** Near-dup CLUSTER resolution: connected components over a pair list,
    * labeling every doc with the minimum doc id reachable through the
    * near-dup relation (its cluster representative). Pairwise dedup output
    * ((a,b), (b,c)) under-deletes if you drop only `b` per pair — the
    * standard fix is to resolve components and keep ONE doc per component;
    * `kept = (doc == rep)` marks the survivor.
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each round
    * first propagates label(u) ← min(label(u), min over neighbors v of
    * label(v)) (one equi-join + one map-side-combinable groupBy(u).min),
    * then compresses paths with label(u) ← label(label(u)) applied twice
    * (two self-joins, 4× path compression per round) — the classic
    * parallel-CC path-halving step (Shiloach–Vishkin), batched. Plain
    * propagation needs diameter rounds, which a single boilerplate web of
    * millions of docs turns into hundreds of shuffles; with jumping the
    * round count drops to O(log diameter). The published alternative at
    * extreme edge counts is alternating large-star/small-star (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14); this
    * API could swap it in without changing its contract. Lineage is
    * truncated per round via [[graft.util.Checkpoints]] (executor-local
    * blocks by default; set GRAFT_CHECKPOINT_DIR for reliable,
    * executor-loss-safe checkpoints at 100 TB); convergence is detected by the label-sum invariant —
    * labels only ever decrease, so an unchanged sum ⇔ fixpoint — one
    * scalar action per round instead of a change-count join.
    *
    * Bench note (local mode): wall time here is round count × fixed
    * scheduling cost — the per-round data is a few thousand labels, so
    * nearly all of the measured seconds are stage-submission latency, not
    * work. At cluster scale the same rounds each carry billions of edges
    * and the fixed cost amortizes to nothing; what matters is that rounds
    * stay O(log diameter) (pointer jumping) and every round is a bounded,
    * combinable shuffle.
    *
    * Returns one row per doc in `docs`: (idCol, rep, kept).
    */
  def clusters(docs: DataFrame, idCol: String, pairs: DataFrame,
               maxIter: Int = 25): DataFrame = {
    // convergence can only be OBSERVED by running a round — even an
    // already-fixed label set needs one verification pass
    require(maxIter >= 1, "clusters needs at least one iteration")
    val edges = pairs
      .select(col("doc_a").cast("long").as("u"), col("doc_b").cast("long").as("v"))
      .union(pairs.select(col("doc_b").cast("long").as("u"), col("doc_a").cast("long").as("v")))
      .cutLineageEager() // pairs' DAG (LSH/banding) must not re-run per round
    // Iterate ONLY over the active subgraph — docs that appear in some pair.
    // In a near-dup workload that is a sliver of the corpus (dup rate ×
    // cluster size); every doc outside it is its own rep by definition and
    // rejoins at the end, so the per-round joins never touch the full table.
    // init = the first propagation round for free: with identity labels,
    // min over N(u) ∪ {u} needs no join — one groupBy over the edge list.
    var labels = edges.select(col("u"), col("v"))
      .union(edges.select(col("u"), col("u")))
      .groupBy(col("u")).agg(min(col("v")).as("rep"))
      .cutLineage()
    // decimal(38,0) — a sum of 64-bit ids can overflow a long at scale.
    // The sum action ALSO materializes each round's LAZY localCheckpoint,
    // so a round costs exactly one job (multi-stage): propagation join →
    // groupBy min → jump join → sum. The checkpoint itself is mandatory —
    // the jump self-join doubles the logical plan every round, so without
    // lineage truncation the plan tree grows 2^rounds and analysis OOMs;
    // the EAGER variant would truncate too but spends a second job per
    // round on materialization alone, and at tiny per-round state the
    // fixed job overhead is the entire cost.
    // coalesce to 0: with NO pairs at all (a clean corpus) the label frame
    // is empty and a bare sum returns null — the loop must converge on the
    // first round and every doc fall through as its own singleton rep.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("rep").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prev = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = edges
        .join(labels.select(col("u").as("v"), col("rep")), "v")
        .select(col("u"), col("rep"))
      val propagated = labels.union(prop)
        .groupBy(col("u")).agg(min(col("rep")).as("rep"))
      // pointer jump: rep(u) ← rep(rep(u)). Every rep value is an active
      // node id, so the lookup always resolves; left+coalesce guards the
      // self-rooted rows anyway. Jumping twice per round compresses path
      // length 4× per round instead of 2×, so the round count (and with
      // it the dominant per-round job-scheduling cost — see bench note)
      // halves; the plan only grows a bounded 4× before the checkpoint
      // truncates lineage.
      var jumped = propagated
      for (_ <- 0 until Dedup.jumpsPerRound) {
        jumped = jumped
          .join(jumped.select(col("u").as("rep"), col("rep").as("__rep2")),
            Seq("rep"), "left")
          .select(col("u"), coalesce(col("__rep2"), col("rep")).as("rep"))
      }
      val next = jumped.cutLineage()
      val s = labelSum(next)
      converged = s.compareTo(prev) == 0
      prev = s
      labels = next
      it += 1
    }
    // Exiting via the iteration cap means the labels are NOT a fixpoint —
    // silently returning them would hand callers (curateNearDup,
    // q_dedup_clusters) wrong representatives with no signal. 25 rounds of
    // 4×-per-round path halving covers any conceivable diameter, so this
    // can only fire on a bug or a pathological maxIter argument: fail loud.
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.clusters did not converge within $maxIter rounds; " +
          "raise maxIter or inspect the pair list for unexpected structure")
    docs.select(col(idCol).cast("long").as("u"))
      .join(labels, Seq("u"), "left")
      .withColumn("rep", coalesce(col("rep"), col("u")))
      .select(col("u").as(idCol), col("rep"),
        (col("u") === col("rep")).as("kept"))
  }

  /** Span-level (sub-document) dedup audit — the RefinedWeb/CCNet
    * line-dedup idea for a corpus without line structure: for every doc,
    * the fraction of its distinct n-token spans that also occur in at
    * least one OTHER doc. Downstream curation drops or rewrites the docs
    * whose shared fraction exceeds a policy threshold; this operator
    * computes the evidence, not the policy.
    *
    * Plan shape: one distinct-shingle pass, one map-side-combinable
    * groupBy(shingle) for document frequency, one shingle-keyed join that
    * REUSES the groupBy's hash partitioning (no extra exchange), and one
    * groupBy(doc). No all-pairs step anywhere — cost is linear in total
    * span count, so it survives 100 TB where pairwise comparison cannot.
    * Docs shorter than n tokens carry no span and report 0/0/0.0.
    */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 8): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    // df counts DOCS per span (shingles() is distinct per doc already)
    val df = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).cast("long").as("__df"))
    val perDoc = sh.join(df, "shingle")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("__df") >= 2L, 1L).otherwise(0L)).cast("long").as("n_shared"),
        round(sum(when(col("__df") >= 2L, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("shared_frac"))
    docs.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("shared_frac"), lit(0.0)).as("shared_frac"))
  }

  /** C4-style boilerplate removal, re-based from lines onto disjoint
    * n-token blocks (the corpus carries no newline structure — reference
    * text is single-line, `Spark/Tweets_preprocessing.py` normalizes to
    * one line per tweet). A block whose exact text occurs in >= `minDf`
    * DISTINCT docs is boilerplate; removal drops the block wholesale, and
    * the sub-block tail (< n tokens) is always kept — too short to match
    * reliably, exactly as C4 keeps short lines.
    *
    * Unlike [[spanDedup]] (overlapping spans, audit only), this computes
    * the REMOVAL arithmetic: disjoint blocks mean no interval-merge step,
    * so kept tokens = n_tokens - n * n_removed exactly.
    *
    * Plan shape: one block explode, one distinct, one map-side-combinable
    * groupBy(block) for document frequency, one block-keyed join reusing
    * that partitioning, one groupBy(doc). Linear in corpus token count —
    * no all-pairs, no window — so it survives 100 TB.
    */
  def boilerplateRemove(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 8, minDf: Long = 2L): DataFrame = {
    val toks = split(col(textCol), " ")
    // one row per positional block occurrence (NOT distinct — a doc
    // repeating a hot block twice loses both copies)
    val blocks = docs
      .filter(col(textCol).isNotNull && size(toks) >= n)
      .select(col(idCol).as("doc"), toks.as("__toks"),
        explode(sequence(lit(0), (size(toks) / n).cast("int") - 1)).as("i"))
      .select(col("doc"),
        concat_ws(" ", slice(col("__toks"), col("i") * n + 1, lit(n))).as("block"))
    // document frequency counts DOCS, not occurrences
    val hot = blocks.distinct()
      .groupBy(col("block")).agg(count(lit(1)).cast("long").as("__df"))
      .filter(col("__df") >= minDf)
    val perDoc = blocks
      .join(hot.select(col("block"), lit(true).as("__hot")), Seq("block"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        sum(when(col("__hot"), 1L).otherwise(0L)).cast("long").as("n_removed"))
    docs
      .select(col(idCol).as("doc"),
        when(col(textCol).isNotNull, size(toks)).otherwise(lit(0))
          .cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        col("n_tokens"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_tokens") - lit(n.toLong) * coalesce(col("n_removed"), lit(0L)))
          .as("n_kept_tokens"))
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the published alternative to [[clusters]]'s label
    * propagation, wired as a first-class engine path with the identical
    * contract: (idCol, rep, kept) with rep = min id of the component.
    *
    * Edges live canonically as (hi, lo), hi > lo. Large-star connects every
    * neighbor LARGER than a node to the smallest node of its neighborhood
    * (computed over the symmetrized edges); small-star connects the smaller
    * neighbors (and the node itself) to that minimum. Each operation
    * preserves connectivity and strictly shrinks a potential function, and
    * the fixpoint is a star forest centered on component minima. Per round:
    * two map-side-combinable groupBy-mins and two co-partitioned joins —
    * every shuffle is keyed and combinable, nothing is ever all-pairs.
    *
    * Versus [[clusters]]: same contract, different convergence currency —
    * star rounds RESHAPE the edge set (size can transiently grow, bounded
    * by Kiveris' potential argument) while label rounds keep a fixed
    * per-node state. Convergence = unchanged canonical edge set, detected
    * by an order-invariant (count, xor-style hash-sum) checksum — one
    * scalar action per round, same as clusters' label-sum trick. Lineage is
    * truncated per round with a lazy [[graft.util.Checkpoints]] cut
    * materialized by that same action.
    */
  def clustersAlternating(docs: DataFrame, idCol: String, pairs: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    require(maxIter >= 1, "clustersAlternating needs at least one iteration")
    // canonical (hi, lo): direction carries no information in an undirected
    // graph, so normalize once; self-pairs (a,a) carry none either
    var edges = pairs
      .select(greatest(col("doc_a").cast("long"), col("doc_b").cast("long")).as("hi"),
        least(col("doc_a").cast("long"), col("doc_b").cast("long")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .cutLineage()
    def checksum(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = checksum(edges)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // LARGE-STAR over the symmetrized graph: m(u) = min(N(u) ∪ {u});
      // every neighbor v > u re-attaches to m. Output is canonical by
      // construction (v > u ≥ m).
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(least(col("v"), col("u"))).as("m"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // SMALL-STAR on the canonical (hi, lo) set: m(hi) = min of the
      // strictly-smaller neighborhood; each smaller neighbor and hi itself
      // attach to m. (lo, m) rows with lo = m would be self-loops — drop.
      val sMins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val ss = ls.join(sMins, "hi")
        .select(col("lo").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .union(sMins.select(col("hi"), col("m").as("lo")))
        .distinct()
        .cutLineage()
      val s = checksum(ss)
      // the checksum is a cheap per-round filter, but unlike clusters'
      // label sum it is NOT exact (the edge set is not monotone, so no
      // sum invariant exists): a 2^-64 collision would silently declare a
      // non-fixpoint converged. Confirm exactly — counts already match,
      // and both sets are distinct, so one empty set-difference proves
      // equality. This runs ONCE, on the round that claims convergence.
      converged = s == prev && ss.except(edges).isEmpty
      prev = s
      edges = ss
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.clustersAlternating did not converge within $maxIter rounds")
    // fixpoint is a star forest: every non-center points at its component
    // min; centers are absent as 'hi' and default to themselves
    val labels = edges.groupBy(col("hi")).agg(min(col("lo")).as("rep"))
      .select(col("hi").as("u"), col("rep"))
    docs.select(col(idCol).cast("long").as("u"))
      .join(labels, Seq("u"), "left")
      .withColumn("rep", coalesce(col("rep"), col("u")))
      .select(col("u").as(idCol), col("rep"),
        (col("u") === col("rep")).as("kept"))
  }

  /** Degree distribution of a near-dup pair graph: how many docs have k
    * near-duplicates. The shape of this histogram is the first thing to
    * inspect before cluster resolution — a power-law tail (a few
    * boilerplate templates shared by thousands of docs) is what motivates
    * [[clustersAlternating]]'s large-star handling and the frequent-
    * shingle guardrail. Two combinable groupBys; the second runs over the
    * tiny distinct-degree key space.
    */
  def degreeDistribution(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("u"))
      .union(pairs.select(col("doc_b").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).cast("long").as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).cast("long").as("n_docs"))

  /** Number of signature bits — 64 (16 md5 hex digits). Band width is
    * SimHashBits / 4; both sides of every oracle derive from this shape.
    */
  val SimHashBits = 64

  /** 64-bit SimHash over token counts with an engine-independent bit source:
    * bit b of a token's hash = bit (b mod 4) of hex digit (b div 4) of
    * md5(token). Integer arithmetic end-to-end — bit-exact everywhere.
    *
    * Plan shape: the 32 per-bit contribution sums are 32 parallel SUM
    * aggregates in ONE groupBy(doc) over the raw token rows (the same
    * wide-agg trick as [[minHashWide]]) — each token occurrence contributes
    * ±1 per bit, so Σ_terms cnt·sign ≡ Σ_occurrences sign and neither the
    * (doc, term) pre-aggregation nor the explode-by-bit-index is needed.
    * The naive formulation shuffles 32× the token rows through a
    * groupBy(doc, bit); this shuffles one row per doc.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("term"))
      .withColumn("h", md5(col("term")))
    val aggs = (0 until SimHashBits).map { b =>
      val hexPos = b / 4 + 1 // 1-based hex digit of md5(term)
      val shift = b % 4
      sum(expr(
        s"((CAST(instr('0123456789abcdef', substring(h, $hexPos, 1)) - 1 AS BIGINT) >> $shift) & 1) * 2 - 1"
      )).as(s"__s_$b")
    }
    toks.groupBy(col("doc"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc"),
        (0 until SimHashBits).map { b =>
          // 1L << 63 = Long.MinValue — intended: bit 63 is the sign bit of
          // the packed signature; sums of distinct powers stay representable
          when(col(s"__s_$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).cast("long").as("simhash"))
  }

  /** Cross-document maximal shared token spans — substring-level dedup:
    * find every maximal run of ≥ `minSpan` consecutive tokens two documents
    * share, the unit the "train-on-it-once" dedup literature targets
    * (shared boilerplate, quoted passages, licensed blocks) where document-
    * level MinHash ([[minHashLsh]]) and line-level [[spanDedup]] both miss.
    *
    * Method: anchor n-grams + diagonal run collapse. Each doc emits its
    * n-gram at every position; an equi-join on the gram (NOT all pairs —
    * cost is Σ_gram matches², i.e. proportional to actually-shared content)
    * yields (docA, docB, posA, posB) anchor hits; hits on one shared span
    * all lie on the same diagonal `posA - posB`, so grouping by diagonal
    * and collapsing consecutive-posA runs with the gaps-and-islands
    * `pos - row_number` trick rebuilds each maximal span exactly once:
    * span length = run length + n - 1.
    *
    * Scale: the join key should be the gram's 64-bit hash banded by prefix
    * (the MinHash-LSH layout) so postings co-partition; stop-gram removal
    * (drop grams with document frequency above a cap) bounds the per-gram
    * match blowup exactly like the LSH band-size guard. The window is
    * partitioned by (docA, docB, diagonal) — never global.
    *
    * Returns (doc_a, doc_b, start_a, start_b, span_tokens).
    */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, minSpan: Int): DataFrame = {
    require(minSpan >= n, s"minSpan $minSpan must be >= gram size $n")
    val toks = docs
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= n)
    val grams = toks
      .select(col("doc"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - n)).as("pos"))
      .select(col("doc"), col("pos"),
        concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(n))).as("gram"))
    val hits = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
      .distinct()
    val w = Window
      .partitionBy(col("doc_a"), col("doc_b"), (col("pa") - col("pb")).as("__diag"))
      .orderBy(col("pa"))
    hits
      .withColumn("__isl", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), (col("pa") - col("pb")).as("__diag"),
        col("__isl"))
      .agg(min(col("pa")).cast("long").as("start_a"),
        min(col("pb")).cast("long").as("start_b"),
        (count(lit(1)) + (n - 1)).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_tokens"))
  }
}
