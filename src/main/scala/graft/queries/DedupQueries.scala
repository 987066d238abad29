package graft.queries

import graft.dedup.{Dedup, SimHashStore}
import graft.util.{QueryPack, Tables}
import org.apache.spark.sql.functions.{col, count, levenshtein, lit, round, sum, when}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication coverage over `documents`: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash — each with a DuckDB oracle computing the identical
  * engine-independent signatures.
  */
object DedupQueries extends QueryPack {

  /** Shared shingle CTE prefix (word trigrams, docs with ≥3 tokens);
    * `where` prepends an extra input predicate (e.g. the recall audit's
    * doc cap).
    */
  private def shingleCteWhere(where: String): String =
    s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
       |  WHERE ${where}len(str_split(text, ' ')) >= 3),
       |idx AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 2)) AS i FROM t),
       |sh AS (SELECT DISTINCT doc_id AS doc, array_to_string(toks[i+1:i+3], ' ') AS shingle FROM idx),
       |sz AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc)
       |""".stripMargin

  private val shingleCte = shingleCteWhere("")

  /** Shared by q_contamination and q_contamination_bloom — the bloom is a
    * plan optimization with an exact confirm join, so both paths must land
    * on the identical overlap counts.
    */
  private val contaminationOracle =
    """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
      |  WHERE len(str_split(text, ' ')) >= 5),
      |idx AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 4)) AS i FROM t),
      |sh5 AS (SELECT DISTINCT doc_id AS doc, array_to_string(toks[i+1:i+5], ' ') AS shingle FROM idx),
      |ev AS (SELECT DISTINCT shingle FROM sh5 WHERE doc % 50 = 0)
      |SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM sh5 JOIN ev USING (shingle)
      |WHERE doc % 50 <> 0
      |GROUP BY doc""".stripMargin

  private val jaccardVerify =
    """SELECT i.doc_a, i.doc_b,
      |  round(CAST(i.inter AS DOUBLE) / CAST(x.n_sh + y.n_sh - i.inter AS DOUBLE), 6) AS jacc
      |FROM inter i JOIN sz x ON i.doc_a = x.doc JOIN sz y ON i.doc_b = y.doc
      |WHERE round(CAST(i.inter AS DOUBLE) / CAST(x.n_sh + y.n_sh - i.inter AS DOUBLE), 6) >= 0.5
      |""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")),

    // All-pairs Jaccard is the LABELED BASELINE cross-check for the
    // MinHash/LSH rows; its input is CAPPED (doc_id < 500) so the
    // quadratic shingle self-join stays constant-size as SF grows — the
    // uncapped scale path is q_dedup_minhash/_guarded. Oracle applies the
    // identical cap.
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 500),
        "doc_id", "text", n = 3, threshold = 0.5)),

    // Incremental ingestion: every 3rd doc arrives as the new batch, the
    // rest were already indexed — batch survivors are signatures unseen in
    // the store, min-id within the batch.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val store = Dedup.exact(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
        .select(col("signature"))
      Dedup.exactIncremental(store, docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text")
    }),

    // Same contract as q_dedup_incremental, probed through a bloom_filter_agg
    // pre-prune — the store-side join sees only the bloom-positive sliver.
    "q_dedup_incr_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val store = Dedup.exact(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
        .select(col("signature"))
      Dedup.exactIncrementalBloom(store, docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text")
    }),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 2, threshold = 0.5)),

    // The PRODUCTION banding for large corpora (SCALE.md §3): rowsPerBand=4
    // (3 bands of 4) — per-band random-collision probability drops from
    // ~1/p² to ~1/p⁴, which is what holds the candidate-pair budget
    // ~linear as N grows (r=2's fixed band width measured ~18×/decade at
    // sf1). Own oracle with the r=4 parameters pinned, so the scale
    // configuration is a tested path, not a documented knob.
    "q_dedup_minhash_r4" -> ((s, dir) =>
      Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 4, threshold = 0.5)),

    // The two production knobs TOGETHER (r=4 banding + df guard) — the
    // configuration a 100 TB run would actually ship, hash-checked as one
    // oracle entry.
    "q_dedup_minhash_r4_guarded" -> ((s, dir) =>
      Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 4, threshold = 0.5,
        maxShingleDf = Some(5L))),

    // Same LSH with the frequent-shingle guardrail engaged (df cap 5 —
    // low enough to bite on this corpus): signatures come from df-capped
    // shingles, verification from the full sets. Hash-checked against a
    // DuckDB oracle that mirrors the cap exactly.
    "q_dedup_minhash_guarded" -> ((s, dir) =>
      Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 2, threshold = 0.5,
        maxShingleDf = Some(5L))),

    "q_simhash" -> ((s, dir) =>
      Dedup.simHash(Tables.documents(s, dir), "doc_id", "text")),

    // Near-dup incremental ingestion: the batch (every 3rd doc) keeps only
    // docs whose SimHash is > 3 bits from every stored signature.
    "q_dedup_incr_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val store = Dedup.simHash(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
      Dedup.simHashIncremental(store, docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", maxHamming = 3)
    }),

    // Incremental MinHash-LSH: the new-batch third probed against the
    // persisted banded-signature store of the rest; any band collision
    // drops the doc (production streaming-dedup contract — no store-side
    // re-shingle). Survivors projected to distinct doc ids.
    "q_dedup_incr_minhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val store = Dedup.minHashBands(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text")
      Dedup.minHashIncremental(store, docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text")
        .select(col("doc")).distinct()
    }),

    // Cross-source shared-shingle matrix: the mixture-design overlap
    // dashboard (sources that largely duplicate each other should be
    // weighted as one).
    "q_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(Tables.documents(s, dir), "doc_id", "text",
        "source")),

    // The 100-TB guard on the same statistic: boilerplate shingles
    // (doc frequency > 4 — binding on this corpus, max df 7) dropped
    // before the equi-join, the minHashLsh(maxShingleDf) pattern. The
    // cap is replayed in the oracle's df CTE, so the trade is a
    // hash-gated knob, not a silent approximation.
    "q_source_overlap_capped" -> ((s, dir) =>
      Dedup.sourceOverlap(Tables.documents(s, dir), "doc_id", "text",
        "source", maxShingleDf = Some(4L))),

    // The production banding (r=4: 3 bands of 4 — the corpus-size knob
    // from the round-9 sweep) on the same incremental probe.
    "q_dedup_incr_minhash_r4" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val store = Dedup.minHashBands(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", rowsPerBand = 4)
      Dedup.minHashIncremental(store, docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", rowsPerBand = 4)
        .select(col("doc")).distinct()
    }),

    // Pairs mined from the PERSISTED signature store (build-once split,
    // like the BM25 serving index) — four suite queries consume this same
    // near-dup graph, and none of them re-hashes the corpus.
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairsFromSig(SimHashStore.ensureBuilt(s, dir),
        maxHamming = 3)),

    // Edit-distance verification layered on the LSH candidates: the exact
    // character-level confirmation pass a dedup pipeline runs on its
    // near-dup pairs (cost O(len²) per PAIR, never per corpus — only the
    // LSH survivors pay it).
    "q_edit_distance" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.minHashLsh(docs, "doc_id", "text",
          n = 3, numHashes = 12, rowsPerBand = 2, threshold = 0.5)
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("__ta")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("__tb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jacc"),
          levenshtein(col("__ta"), col("__tb")).cast("long").as("edit_dist"))
    }),

    // Cluster resolution over the SimHash near-dup pairs: every doc labeled
    // with its connected-component representative (min reachable id), kept =
    // survivor. The oracle recomputes the same pairs and resolves components
    // with a recursive transitive-closure CTE — the Spark side must converge
    // to the identical fixpoint.
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.clusters(docs, "doc_id",
        Dedup.simHashPairsFromSig(SimHashStore.ensureBuilt(s, dir), maxHamming = 3))
    }),

    // Same contract and oracle as q_dedup_clusters, computed by the
    // published alternative engine path: alternating large-star/small-star
    // rounds (Kiveris et al., SoCC'14) instead of label propagation — both
    // must converge to the identical min-id star forest.
    "q_dedup_clusters_ls" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.clustersAlternating(docs, "doc_id",
        Dedup.simHashPairsFromSig(SimHashStore.ensureBuilt(s, dir), maxHamming = 3))
    }),

    // Span-level dedup audit: per doc, the fraction of its distinct 8-token
    // spans that occur in at least one other doc (RefinedWeb line-dedup
    // shape, no all-pairs step).
    "q_span_dedup" -> ((s, dir) =>
      Dedup.spanDedup(Tables.documents(s, dir), "doc_id", "text", n = 8)),

    // Cross-doc maximal shared token spans (substring-level dedup):
    // 5-gram anchors + diagonal run collapse, spans >= 10 tokens. Capped
    // input like q_dedup_jaccard so the gram-collision join stays bounded
    // as SF grows; the uncapped scale path hashes + bands the grams.
    "q_substring_dedup" -> ((s, dir) =>
      Dedup.sharedSpans(Tables.documents(s, dir).filter(col("doc_id") < 2000),
        "doc_id", "text", n = 5, minSpan = 10)),

    // Per-source duplication dashboard: docs / distinct signatures /
    // duplicate rate, one combinable groupBy.
    "q_dedup_by_source" -> ((s, dir) =>
      Dedup.dupRateByGroup(Tables.documents(s, dir), "source", "text")),

    // C4-style boilerplate removal over disjoint 8-token blocks: per doc,
    // how many blocks are corpus-duplicated (df >= 2) and the exact token
    // count surviving removal.
    "q_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateRemove(Tables.documents(s, dir), "doc_id", "text",
        n = 8, minDf = 2L)),

    // Degree distribution of the SimHash near-dup graph — the pre-cluster
    // skew audit (power-law tail ⇒ large-star/guardrail territory).
    "q_dedup_degree" -> ((s, dir) =>
      Dedup.degreeDistribution(
        Dedup.simHashPairsFromSig(SimHashStore.ensureBuilt(s, dir), maxHamming = 3))),

    // Benchmark decontamination: every 50th doc plays the eval set; the
    // rest of the corpus is swept for 5-gram overlap with it.
    "q_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 5)
    }),

    // MEASURED recall of MinHash-LSH candidate generation against exact
    // all-pairs Jaccard truth, on the capped slice where the truth is
    // computable (doc_id < 500, like q_dedup_jaccard). Precision is 1.0
    // by construction — LSH candidates are verified with exact Jaccard —
    // so recall is the one number the banding parameters buy or lose.
    // The q_ann_recall pattern applied to dedup.
    "q_dedup_recall" -> ((s, dir) => {
      val capped = Tables.documents(s, dir).filter(col("doc_id") < 500)
      val truth = Dedup.jaccardPairs(capped, "doc_id", "text",
        n = 3, threshold = 0.5).select(col("doc_a"), col("doc_b"))
      val found = Dedup.minHashLsh(capped, "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 2, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))
      truth.withColumn("__t", lit(1L))
        .join(found.withColumn("__f", lit(1L)), Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).cast("long").as("n_truth"),
          sum(when(col("__f").isNotNull, 1L).otherwise(0L)).cast("long").as("n_found"),
          round(sum(when(col("__f").isNotNull, 1.0).otherwise(0.0))
            / count(lit(1)), 6).as("recall"))
    }),

    // The same audit at the PRODUCTION banding (r=4): what the corpus-size
    // knob costs in recall is a measured number, not a guess.
    "q_dedup_recall_r4" -> ((s, dir) => {
      val capped = Tables.documents(s, dir).filter(col("doc_id") < 500)
      val truth = Dedup.jaccardPairs(capped, "doc_id", "text",
        n = 3, threshold = 0.5).select(col("doc_a"), col("doc_b"))
      val found = Dedup.minHashLsh(capped, "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 4, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))
      truth.withColumn("__t", lit(1L))
        .join(found.withColumn("__f", lit(1L)), Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).cast("long").as("n_truth"),
          sum(when(col("__f").isNotNull, 1L).otherwise(0L)).cast("long").as("n_found"),
          round(sum(when(col("__f").isNotNull, 1.0).otherwise(0.0))
            / count(lit(1)), 6).as("recall"))
    }),

    // Same sweep behind the bloom pre-filter: corpus shingles pruned to the
    // bloom-positive sliver before the join. Plan changes, answer doesn't —
    // same oracle as q_contamination.
    "q_contamination_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.contaminationBloom(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 5)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS signature, MIN(doc_id) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "q_dedup_jaccard" -> (shingleCte +
      """, inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        |  WHERE a.doc < 500 AND b.doc < 500
        |  GROUP BY a.doc, b.doc)
        |""".stripMargin + jaccardVerify),

    "q_dedup_incremental" ->
      """WITH store AS (SELECT DISTINCT md5(text) AS signature
        |  FROM documents WHERE doc_id % 3 <> 0),
        |b AS (SELECT md5(text) AS signature, MIN(doc_id) AS keep_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents WHERE doc_id % 3 = 0 GROUP BY md5(text))
        |SELECT b.signature, b.keep_id, b.n_docs FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.signature = b.signature)""".stripMargin,

    // Bloom pre-prune changes the plan, never the answer — same oracle as
    // the plain incremental path.
    "q_dedup_incr_bloom" ->
      """WITH store AS (SELECT DISTINCT md5(text) AS signature
        |  FROM documents WHERE doc_id % 3 <> 0),
        |b AS (SELECT md5(text) AS signature, MIN(doc_id) AS keep_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents WHERE doc_id % 3 = 0 GROUP BY md5(text))
        |SELECT b.signature, b.keep_id, b.n_docs FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.signature = b.signature)""".stripMargin,

    "q_dedup_minhash" -> (shingleCte + minhashOracleCtes(None) + jaccardVerify),

    "q_dedup_minhash_r4" ->
      (shingleCte + minhashOracleCtes(None, rowsPerBand = 4) + jaccardVerify),

    "q_dedup_minhash_r4_guarded" ->
      (shingleCte + minhashOracleCtes(Some(5L), rowsPerBand = 4) + jaccardVerify),

    "q_edit_distance" -> (shingleCte + minhashOracleCtes(None) +
      ", jv AS (" + jaccardVerify + ")\n" +
      """SELECT jv.doc_a, jv.doc_b, jv.jacc,
        |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist
        |FROM jv JOIN documents x ON jv.doc_a = x.doc_id
        |JOIN documents y ON jv.doc_b = y.doc_id""".stripMargin),

    "q_dedup_minhash_guarded" ->
      (shingleCte + minhashOracleCtes(Some(5L)) + jaccardVerify),

    "q_simhash" -> (simhashCte() + "SELECT doc, simhash FROM sig"),

    "q_dedup_incr_simhash" -> (simhashCte() +
      """, bsig AS (SELECT doc, simhash FROM sig WHERE doc % 3 = 0),
        |ssig AS (SELECT doc AS sdoc, simhash AS sh FROM sig WHERE doc % 3 <> 0),
        |bb AS (SELECT doc, simhash, i, (simhash >> (16 * i)) & 65535 AS band
        |  FROM bsig, (VALUES (0), (1), (2), (3)) t(i)),
        |sb AS (SELECT sdoc, sh, i, (sh >> (16 * i)) & 65535 AS band
        |  FROM ssig, (VALUES (0), (1), (2), (3)) t(i)),
        |dup AS (SELECT DISTINCT bb.doc FROM bb JOIN sb USING (i, band)
        |  WHERE bit_count(xor(bb.simhash, sb.sh)) <= 3)
        |SELECT b.doc, b.simhash FROM bsig b
        |WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc = b.doc)""".stripMargin),

    // Incremental MinHash probe: batch-side bands vs store-side bands,
    // any (band, bsig) collision drops the doc; survivors are batch docs
    // (with signatures) minus the collided set.
    "q_dedup_incr_minhash" -> (shingleCte + minhashBandsCtes(None, 2) +
      incrMinhashTail),

    "q_dedup_incr_minhash_r4" -> (shingleCte + minhashBandsCtes(None, 4) +
      incrMinhashTail),

    "q_source_overlap" -> (shingleCte +
      """, sg AS (SELECT DISTINCT s.shingle, d.source
        |  FROM sh s JOIN documents d ON s.doc = d.doc_id)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM sg a JOIN sg b ON a.shingle = b.shingle AND a.source < b.source
        |GROUP BY a.source, b.source""".stripMargin),

    "q_source_overlap_capped" -> (shingleCte +
      """, kept AS (SELECT shingle FROM sh GROUP BY shingle
        |  HAVING COUNT(*) <= 4),
        |sg AS (SELECT DISTINCT s.shingle, d.source
        |  FROM sh s JOIN kept k ON s.shingle = k.shingle
        |  JOIN documents d ON s.doc = d.doc_id)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM sg a JOIN sg b ON a.shingle = b.shingle AND a.source < b.source
        |GROUP BY a.source, b.source""".stripMargin),

    // LSH pairs (the minhash CTEs over the capped input, Jaccard-verified)
    // joined against all-pairs truth on the same slice.
    "q_dedup_recall" -> recallOracle(rowsPerBand = 2),

    // The production banding's measured recall on the same truth set.
    "q_dedup_recall_r4" -> recallOracle(rowsPerBand = 4),

    "q_contamination" -> contaminationOracle,

    // Bloom pre-prune changes the plan, never the answer.
    "q_contamination_bloom" -> contaminationOracle,

    "q_simhash_pairs" -> (simhashCte() + simhashBandsCte +
      """
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin),

    // Same SimHash pairs, then connected components via recursive transitive
    // closure: rep(u) = min id reachable over the symmetric edge set.
    "q_dedup_clusters" -> clustersOracle,

    // The alternating-star path must land on the exact same fixpoint.
    "q_dedup_clusters_ls" -> clustersOracle,

    "q_dedup_degree" -> (simhashCte() + simhashBandsCte +
      """,
        |prs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(ha, hb)) <= 3),
        |e AS (SELECT doc_a AS u FROM prs UNION ALL SELECT doc_b AS u FROM prs),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY u)
        |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM deg GROUP BY degree""".stripMargin),

    "q_span_dedup" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 8),
        |idx AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS i FROM t),
        |sp AS (SELECT DISTINCT doc_id AS doc, array_to_string(toks[i+1:i+8], ' ') AS shingle FROM idx),
        |df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sp GROUP BY shingle),
        |per AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |    round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS shared_frac
        |  FROM sp JOIN df USING (shingle) GROUP BY doc)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(p.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(p.shared_frac, 0.0) AS shared_frac
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc""".stripMargin,

    "q_substring_dedup" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE doc_id < 2000 AND len(str_split(text, ' ')) >= 5),
        |g AS (SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+5], ' ') AS gram
        |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 4)) AS i FROM t)),
        |hits AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.pos AS pa, b.pos AS pb
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        |isl AS (SELECT doc_a, doc_b, pa, pb,
        |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
        |      ORDER BY pa) AS isl
        |  FROM hits)
        |SELECT doc_a, doc_b, CAST(min(pa) AS BIGINT) AS start_a,
        |  CAST(min(pb) AS BIGINT) AS start_b,
        |  CAST(count(*) + 4 AS BIGINT) AS span_tokens
        |FROM isl GROUP BY doc_a, doc_b, pa - pb, isl
        |HAVING count(*) + 4 >= 10""".stripMargin,

    "q_dedup_by_source" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |  round(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
        |    / COUNT(text), 6) AS dup_rate
        |FROM documents GROUP BY source""".stripMargin,

    "q_boilerplate" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE text IS NOT NULL AND len(str_split(text, ' ')) >= 8),
        |b AS (SELECT doc_id, toks, unnest(range(0, len(toks) // 8)) AS i FROM t),
        |blk AS (SELECT doc_id AS doc, array_to_string(toks[i*8+1:i*8+8], ' ') AS block FROM b),
        |hot AS (SELECT block FROM (SELECT DISTINCT doc, block FROM blk)
        |  GROUP BY block HAVING COUNT(*) >= 2),
        |per AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(CASE WHEN block IN (SELECT block FROM hot) THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        |  FROM blk GROUP BY doc)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN d.text IS NULL THEN 0 ELSE len(str_split(d.text, ' ')) END AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(p.n_blocks, 0) AS BIGINT) AS n_blocks,
        |  CAST(COALESCE(p.n_removed, 0) AS BIGINT) AS n_removed,
        |  CAST(CASE WHEN d.text IS NULL THEN 0 ELSE len(str_split(d.text, ' ')) END
        |    - 8 * COALESCE(p.n_removed, 0) AS BIGINT) AS n_kept_tokens
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc""".stripMargin
  )

  /** SimHash pairs → connected components via recursive transitive closure
    * — shared verbatim by the label-propagation and alternating-star
    * engine paths (same contract, same fixpoint).
    */
  // lazy: refers to simhashBandsCte, a val declared further down the body.
  // private[queries]: TextQueries composes the same closure into the
  // q_curation_neardup oracle (cluster representatives as the keep set).
  private[queries] lazy val clustersCtePrefix: String =
    simhashCte(recursive = true) + simhashBandsCte +
      """,
        |prs AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(ha, hb)) <= 3),
        |e AS (SELECT doc_a AS u, doc_b AS v FROM prs
        |  UNION SELECT doc_b, doc_a FROM prs),
        |reach AS (SELECT u, v FROM e
        |  UNION SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
        |minr AS (SELECT u, MIN(v) AS mv FROM reach GROUP BY u)
        |""".stripMargin

  private lazy val clustersOracle: String =
    clustersCtePrefix +
      """SELECT d.doc_id,
        |  CAST(LEAST(d.doc_id, COALESCE(m.mv, d.doc_id)) AS BIGINT) AS rep,
        |  LEAST(d.doc_id, COALESCE(m.mv, d.doc_id)) = d.doc_id AS kept
        |FROM documents d LEFT JOIN minr m ON d.doc_id = m.u""".stripMargin

  /** Recall-audit oracle at a given banding: LSH pairs (capped input,
    * Jaccard-verified) LEFT-joined against the all-pairs truth on the
    * same slice; recall = found / truth.
    */
  private def recallOracle(rowsPerBand: Int): String =
    shingleCteWhere("doc_id < 500 AND ") +
      minhashOracleCtes(None, rowsPerBand) +
      ", jv AS (" + jaccardVerify + "),\n" +
      """tint AS (SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(COUNT(*) AS BIGINT) AS i2
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        |  GROUP BY a.doc, b.doc),
        |truth AS (SELECT t.doc_a, t.doc_b FROM tint t
        |  JOIN sz x ON t.doc_a = x.doc JOIN sz y ON t.doc_b = y.doc
        |  WHERE round(CAST(t.i2 AS DOUBLE) / CAST(x.n_sh + y.n_sh - t.i2 AS DOUBLE), 6) >= 0.5)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
        |  CAST(SUM(CASE WHEN f.fa IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
        |  round(CAST(SUM(CASE WHEN f.fa IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall
        |FROM truth LEFT JOIN (SELECT doc_a AS fa, doc_b AS fb FROM jv) f
        |  ON truth.doc_a = f.fa AND truth.doc_b = f.fb""".stripMargin

  /** MinHash candidate + intersection CTEs mirroring
    * [[graft.dedup.Dedup.minHashSignatures]]'s two-stage hash family
    * (md5 → 60-bit int → per-i LCG mod 2^31−1), generated for 12 hashes /
    * 6 bands of 2. With `capDf` set, signatures come from df-capped
    * shingles (mirroring `maxShingleDf`); verification always uses the
    * full sets.
    */
  /** CTEs through `bands(doc, band, bsig)` — the banded-signature prefix
    * shared by the pair-mining oracles and the incremental-probe oracle.
    */
  private def minhashBandsCtes(capDf: Option[Long], rowsPerBand: Int): String = {
    val p = graft.dedup.Dedup.MinHashP
    val mins = (0 until 12).map(i =>
      s"MIN(((${2 * i + 1} * hm + ${12345L * i}) % $p)) AS mh_$i").mkString(",\n    ")
    val bandSelects = (0 until 12 / rowsPerBand).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => s"CAST(mh_${b * rowsPerBand + r} AS VARCHAR)")
      s"SELECT doc, $b AS band, md5(concat(${cols.mkString(", '|', ")})) AS bsig FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val capCte = capDf.fold("")(c =>
      s""", shc AS (SELECT sh.doc, sh.shingle FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= $c)
         |  USING (shingle))
         |""".stripMargin)
    val shSource = capDf.fold("sh")(_ => "shc")
    s"""$capCte, hsh AS (SELECT doc,
       |    CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) % $p AS hm
       |  FROM $shSource),
       |sig AS (SELECT doc,
       |    $mins
       |  FROM hsh GROUP BY doc),
       |bands AS (
       |  $bandSelects)
       |""".stripMargin
  }

  /** Incremental-probe tail over `bands`: batch third vs store bands,
    * any (band, bsig) collision drops the doc.
    */
  private val incrMinhashTail: String =
    """, bb AS (SELECT doc, band, bsig FROM bands WHERE doc % 3 = 0),
      |sb AS (SELECT band, bsig FROM bands WHERE doc % 3 <> 0),
      |dup AS (SELECT DISTINCT bb.doc FROM bb JOIN sb USING (band, bsig))
      |SELECT d.doc FROM (SELECT DISTINCT doc FROM bb) d
      |WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc = d.doc)""".stripMargin

  private def minhashOracleCtes(capDf: Option[Long], rowsPerBand: Int = 2): String = {
    minhashBandsCtes(capDf, rowsPerBand) +
    """, pairs AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc < b.doc),
       |inter AS (SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM pairs p
       |  JOIN sh a ON a.doc = p.doc_a
       |  JOIN sh b ON b.doc = p.doc_b AND b.shingle = a.shingle
       |  GROUP BY p.doc_a, p.doc_b)
       |""".stripMargin
  }

  /** Shared pigeonhole-banding candidate CTEs over sig(doc, simhash) —
    * appended after [[simhashCte]] by both the pairs and clusters oracles.
    */
  private val simhashBandsCte: String =
    """, bands AS (SELECT doc, simhash, t.i, (simhash >> (16 * t.i)) & 65535 AS band
      |  FROM sig CROSS JOIN range(0, 4) AS t(i)),
      |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
      |    a.simhash AS ha, b.simhash AS hb
      |  FROM bands a JOIN bands b ON a.i = b.i AND a.band = b.band AND a.doc < b.doc)""".stripMargin

  /** Shared SimHash CTE producing sig(doc, simhash) — mirrors
    * [[graft.dedup.Dedup.simHash]] value-for-value. `recursive = true`
    * emits a WITH RECURSIVE prefix for oracles that append a recursive
    * CTE (DuckDB allows non-recursive CTEs under it).
    */
  private def simhashCte(recursive: Boolean = false): String =
    (if (recursive) "WITH RECURSIVE " else "WITH ") +
    """tc AS (SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS cnt, md5(term) AS h
      |  FROM (SELECT doc_id AS doc, unnest(str_split(text, ' ')) AS term FROM documents)
      |  GROUP BY doc, term),
      |bits AS (SELECT doc, cnt, h, unnest(range(0, 64)) AS b FROM tc),
      |v AS (SELECT doc, b, cnt,
      |  CAST(strpos('0123456789abcdef', substring(h, CAST(b // 4 AS INT) + 1, 1)) - 1 AS BIGINT) AS hexv
      |  FROM bits),
      |c AS (SELECT doc, b, SUM(cnt * (((hexv >> (b % 4)) & 1) * 2 - 1)) AS s
      |  FROM v GROUP BY doc, b),
      |sig AS (SELECT doc, CAST(SUM(CASE WHEN s > 0 THEN (CASE WHEN b = 63
      |    THEN CAST(-9223372036854775808 AS BIGINT) ELSE (CAST(1 AS BIGINT) << b) END)
      |  ELSE 0 END) AS BIGINT) AS simhash
      |  FROM c GROUP BY doc)
      |""".stripMargin
}
