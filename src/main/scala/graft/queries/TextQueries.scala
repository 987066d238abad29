package graft.queries

import graft.multimodal.{MediaStore, Multimodal}
import graft.text.{Bpe, Curation, Dsir, Lexicons, Spell, TextAnalysis}
import graft.util.{Num, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text-analysis coverage (reference NLP chain, SURVEY.md §2.9, plus the
  * training-data-pipeline text ops) over `documents`.
  */
object TextQueries extends QueryPack {

  /** Fixed ranked merge list for `q_bpe_replay`, shared VERBATIM by the
    * Spark query and the DuckDB oracle (the oracle SQL interpolates this
    * val, so the two can never drift). Pairs cascade over the fixture
    * vocabulary — (t,h)→(th,e) and (t,a)→(ta,b) only fire after their
    * prerequisite merge — exercising multi-round rank interaction.
    */
  private val BpeMerges = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("e", "r"),
    ("s", "t"), ("o", "r"), ("t", "a"), ("ta", "b"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tokenize + explode — the reference's `explode(arrays_zip(...))`
    // (`Word_cloud_evaluation.ipynb` cell 13) in its Spark-native form.
    "q_tokenize" -> ((s, dir) =>
      TextAnalysis.tokens(Tables.documents(s, dir), "doc_id", "text")),

    // Word-frequency top-k ("trending jobs" word cloud, ipynb cells 22–24).
    "q_trending" -> ((s, dir) =>
      TextAnalysis.trending(Tables.documents(s, dir), "doc_id", "text",
        Lexicons.enStop, k = 20)),

    // Exact heavy hitters (count > N/30) via per-partition Misra–Gries
    // sketch + exact candidate recount — sketch-order-independent output.
    "q_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(Tables.documents(s, dir), "doc_id", "text", k = 30)),

    // Language ID via lexicon scoring.
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(s, Tables.documents(s, dir), "doc_id", "text",
        Lexicons.langLexicon)),

    // Quality metrics per document.
    "q_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text",
        Lexicons.enStop)),

    // Flesch reading-ease per document — three codegen regex counts,
    // zero shuffles; the readability band curation gate.
    "q_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir), "doc_id", "text")),

    // Map-typed column functions: per-doc term-frequency map assembled with
    // map_from_entries, probed with map_filter/map_values/aggregate, and
    // serialized sorted-by-key for engine-independent comparison.
    "q_map_funcs" -> ((s, dir) =>
      TextAnalysis.termCountMap(Tables.documents(s, dir), "doc_id", "text",
        minCount = 2L)),

    // Model-based quality score: sigmoid(w0 + w·features) over the quality
    // features — the fasttext-classifier stand-in after the rule gates.
    // Fixed demo coefficients; a trained model's slot in unchanged.
    "q_quality_model" -> ((s, dir) =>
      TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text",
        Lexicons.enStop, w0 = -3.0, wTtr = 4.0, wMeanLen = 0.2,
        wStop = -2.0, wLogTok = 0.3)),

    // Gopher-style rule-based quality gate (token bounds, mean token
    // length, stopword floor, repetition ceiling) as one shuffle-free
    // projection.
    "q_quality_gopher" -> ((s, dir) =>
      TextAnalysis.gopherQuality(Tables.documents(s, dir), "doc_id", "text")),

    // Content-defined chunking audit: boundaries where the trigram hash
    // ≡ 0 (mod 8) — insertion-robust chunking, as one pure projection.
    "q_cdc_chunks" -> ((s, dir) =>
      TextAnalysis.cdcChunks(Tables.documents(s, dir), "doc_id", "text",
        n = 3, modulus = 8)),

    // Term co-occurrence counts within a 3-token forward window, top 50 —
    // the PMI/embedding count table.
    "q_cooccur" -> ((s, dir) =>
      TextAnalysis.cooccurrence(Tables.documents(s, dir), "text", w = 3, k = 50)),

    // Token counting: whitespace vs BPE-ish regex.
    "q_token_count" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("re_tokens"),
        (size(split(col("text"), " ")) - 1).cast("long").as("n_bigrams"))
    }),

    // Document fingerprinting.
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")),

    // Array functions over token arrays (SURVEY §2.8: explode/arrays_zip/
    // element_at family).
    "q_array_ops" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        array_contains(toks, "spark").as("has_spark"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_join(slice(toks, 1, 5), " ").as("head5"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        element_at(array_sort(toks), 1).as("min_tok"))
    }),

    // Higher-order lambda functions over token arrays (transform / filter /
    // aggregate) — the codegen-friendly per-row functional surface that
    // repetition/chunking/IVF build on, exercised directly. The transform
    // output is serialized to a CSV string (array_join) because the driver's
    // comparison harness sorts result columns in pandas, which cannot order
    // array cells (round-2 `q_array_hof` err: unhashable numpy.ndarray).
    "q_array_hof" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        expr("array_join(transform(split(text, ' '), t -> CAST(length(t) AS STRING)), ',')")
          .as("tok_lens"),
        expr("CAST(size(filter(split(text, ' '), t -> length(t) > 4)) AS BIGINT)")
          .as("n_long"),
        expr("aggregate(split(text, ' '), CAST(0 AS BIGINT), (acc, t) -> acc + length(t))")
          .as("total_chars"))
    }),

    // Global concat-blob aggregation — the reference's word-cloud input
    // (`agg(concat_ws(" ", collect_list(col)))`, ipynb cell 23), made
    // deterministic by sorting the collected tokens (collect_list order is
    // partitioning-dependent).
    "q_text_blob" -> ((s, dir) => {
      TextAnalysis.tokens(Tables.documents(s, dir).filter(col("doc_id") < 10),
          "doc_id", "text")
        .groupBy(col("doc_id"))
        .agg(concat_ws(" ", array_sort(collect_list(col("term")))).as("blob"))
    }),

    // Dictionary lemmatization — the reference's Lemmatizer (AntBNC
    // dictionary, ipynb cell 9) as a broadcast lexicon join.
    "q_lemmatize" -> ((s, dir) => {
      import s.implicits._
      val lemmas = Seq(
        ("batches", "batch"), ("queries", "query"), ("tables", "table"),
        ("joins", "join"), ("windows", "window"), ("rows", "row"),
        ("keys", "key"), ("values", "value")).toDF("term", "lemma")
      TextAnalysis.tokens(Tables.documents(s, dir), "doc_id", "text")
        .join(broadcast(lemmas), Seq("term"), "left")
        .select(col("doc_id"),
          coalesce(col("lemma"), col("term")).as("lemma_term"))
        .groupBy(col("lemma_term"))
        .agg(count(lit(1)).cast("long").as("n"))
    }),

    // Approximate distinct (HLL sketch). The raw estimate is engine-specific
    // (Spark HLL++ vs DuckDB's sketch), so the hash-checked contract is a
    // tolerance bound: the query emits the EXACT distinct count plus a flag
    // asserting the rsd=0.01 sketch landed within 5% (5σ) of it; the oracle
    // recomputes the exact count and asserts the flag TRUE. A broken sketch
    // (or a broken tolerance) flips the flag and fails the hash gate.
    "q_approx_distinct" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("source"))
        .agg(approx_count_distinct(col("term"), rsd = 0.01).as("__approx"),
          countDistinct(col("term")).as("exact_terms"))
        .select(col("source"), col("exact_terms"),
          (abs(col("__approx") - col("exact_terms")).cast("double") /
            col("exact_terms").cast("double") <= 0.05).as("approx_within_5pct"))
    }),

    // POS tagging (reference §2.9 pretrained-tagger stage, public rule
    // algorithm): closed-class lexicon + suffix heuristics per token, plus
    // the downstream shape POS exists for — the noun-ish word-cloud filter.
    "q_pos_tag" -> ((s, dir) =>
      TextAnalysis.posTag(s, Tables.documents(s, dir), "doc_id", "text")
        .groupBy(col("pos"))
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          countDistinct(col("term")).as("n_terms"))),

    // Spell correction (reference §2.9 NorvigSweeting stage, public
    // algorithm): deterministic distance-1 typos (first token + 'x' on
    // every 97th doc) corrected against the corpus vocabulary via the
    // SymSpell delete-key join.
    "q_spell_correct" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = TextAnalysis.tokens(docs, "doc_id", "text")
        .groupBy(col("term")).agg(count(lit(1)).cast("long").as("freq"))
      // text IS NOT NULL on both sides: Spark's concat(NULL, 'x') is NULL
      // while DuckDB's concat skips NULL args — the guard keeps the
      // engines' suspect sets identical on corpora with null text
      val suspects = docs.filter(col("doc_id") % 97 === 0 && col("text").isNotNull)
        .select(col("doc_id").as("id"),
          concat(get(split(col("text"), " "), lit(0)), lit("x")).as("typo"))
      Spell.correct(vocab, suspects).withColumnRenamed("id", "doc_id")
    }),

    // Within-doc repetition ratio (Gopher-style boilerplate signal) — a
    // pure projection, no shuffle.
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(Tables.documents(s, dir), "doc_id", "text", n = 2)),

    // Sliding-window token chunking (training-sequence prep): 32-token
    // chunks, stride 16.
    "q_chunking" -> ((s, dir) =>
      TextAnalysis.chunks(Tables.documents(s, dir), "doc_id", "text",
        chunkSize = 32, stride = 16)),

    // Language-model bigram count table, top-50.
    "q_bigrams" -> ((s, dir) =>
      TextAnalysis.ngramCounts(Tables.documents(s, dir), "text", n = 2, k = 50)),

    // Chunk→sequence packing per source shard: 32/16 stride chunks packed
    // into 48-token training sequences (window partitioned by shard — no
    // global sort; see TextAnalysis.packChunks scale note).
    "q_pack_sequences" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ch = TextAnalysis.chunks(docs, "doc_id", "text",
          chunkSize = 32, stride = 16)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      TextAnalysis.packChunks(ch, "source",
          Seq(col("doc_id"), col("chunk_id")), "n_chunk_tokens", budget = 48)
        .select(col("source"), col("doc_id"), col("chunk_id"),
          col("n_chunk_tokens"), col("seq_id"))
    }),

    // Per-document TF-IDF top-3 keywords (smoothed IDF, round6+term
    // tiebreak so the ranking is engine-independent).
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir), "doc_id", "text", k = 3)),

    // Vocabulary head / Zipf audit: top-100 terms with rank and cumulative
    // corpus coverage.
    "q_vocab_zipf" -> ((s, dir) =>
      TextAnalysis.vocabStats(Tables.documents(s, dir), "doc_id", "text", k = 100)),

    // PII scrub: deterministic synthetic PII (an email + a 555 phone per
    // doc) injected, then counted and redacted. concat_ws on both sides —
    // it skips NULLs identically in Spark and DuckDB (plain concat does
    // not: Spark nulls out, DuckDB skips).
    "q_pii_redact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), concat_ws(" ", col("text"),
          concat(lit("user"), col("doc_id").cast("string"), lit("@mail.com")),
          concat(lit("555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(TextAnalysis.EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("t"), lit(TextAnalysis.PhoneRe)).cast("long").as("n_phones"),
          md5(TextAnalysis.redactPii(col("t"))).as("redacted_md5"))
    }),

    // Checksum-verified card-number detection: a deterministic 16-digit
    // candidate is injected per doc (the corpus carries no digits), the
    // regex finds it, and Luhn verification separates real card shapes
    // from arbitrary digit runs — the anti-over-redaction step.
    "q_pii_luhn" -> ((s, dir) => {
      val card = concat(
        lpad(((col("doc_id") * 7919) % 1000000000000000L).cast("string"), 15, "0"),
        (col("doc_id") % 10).cast("string"))
      Tables.documents(s, dir)
        .select(col("doc_id"), concat_ws(" ", col("text"), card).as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit("\\b\\d{16}\\b")).cast("long").as("n_candidates"),
          TextAnalysis.luhnMod(regexp_extract(col("t"), "\\b(\\d{16})\\b", 1))
            .cast("long").as("luhn_mod"))
        .withColumn("luhn_valid", col("luhn_mod") === 0L)
    }),

    // Deterministic content-hash train/val/test split — reproducible across
    // engines/partitionings, unlike rand()-based randomSplit.
    "q_sample_split" -> ((s, dir) =>
      graft.operators.Relational.hashSplit(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id")),

    // Deterministic stratified sampling: per-language keep rates over the
    // id-hash bucket (sampleBy without rand() — reproducible across runs,
    // engines and repartitions).
    "q_stratified" -> ((s, dir) =>
      graft.operators.Relational.stratifiedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        rates = Map("en" -> 40, "zh" -> 80), defaultPct = 25)),

    // Deterministic per-language reservoir: exactly 25 docs per lang by
    // content-hash priority — fixed-budget exemplar pulls, reproducible
    // across engines and partitionings.
    "q_reservoir" -> ((s, dir) =>
      graft.operators.Relational.reservoirSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", k = 25)),

    // Continuous weighted sampling: survival probability n_chars/800
    // (capped at 1) — soft quality filtering, hash-deterministic, integer
    // keep test, zero shuffle.
    "q_weighted_sample" -> ((s, dir) =>
      graft.operators.Relational.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", least(col("n_chars"), lit(800L)), den = 800L)),

    // Smoothed bigram LM table: P(b|a) with add-0.5 smoothing, top 50.
    "q_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLm(Tables.documents(s, dir), "text",
        k = 0.5, topK = 50)),

    // PMI collocations: top multi-word-expression candidates (count
    // floor kills hapax noise).
    "q_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, dir), "text",
        minCount = 5L, k = 20)),

    // Heaps-law vocabulary growth over the bigram vocabulary: new types
    // per corpus decile (attributed to their FIRST document) + the
    // cumulative curve — "is the vocabulary saturating?".
    "q_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(Tables.documents(s, dir), "doc_id", "text")),

    // Per-doc perplexity under the corpus bigram LM — the LM-based quality
    // filter (fluency under the corpus distribution).
    "q_bigram_ppl" -> ((s, dir) =>
      TextAnalysis.bigramPerplexity(Tables.documents(s, dir), "doc_id", "text",
        k = 0.5)),

    // Per-doc token-distribution entropy — repetition/diversity signal.
    "q_entropy" -> ((s, dir) =>
      TextAnalysis.tokenEntropy(Tables.documents(s, dir), "doc_id", "text")),

    // Uniform-mixture token allocation per source (integer plan).
    "q_mixture" -> ((s, dir) =>
      Curation.mixturePlan(Tables.documents(s, dir), "source", "text")),

    // Execute the mixture plan: hash-ordered docs until each source's
    // planned budget fills.
    "q_mixture_sample" -> ((s, dir) =>
      Curation.mixtureSample(Tables.documents(s, dir), "source", "doc_id", "text")),

    // Non-uniform mixture: integer "parts" weights per source (here a
    // deterministic function of the source name so every SF exercises the
    // same ratios), broadcast as a dim table.
    "q_mixture_weighted" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // try_cast + coalesce(0): a source not shaped like 'srcN' gets
      // parts = 0 (excluded) on BOTH engines instead of a NULL that the
      // Spark side coalesces but the oracle would propagate
      val parts = docs.select(col("source")).distinct()
        .select(col("source"),
          coalesce(expr("TRY_CAST(substring(source, 4) AS BIGINT)") % 4 + 1,
            lit(0L)).as("parts"))
      Curation.mixturePlanWeighted(docs, "source", "text", parts)
    }),

    // α=0.5 mixture: sqrt-weighted parts (the multilingual up-weighting
    // rule), integer allocation — sqrt is correctly rounded IEEE so the
    // plan is engine-exact.
    "q_mixture_alpha" -> ((s, dir) =>
      Curation.mixturePlanAlpha(Tables.documents(s, dir), "source", "text")),

    // Deterministic source-interleaved ordering (the pre-packing "global
    // shuffle"): per-source hash rank + hash key = the global sort order,
    // no unpartitioned window anywhere.
    "q_interleave" -> ((s, dir) =>
      Curation.interleaveOrder(Tables.documents(s, dir), "source", "doc_id")
        .select(col("doc_id"), col("source"), col("intl_rank"), col("intl_key"))),

    // OOV audit against the corpus top-30 vocabulary.
    "q_oov" -> ((s, dir) =>
      TextAnalysis.oovAudit(Tables.documents(s, dir), "doc_id", "text",
        vocabSize = 30)),

    // Per-source KL divergence from the corpus term distribution —
    // the domain-shift signal for mixture weighting.
    "q_kl_source" -> ((s, dir) =>
      TextAnalysis.sourceKl(Tables.documents(s, dir), "source", "text")),

    // TextRank keyword extraction: 3 PageRank rounds over the token
    // co-occurrence graph, top 20 terms.
    "q_textrank" -> ((s, dir) =>
      TextAnalysis.textRank(Tables.documents(s, dir), "text",
        damping = 0.85, teleport = 0.15, iters = 3, topK = 20)),

    // End-to-end curation pipeline: dedup survivors → predicted-English →
    // ttr quality gate → highest-quality docs until a 2500-token budget.
    // The composition every pretraining data pipeline runs, as one plan.
    "q_curation" -> ((s, dir) =>
      Curation.curate(s, Tables.documents(s, dir), "doc_id", "text",
        lang = "en", minTtr = 0.5, tokenBudget = 2500L)),

    // The NEAR-dup curation entry point: survivors are the connected-
    // component representatives of the SimHash near-dup graph (not just
    // byte-identical dedup), then the same lang → quality → budget chain.
    // The oracle composes the clusters transitive closure with the
    // curation chain, so both curate entry points are hash-gated.
    "q_curation_neardup" -> ((s, dir) =>
      Curation.curateNearDupPairs(s, Tables.documents(s, dir),
        graft.dedup.Dedup.simHashPairsFromSig(
          graft.dedup.SimHashStore.ensureBuilt(s, dir), maxHamming = 3),
        "doc_id", "text", lang = "en", minTtr = 0.5, tokenBudget = 2500L)),

    // BPE merge REPLAY (Bpe.tokenize) with a fixed ranked merge list —
    // the distributed encode loop oracle-gated end-to-end: per round every
    // word fuses its best-rank applicable pair (greedy L2R non-overlap)
    // until none applies. The list cascades ((t,h)→(th,e); (t,a)→(ta,b))
    // so multi-round rank interaction is exercised, not just one pass.
    "q_bpe_replay" -> ((s, dir) =>
      Bpe.tokenize(Tables.documents(s, dir), "doc_id", "text", BpeMerges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws(" ", col("tokens")).as("toks"))),

    // Multimodal column plumbing: opaque bytes + typed metadata. The decode
    // step for real image/audio lives in graft.multimodal (stubbed); here the
    // binary-column handling itself is exercised end-to-end.
    "q_multimodal_meta" -> ((s, dir) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(bin).cast("long").as("n_bytes"),
        sha2(bin, 256).as("digest"),
        md5(bin).as("checksum"))
    }),

    // REAL image pipeline: deterministic real PNGs (dims are pure
    // functions of doc_id) → PngCodec decode → exact integer box-filter
    // resize to fit 32 → re-encode → round-trip self-check. The oracle
    // pins the dims and the fit rule; thumb_ok=TRUE asserts the full
    // codec round trip succeeded in the engine.
    // Image dedup on DECODED CONTENT over a MIXED-FORMAT library:
    // documents reference a 17-asset image library (asset = doc_id % 17),
    // each doc carrying its asset in one of THREE real wire formats by
    // doc_id % 3 — PNG, baseline JPEG, GIF (all pure-JVM codecs) — same
    // source gradient per asset. Duplicates group by md5 OF THE DECODED
    // PIXELS (codegen over the decode seam), which file-byte hashing
    // cannot do once encoders differ. PNG and GIF are both lossless, so
    // their copies of an asset MERGE into one cross-format group — the
    // case that proves content-level identity; JPEG's lossy-but-
    // deterministic plane (StrictMath codec) forms the asset's second
    // group. The oracle replays that congruence analytically — a decode
    // or hash drift splits/merges a group and fails the compare.
    "q_image_dedup" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
          (col("doc_id") % 17).cast("long").as("img_id"))
        .withColumn("w", (col("img_id") % 64 + 16).cast("long"))
        .withColumn("h", (col("img_id") % 32 + 9).cast("long"))
      val png = Multimodal
        .syntheticPng(base.filter(col("doc_id") % 3 === 0), "img_id", "w", "h",
          outCol = "blob")
      val jpg = Multimodal
        .syntheticJpeg(base.filter(col("doc_id") % 3 === 1), "img_id", "w", "h",
          outCol = "blob")
      val gif = Multimodal
        .syntheticGif(base.filter(col("doc_id") % 3 === 2), "img_id", "w", "h",
          outCol = "blob")
      Multimodal.decodePixels(png.unionByName(jpg).unionByName(gif), "blob")
        .where(col("pix_ok"))
        .groupBy(md5(col("pix")).as("pixel_md5"), col("pix_w"), col("pix_h"))
        .agg(Num.cnt.as("n_copies"), min(col("doc_id")).as("rep_doc"))
        .select(col("pix_w"), col("pix_h"), col("n_copies"), col("rep_doc"))
    }),

    // REAL video-style frame sampling: deterministic animated GIFs
    // (doc_id % 5 + 2 frames of the per-frame gradient
    // (7x + 13y + id + 17f) mod 251) → GifCodec.decodeFrames (full GIF89a
    // animation compositing) → keep every 2nd frame → per-frame pixel sum
    // via the codegen graft_bytes_u8 expression. The oracle replays the
    // gradient per sampled frame analytically, so the whole
    // encode→LZW→composite→sample→sum chain must be pixel-exact; the
    // pinned delay column additionally pins graphic-control parsing.
    "q_gif_frames" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        (col("doc_id") % 24 + 8).cast("long").as("w"),
        (col("doc_id") % 16 + 6).cast("long").as("h"),
        (col("doc_id") % 5 + 2).cast("long").as("nf"))
      val gif = MediaStore.ensure(s, dir, "gif-anim")(
        Multimodal.syntheticGifAnimation(base, "doc_id", "w", "h", "nf"))
      graft.expressions.GraftFunctions.register(s)
      Multimodal.gifFrames(gif, "gif", every = 2)
        .where(col("frame_idx") >= 0)
        .select(col("doc_id"), col("frame_idx"), col("frame_delay_cs"),
          col("frame_w"), col("frame_h"),
          aggregate(call_function("graft_bytes_u8", col("frame")),
            lit(0L), (acc, x) => acc + x.cast("long")).as("pix_sum"))
    }),

    // REAL video-CONTAINER frame sampling: deterministic MJPEG AVIs
    // (RIFF avih/strl/movi/idx1 wrapping per-frame baseline JPEGs from
    // the engine's own T.81 encoder) → AviCodec RIFF walk → JpegCodec
    // per-frame decode → every 2nd frame → per-frame pixel sum via
    // codegen graft_bytes_u8. Frames are FLAT at quality 100 (unit
    // quant ⇒ pixel-exact round trip, JpegCodecSpec-pinned), so the
    // oracle replays sums analytically: ((31·id + 17·f) mod 256)·w·h.
    // The whole mux→demux→entropy-decode→sample→sum chain must be exact.
    "q_avi_frames" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        (col("doc_id") % 28 + 8).cast("long").as("w"),
        (col("doc_id") % 18 + 6).cast("long").as("h"),
        (col("doc_id") % 5 + 2).cast("long").as("nf"))
      val avi = MediaStore.ensure(s, dir, "avi-anim")(
        Multimodal.syntheticAviAnimation(base, "doc_id", "w", "h", "nf"))
      graft.expressions.GraftFunctions.register(s)
      Multimodal.videoFrames(avi, "avi", every = 2)
        .where(col("frame_idx") >= 0)
        .select(col("doc_id"), col("frame_idx"), col("frame_delay_cs"),
          col("frame_w"), col("frame_h"),
          aggregate(call_function("graft_bytes_u8", col("frame")),
            lit(0L), (acc, x) => acc + x.cast("long")).as("pix_sum"))
    }),

    // Video near-dup DETECTION: frame-set Jaccard over decoded content
    // (frames as shingles). Fixture: families of 4 videos (fam =
    // doc_id / 4) share byte-identical gradient frames with
    // per-video lengths nf = doc_id % 5 + 2, so within-family pairs
    // have |∩| = min(nf) and Jaccard = min/max modulo cross-family
    // identity-class coincidences — which the oracle models EXACTLY via
    // the (w, h, slope_x, slope_y, intercept) frame-identity key the
    // fixture makes provably collision-free. The 0.5 threshold keeps
    // trimmed copies (4,6) and drops short-vs-long (2,6).
    "q_video_dedup" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        floor(col("doc_id") / 4).cast("long").as("fam"),
        (floor(col("doc_id") / 4) % 6 + 8).cast("long").as("w"),
        (floor(col("doc_id") / 4) % 4 + 6).cast("long").as("h"),
        (col("doc_id") % 5 + 2).cast("long").as("nf"))
      val gif = MediaStore.ensure(s, dir, "gif-fam")(
        Multimodal.syntheticGifFamilies(base, "fam", "w", "h", "nf"))
      Multimodal.videoNearDupPairs(gif, "doc_id", "gif", threshold = 0.5)
    }),

    // Shot-boundary detection over the VIDEO container path: two-scene
    // flat-frame AVIs (+2 gray per frame, +120 jump at nf/2; all values
    // < 256 so no wrap) through the same sceneCuts operator — within-
    // scene pair diffs are exactly 2·w·h, the cut pair exactly 122·w·h,
    // both engines compute identical integers.
    "q_scene_cuts_avi" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        (col("doc_id") % 20 + 6).cast("long").as("w"),
        (col("doc_id") % 12 + 5).cast("long").as("h"),
        (col("doc_id") % 4 + 4).cast("long").as("nf"))
      val avi = MediaStore.ensure(s, dir, "avi-scenes")(
        Multimodal.syntheticAviScenes(base, "doc_id", "w", "h", "nf"))
      Multimodal.sceneCuts(avi, "doc_id", "avi", threshold = 30L)
    }),

    // Shot-boundary detection over the SAME real animated-GIF machinery:
    // two-scene fixtures (slow +2/frame motion, +120 intensity jump at
    // nf/2) → per consecutive-frame-pair |Δpixel| sums (codegen zip_with
    // over graft_bytes_u8 views, lag over the per-doc window) → integer
    // threshold flag. Within-scene pairs diff ≈ 4 per pixel, the cut pair
    // ≈ 122–129 — threshold 30 separates decisively, and both engines
    // compute identical integers, so is_cut is exact, not a tolerance.
    "q_scene_cuts" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        (col("doc_id") % 20 + 6).cast("long").as("w"),
        (col("doc_id") % 12 + 5).cast("long").as("h"),
        (col("doc_id") % 4 + 4).cast("long").as("nf"))
      val gif = MediaStore.ensure(s, dir, "gif-scenes")(
        Multimodal.syntheticGifScenes(base, "doc_id", "w", "h", "nf"))
      Multimodal.sceneCuts(gif, "doc_id", "gif", threshold = 30L)
    }),

    "q_thumbnail" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        (col("doc_id") % 64 + 16).cast("long").as("w"),
        (col("doc_id") % 32 + 9).cast("long").as("h"))
      val png = Multimodal.syntheticPng(base, "doc_id", "w", "h")
      Multimodal.thumbnailPng(png, "png", maxDim = 32)
        .select(col("doc_id"), col("w"), col("h"),
          col("thumb_w"), col("thumb_h"), col("thumb_ok"))
    }),

    // REAL audio pipeline: wire-format 8-bit mono PCM WAV blobs built as
    // hex (samples are a pure function of doc_id), decoded back to
    // samples by pure Catalyst byte arithmetic, framed, and scored as
    // Σ(s−128)² energy — VAD/silence triage with zero UDF and zero
    // shuffle before the final frame rows. The oracle replays the sample
    // formula directly, so any decode drift fails the hash.
    "q_audio_energy" -> ((s, dir) => {
      def byteHex(c: Column, i: Int): Column =
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(lit(255L))), 2, "0")
      def le(c: Column, nb: Int): Column =
        concat((0 until nb).map(byteHex(c, _)): _*)
      val id = col("doc_id").cast("long")
      val n = id % 64 + 32
      val hexStr = concat(
        lit("52494646"), le(n + 36L, 4),                     // RIFF + size
        lit("57415645666D7420100000000100"),                 // WAVE fmt 16 PCM
        le(lit(1L), 2), le(lit(8000L), 4),                   // mono, 8 kHz
        le(lit(8000L), 4), le(lit(1L), 2), le(lit(8L), 2),   // byterate/align/8-bit
        lit("64617461"), le(n, 4),                           // data chunk
        concat_ws("", transform(sequence(lit(0L), n - 1),
          j => lpad(hex((id * 7 + j * 11) % 256), 2, "0"))))
      val wav = Tables.documents(s, dir)
        .select(col("doc_id"), unhex(hexStr).as("wav"))
      Multimodal.wavFrameEnergy(wav, "doc_id", "wav", frameSize = 16)
    }),

    // REAL media-format parsers over synthesized REAL-format blobs: one
    // JPEG/GIF/WAV/MP4/PNG wire-format blob per doc (format = doc_id % 5,
    // dims/rates derived from doc_id), built as hex and unhex'd. ALL five
    // parsers run on EVERY blob — the four wrong-format parsers must
    // return invalid (no false positives), the right one must read the
    // same fields the oracle extracts with its own endian byte arithmetic
    // (incl. the JPEG marker walk and MP4 box walk as recursive CTEs).
    "q_media_meta" -> ((s, dir) => {
      def byteHex(c: Column, i: Int): Column =
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(lit(255L))), 2, "0")
      def be(c: Column, n: Int): Column =
        concat((n - 1 to 0 by -1).map(byteHex(c, _)): _*)
      def le(c: Column, n: Int): Column =
        concat((0 until n).map(byteHex(c, _)): _*)
      val id = col("doc_id").cast("long")
      val w = id % 200 + 16
      val h = id % 100 + 9
      val ch = id % 2 + 1
      val rate = (id % 4 + 1) * 8000
      val bits = (id % 2 + 1) * 8
      val bp = id % 2 + 1 // bytes per sample
      val dlen = id % 16
      val jpegHex = concat(
        lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
        be(h, 2), be(w, 2), lit("03011100021101031101FFD9"))
      val gifHex = concat(lit("474946383961"), le(w, 2), le(h, 2), lit("F70000"))
      val wavHex = concat(lit("52494646"), le(dlen + 36, 4),
        lit("57415645666D7420100000000100"), le(ch, 2), le(rate, 4),
        le(rate * ch * bp, 4), le(ch * bp, 2), le(bits, 2),
        lit("64617461"), le(dlen, 4), expr("repeat('00', CAST(doc_id % 16 AS INT))"))
      val mp4Hex = concat(lit("000000106674797069736F6D00000000"),
        lit("0000000866726565"), lit("000000006D646174"),
        expr("repeat('00', CAST(doc_id % 32 AS INT))"))
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        be(w, 4), be(h, 4), lit("080600000000000000"))
      val blobHex = when(id % 5 === 0, jpegHex).when(id % 5 === 1, gifHex)
        .when(id % 5 === 2, wavHex).when(id % 5 === 3, mp4Hex).otherwise(pngHex)
      Tables.documents(s, dir)
        .select(col("doc_id"), unhex(blobHex).as("blob"))
        .select(col("doc_id"),
          Multimodal.jpegMeta(col("blob")).as("jpeg"),
          Multimodal.gifMeta(col("blob")).as("gif"),
          Multimodal.wavMeta(col("blob")).as("wav"),
          Multimodal.mp4Boxes(col("blob")).as("mp4"),
          Multimodal.pngMeta(col("blob")).as("png"))
        .select(col("doc_id"),
          col("jpeg.width").as("jpeg_w"), col("jpeg.height").as("jpeg_h"),
          col("jpeg.valid").as("jpeg_ok"),
          col("gif.width").as("gif_w"), col("gif.height").as("gif_h"),
          col("gif.version").as("gif_ver"), col("gif.valid").as("gif_ok"),
          col("wav.n_channels").as("wav_ch"), col("wav.sample_rate").as("wav_rate"),
          col("wav.bits_per_sample").as("wav_bits"), col("wav.pcm").as("wav_pcm"),
          col("wav.valid").as("wav_ok"),
          col("mp4.n_boxes").as("mp4_n"),
          concat_ws(",", col("mp4.box_types")).as("mp4_types"),
          col("mp4.valid").as("mp4_ok"),
          col("png.width").as("png_w"), col("png.height").as("png_h"),
          col("png.bit_depth").as("png_depth"), col("png.color_type").as("png_color"),
          col("png.valid").as("png_ok"))
    }),

    // DSIR importance resampling (Xie et al. 2023): top-20 docs whose
    // hashed-bigram features look most like the English target slice vs
    // the raw pool — reference-corpus-relative curation.
    "q_dsir" -> ((s, dir) =>
      Dsir.selectTopK(Tables.documents(s, dir), "doc_id", "text",
          targetPred = col("lang") === "en", buckets = 4096, k = 20)
        .select(col("doc").as("doc_id"), col("n_features"), col("dsir_score")))
  )

  override def oracleSql: Map[String, String] = Map(
    "q_tokenize" ->
      "SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents",

    "q_trending" ->
      """WITH toks AS (SELECT unnest(str_split(text, ' ')) AS term FROM documents)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
        |WHERE term NOT IN ('the','a','an','and','of','to','in','is','that','it','for','on')
        |GROUP BY term ORDER BY n DESC, term ASC LIMIT 20""".stripMargin,

    "q_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(str_split(text, ' ')) AS term FROM documents
        |  WHERE text IS NOT NULL),
        |tot AS (SELECT COUNT(*) AS n FROM toks)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks, tot
        |GROUP BY term, tot.n HAVING COUNT(*) * 30 > tot.n""".stripMargin,

    "q_lang_id" ->
      """WITH lex(term, lang) AS (VALUES
        |  ('the','en'),('and','en'),('of','en'),('to','en'),('in','en'),
        |  ('is','en'),('that','en'),('it','en'),('for','en'),('on','en'),
        |  ('el','es'),('la','es'),('de','es'),('que','es'),('y','es'),
        |  ('en','es'),('un','es'),('los','es'),('se','es'),('por','es'),
        |  ('le','fr'),('et','fr'),('les','fr'),('des','fr'),('une','fr'),
        |  ('du','fr'),('est','fr'),('pour','fr'),('dans','fr'),('ce','fr'),
        |  ('der','de'),('die','de'),('und','de'),('das','de'),('von','de'),
        |  ('zu','de'),('mit','de'),('den','de'),('ein','de'),('ist','de'),
        |  ('的','zh'),('是','zh'),('在','zh'),('了','zh'),('我','zh'),
        |  ('有','zh'),('和','zh'),('不','zh'),('人','zh'),('这','zh')),
        |toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |m AS (SELECT t.doc_id, l.lang, CAST(COUNT(*) AS BIGINT) AS matches
        |      FROM toks t JOIN lex l ON t.term = l.term GROUP BY 1, 2),
        |best AS (SELECT doc_id, lang, matches FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY matches DESC, lang ASC) AS rn FROM m) WHERE rn = 1)
        |SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang,
        |  coalesce(b.matches, 0) AS matches
        |FROM documents d LEFT JOIN best b USING (doc_id)""".stripMargin,

    "q_quality_model" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |q AS (SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(CAST(COUNT(DISTINCT term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr,
        |  round(CAST(SUM(length(term)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tok_len,
        |  round(CAST(SUM(CASE WHEN term IN ('the','a','an','and','of','to','in','is','that','it','for','on') THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS stop_ratio
        |FROM toks GROUP BY doc_id),
        |z AS (SELECT doc_id, CAST(round(
        |    CAST(-3.0 AS DECIMAL(20,6))
        |    + CAST(4.0 AS DECIMAL(20,6)) * CAST(ttr AS DECIMAL(20,6))
        |    + CAST(0.2 AS DECIMAL(20,6)) * CAST(mean_tok_len AS DECIMAL(20,6))
        |    + CAST(-2.0 AS DECIMAL(20,6)) * CAST(stop_ratio AS DECIMAL(20,6))
        |    + CAST(0.3 AS DECIMAL(20,6)) * CAST(round(ln(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(20,6)),
        |  6) AS DOUBLE) AS logit
        |FROM q)
        |SELECT doc_id, logit,
        |  round(1.0 / (1.0 + exp(-logit)), 6) AS score,
        |  round(1.0 / (1.0 + exp(-logit)), 6) >= 0.5 AS keep
        |FROM z""".stripMargin,

    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(greatest(n_sentences, 1) AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)),
        |    6) AS fre
        |FROM c""".stripMargin,

    "q_quality" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT term) AS BIGINT) AS n_uniq,
        |  round(CAST(COUNT(DISTINCT term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr,
        |  round(CAST(SUM(length(term)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tok_len,
        |  round(CAST(SUM(CASE WHEN term IN ('the','a','an','and','of','to','in','is','that','it','for','on') THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS stop_ratio
        |FROM toks GROUP BY doc_id""".stripMargin,

    "q_map_funcs" ->
      """WITH tc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)
        |  GROUP BY doc_id, term)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |  COALESCE(string_agg(CASE WHEN cnt >= 2 THEN term || ':' || cnt END,
        |    ',' ORDER BY term), '') AS repeated_terms
        |FROM tc GROUP BY doc_id""".stripMargin,

    "q_quality_gopher" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / len(str_split(text, ' ')), 6) AS mean_tok_len,
        |    round(CAST(len(list_filter(str_split(text, ' '),
        |        t -> t IN ('the','a','an','and','of','to','in','is','that','it','for','on'))) AS DOUBLE)
        |      / len(str_split(text, ' ')), 6) AS stop_frac,
        |    round(CAST(list_max(list_transform(list_distinct(str_split(text, ' ')),
        |        d -> len(list_filter(str_split(text, ' '), x -> x = d)))) AS DOUBLE)
        |      / len(str_split(text, ' ')), 6) AS max_word_frac
        |  FROM documents)
        |SELECT doc_id, n_tokens, mean_tok_len, stop_frac, max_word_frac,
        |  n_tokens BETWEEN 30 AND 100000 AS ok_len,
        |  mean_tok_len BETWEEN 4.0 AND 6.0 AS ok_tok_len,
        |  stop_frac >= 0.02 AS ok_stop,
        |  max_word_frac <= 0.15 AS ok_rep,
        |  (n_tokens BETWEEN 30 AND 100000) AND (mean_tok_len BETWEEN 4.0 AND 6.0)
        |    AND stop_frac >= 0.02 AND max_word_frac <= 0.15 AS pass
        |FROM m""".stripMargin,

    "q_cdc_chunks" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(0, len(toks) - 2),
        |      i -> array_to_string(toks[i+1:i+3], ' '))
        |    ELSE []::VARCHAR[] END AS grams FROM t),
        |b AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |    CAST(len(list_filter(grams,
        |      g -> CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) % 8 = 0)) AS BIGINT) AS n_boundaries
        |  FROM g)
        |SELECT doc_id, n_grams, n_boundaries,
        |  n_boundaries + 1 AS n_chunks
        |FROM b""".stripMargin,

    "q_cooccur" ->
      """WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |i AS (SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM t),
        |p AS (SELECT toks[i+1] AS a,
        |    unnest(toks[i+2 : least(i+4, len(toks))]) AS b FROM i)
        |SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p GROUP BY a, b
        |ORDER BY n DESC, a, b LIMIT 50""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS re_tokens,
        |  CAST(len(str_split(text, ' ')) - 1 AS BIGINT) AS n_bigrams
        |FROM documents""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256,
        |  md5(array_to_string(list_sort(str_split(lower(text), ' ')), ' ')) AS fp_bow
        |FROM documents""".stripMargin,

    "q_array_ops" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  list_contains(str_split(text, ' '), 'spark') AS has_spark,
        |  str_split(text, ' ')[1] AS first_tok,
        |  str_split(text, ' ')[-1] AS last_tok,
        |  array_to_string(str_split(text, ' ')[1:5], ' ') AS head5,
        |  CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  list_sort(str_split(text, ' '))[1] AS min_tok
        |FROM documents""".stripMargin,

    "q_text_blob" ->
      """SELECT doc_id, string_agg(term, ' ' ORDER BY term) AS blob
        |FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
        |      WHERE doc_id < 10)
        |GROUP BY doc_id""".stripMargin,

    "q_lemmatize" ->
      """WITH lem(term, lemma) AS (VALUES
        |  ('batches','batch'),('queries','query'),('tables','table'),
        |  ('joins','join'),('windows','window'),('rows','row'),
        |  ('keys','key'),('values','value')),
        |toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)
        |SELECT coalesce(l.lemma, t.term) AS lemma_term, CAST(COUNT(*) AS BIGINT) AS n
        |FROM toks t LEFT JOIN lem l ON t.term = l.term
        |GROUP BY coalesce(l.lemma, t.term)""".stripMargin,

    "q_array_hof" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(str_split(text, ' '), t -> length(t)), ',') AS tok_lens,
        |  CAST(len(list_filter(str_split(text, ' '), t -> length(t) > 4)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(str_split(text, ' '), t -> length(t))) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin,

    "q_pos_tag" ->
      """WITH lex(term, pos) AS (VALUES
        |  ('the','DT'),('a','DT'),('an','DT'),('this','DT'),('that','DT'),
        |  ('and','CC'),('or','CC'),('but','CC'),
        |  ('of','IN'),('to','IN'),('in','IN'),('for','IN'),('on','IN'),
        |  ('at','IN'),('by','IN'),('with','IN'),('from','IN'),
        |  ('is','VB'),('are','VB'),('was','VB'),('were','VB'),('be','VB'),
        |  ('it','PRP'),('he','PRP'),('she','PRP'),('they','PRP'),
        |  ('we','PRP'),('i','PRP'),('you','PRP')),
        |toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |tagged AS (SELECT t.doc_id, t.term,
        |  coalesce(l.pos, CASE
        |    WHEN t.term LIKE '%ing' THEN 'VBG'
        |    WHEN t.term LIKE '%ed' THEN 'VBD'
        |    WHEN t.term LIKE '%ly' THEN 'RB'
        |    WHEN t.term LIKE '%s' AND length(t.term) > 3 THEN 'NNS'
        |    ELSE 'NN' END) AS pos
        |  FROM toks t LEFT JOIN lex l ON t.term = l.term)
        |SELECT pos, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
        |FROM tagged GROUP BY pos""".stripMargin,

    "q_spell_correct" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY term),
        |susp AS (SELECT doc_id, concat(str_split(text, ' ')[1], 'x') AS typo
        |  FROM documents WHERE doc_id % 97 = 0 AND text IS NOT NULL),
        |known AS (SELECT s.doc_id, s.typo, s.typo AS corrected, v.freq
        |  FROM susp s JOIN vocab v ON s.typo = v.term),
        |cand AS (SELECT s.doc_id, s.typo, v.term AS corrected, v.freq
        |  FROM susp s JOIN vocab v ON levenshtein(s.typo, v.term) <= 1
        |  WHERE NOT EXISTS (SELECT 1 FROM vocab k WHERE k.term = s.typo)),
        |best AS (SELECT doc_id, typo, corrected, freq FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id, typo
        |    ORDER BY freq DESC, corrected ASC) AS rn FROM cand) WHERE rn = 1)
        |SELECT doc_id, typo, corrected, freq FROM best
        |UNION ALL SELECT doc_id, typo, corrected, freq FROM known""".stripMargin,

    "q_repetition" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id,
        |  list_transform(range(0, len(toks) - 1), i -> array_to_string(toks[i+1:i+2], ' ')) AS grams
        |  FROM t)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_uniq_grams,
        |  round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE), 6) AS rep_ratio
        |FROM g""".stripMargin,

    "q_chunking" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 16)) AS i FROM t)
        |SELECT doc_id, CAST(i // 16 AS BIGINT) AS chunk_id,
        |  array_to_string(toks[i+1:i+32], ' ') AS chunk_text,
        |  CAST(least(32, len(toks) - i) AS BIGINT) AS n_chunk_tokens
        |FROM s""".stripMargin,

    "q_bigrams" ->
      """WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |g AS (SELECT unnest(list_transform(range(0, len(toks) - 1),
        |    i -> array_to_string(toks[i+1:i+2], ' '))) AS gram FROM t)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM g GROUP BY gram
        |ORDER BY n DESC, gram ASC LIMIT 50""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source, str_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, source, toks, unnest(range(0, len(toks), 16)) AS i FROM t),
        |ch AS (SELECT source, doc_id, CAST(i // 16 AS BIGINT) AS chunk_id,
        |    CAST(least(32, len(toks) - i) AS BIGINT) AS n_chunk_tokens FROM s)
        |SELECT source, doc_id, chunk_id, n_chunk_tokens,
        |  CAST(COALESCE(SUM(n_chunk_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id, chunk_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 48 AS BIGINT) AS seq_id
        |FROM ch""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY doc_id, term),
        |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |    round(CAST(tf.tf AS DOUBLE) * ln((n.nn + 1.0) / (CAST(dfq.df AS DOUBLE) + 1.0)), 6) AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |rk AS (SELECT doc_id, term, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term ASC) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, score, rnk FROM rk WHERE rnk <= 3""".stripMargin,

    "q_vocab_zipf" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |f AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY term),
        |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM f),
        |topk AS (SELECT term, n FROM f ORDER BY n DESC, term ASC LIMIT 100)
        |SELECT term, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS BIGINT) AS rnk,
        |  round(CAST(SUM(n) OVER (ORDER BY n DESC, term ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / t, 6) AS cum_frac
        |FROM topk CROSS JOIN tot""".stripMargin,

    "q_pii_redact" ->
      """WITH aug AS (SELECT doc_id, concat_ws(' ', text,
        |    concat('user', CAST(doc_id AS VARCHAR), '@mail.com'),
        |    concat('555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
        |FROM aug""".stripMargin,

    "q_pii_luhn" ->
      """WITH aug AS (SELECT doc_id, concat_ws(' ', text,
        |    lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR), 15, '0')
        |      || CAST(doc_id % 10 AS VARCHAR)) AS t FROM documents),
        |c AS (SELECT doc_id, t, str_split(regexp_extract(t, '\b(\d{16})\b', 1), '') AS ds
        |  FROM aug),
        |m AS (SELECT doc_id, t,
        |    CAST(list_sum(list_transform(range(1, len(ds) + 1), i ->
        |      CASE WHEN (len(ds) - i + 1) % 2 = 0 THEN
        |        CASE WHEN CAST(ds[i] AS INT) * 2 > 9 THEN CAST(ds[i] AS INT) * 2 - 9
        |             ELSE CAST(ds[i] AS INT) * 2 END
        |      ELSE CAST(ds[i] AS INT) END)) % 10 AS BIGINT) AS luhn_mod
        |  FROM c)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '\b\d{16}\b')) AS BIGINT) AS n_candidates,
        |  luhn_mod, (luhn_mod = 0) AS luhn_valid
        |FROM m""".stripMargin,

    "q_sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS h
        |  FROM documents)""".stripMargin,

    "q_stratified" ->
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS h
        |  FROM documents)
        |WHERE h < CASE lang WHEN 'en' THEN 40 WHEN 'zh' THEN 80 ELSE 25 END""".stripMargin,

    "q_reservoir" ->
      """SELECT doc_id, lang FROM (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY
        |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
        |    doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 25""".stripMargin,

    "q_weighted_sample" ->
      """SELECT doc_id, n_chars
        |FROM (SELECT doc_id, n_chars,
        |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1048576 AS h
        |  FROM documents)
        |WHERE h * 800 < least(n_chars, 800) * 1048576""".stripMargin,

    "q_bigram_lm" ->
      """WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |i AS (SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM t),
        |bi AS (SELECT toks[i+1] AS a, toks[i+2] AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM i GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ca FROM bi GROUP BY a),
        |v AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
        |  FROM (SELECT unnest(str_split(text, ' ')) AS term FROM documents))
        |SELECT bi.a, bi.b, bi.n,
        |  round((CAST(bi.n AS DOUBLE) + 0.5) / (CAST(ca.ca AS DOUBLE) + 0.5 * v.v), 6) AS p
        |FROM bi JOIN ca USING (a) CROSS JOIN v
        |ORDER BY bi.n DESC, bi.a, bi.b LIMIT 50""".stripMargin,

    "q_vocab_growth" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |i AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i FROM t),
        |fd AS (SELECT toks[i+1] AS a, toks[i+2] AS b, min(doc_id) AS fd
        |  FROM i GROUP BY 1, 2),
        |md AS (SELECT max(doc_id) AS md FROM documents),
        |d AS (SELECT least(CAST(floor(fd * 10 / (md + 1)) AS BIGINT), 9) AS decile,
        |    CAST(count(*) AS BIGINT) AS new_terms
        |  FROM fd, md GROUP BY 1)
        |SELECT decile, new_terms,
        |  CAST(SUM(new_terms) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_cum
        |FROM d""".stripMargin,

    "q_pmi" ->
      """WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |i AS (SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM t),
        |bi AS (SELECT toks[i+1] AS a, toks[i+2] AS b,
        |    CAST(COUNT(*) AS BIGINT) AS cxy FROM i GROUP BY 1, 2),
        |nb AS (SELECT CAST(SUM(cxy) AS DOUBLE) AS nb FROM bi),
        |uni AS (SELECT unnest(str_split(text, ' ')) AS w FROM documents),
        |u AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY w),
        |nu AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nu FROM uni)
        |SELECT bi.a, bi.b, bi.cxy,
        |  round(ln((CAST(bi.cxy AS DOUBLE) / nb.nb) /
        |    ((CAST(ua.cu AS DOUBLE) / nu.nu) * (CAST(ub.cu AS DOUBLE) / nu.nu))), 6) AS pmi
        |FROM bi
        |JOIN u ua ON bi.a = ua.w
        |JOIN u ub ON bi.b = ub.w
        |CROSS JOIN nu CROSS JOIN nb
        |WHERE bi.cxy >= 5
        |ORDER BY pmi DESC, bi.a ASC, bi.b ASC LIMIT 20""".stripMargin,

    "q_bigram_ppl" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |i AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i FROM t),
        |db AS (SELECT doc_id, toks[i+1] AS a, toks[i+2] AS b FROM i),
        |bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM db GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ca FROM bi GROUP BY a),
        |v AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
        |  FROM (SELECT unnest(str_split(text, ' ')) AS term FROM documents)),
        |lm AS (SELECT bi.a, bi.b,
        |    (CAST(bi.n AS DOUBLE) + 0.5) / (CAST(ca.ca AS DOUBLE) + 0.5 * v.v) AS p
        |  FROM bi JOIN ca USING (a) CROSS JOIN v),
        |g AS (SELECT db.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CAST(round(-log2(lm.p), 6) AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS su
        |  FROM db JOIN lm USING (a, b) GROUP BY db.doc_id)
        |SELECT doc_id, n_bigrams,
        |  CAST((2 * su + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS avg_nll_microbits,
        |  round(pow(2.0, CAST((2 * su + n_bigrams) // (2 * n_bigrams) AS DOUBLE)
        |    / 1000000.0), 6) AS ppl
        |FROM g""".stripMargin,

    "q_entropy" ->
      """WITH c AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  round(log2(CAST(SUM(c) AS DOUBLE)) -
        |    CAST(SUM(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS entropy
        |FROM c GROUP BY doc_id""".stripMargin,

    "q_mixture" ->
      """WITH ns AS (SELECT source,
        |    CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
        |    CAST(COUNT(*) AS BIGINT) AS g FROM ns)
        |SELECT ns.source, ns.n_tokens,
        |  CAST(tot.t // tot.g AS BIGINT) AS target_tokens,
        |  CAST(least(ns.n_tokens, tot.t // tot.g) AS BIGINT) AS planned_tokens,
        |  CAST(greatest(0, tot.t // tot.g - ns.n_tokens) AS BIGINT) AS deficit_tokens
        |FROM ns CROSS JOIN tot""".stripMargin,

    "q_mixture_weighted" ->
      """WITH ns AS (SELECT source,
        |    CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |wp AS (SELECT source, n_tokens,
        |    CAST(coalesce(TRY_CAST(substr(source, 4) AS BIGINT) % 4 + 1, 0) AS BIGINT) AS parts
        |  FROM ns),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
        |    CAST(SUM(parts) AS BIGINT) AS p FROM wp)
        |SELECT wp.source, wp.n_tokens, wp.parts,
        |  CAST(tot.t * wp.parts // tot.p AS BIGINT) AS target_tokens,
        |  CAST(least(wp.n_tokens, tot.t * wp.parts // tot.p) AS BIGINT) AS planned_tokens,
        |  CAST(greatest(0, tot.t * wp.parts // tot.p - wp.n_tokens) AS BIGINT) AS deficit_tokens
        |FROM wp CROSS JOIN tot""".stripMargin,

    "q_mixture_alpha" ->
      """WITH ns AS (SELECT source,
        |    CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |wp AS (SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS parts
        |  FROM ns),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
        |    CAST(SUM(parts) AS BIGINT) AS p FROM wp)
        |SELECT wp.source, wp.n_tokens, wp.parts,
        |  CAST(tot.t * wp.parts // tot.p AS BIGINT) AS target_tokens,
        |  CAST(least(wp.n_tokens, tot.t * wp.parts // tot.p) AS BIGINT) AS planned_tokens,
        |  CAST(greatest(0, tot.t * wp.parts // tot.p - wp.n_tokens) AS BIGINT) AS deficit_tokens
        |FROM wp CROSS JOIN tot""".stripMargin,

    "q_interleave" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS intl_rank,
        |  md5(CAST(doc_id AS VARCHAR)) AS intl_key
        |FROM documents""".stripMargin,

    "q_mixture_sample" ->
      """WITH ns AS (SELECT source,
        |    CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
        |    CAST(COUNT(*) AS BIGINT) AS g FROM ns),
        |plan AS (SELECT ns.source,
        |    CAST(least(ns.n_tokens, tot.t // tot.g) AS BIGINT) AS planned_tokens
        |  FROM ns CROSS JOIN tot),
        |d AS (SELECT source, doc_id,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(SUM(len(str_split(text, ' '))) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |SELECT d.source, d.doc_id, d.n_tokens, d.cum_tokens
        |FROM d JOIN plan USING (source)
        |WHERE d.cum_tokens <= plan.planned_tokens""".stripMargin,

    "q_oov" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |f AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY term),
        |vocab AS (SELECT term FROM f ORDER BY n DESC, term ASC LIMIT 30)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM toks t LEFT JOIN vocab v ON t.term = v.term
        |GROUP BY t.doc_id""".stripMargin,

    "q_kl_source" ->
      """WITH st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cst
        |  FROM (SELECT source, unnest(str_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS ns FROM st GROUP BY source),
        |ct AS (SELECT term, CAST(SUM(cst) AS BIGINT) AS ct FROM st GROUP BY term),
        |n AS (SELECT CAST(SUM(cst) AS BIGINT) AS n FROM st)
        |SELECT st.source, CAST(MAX(ns.ns) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CAST(round((CAST(st.cst AS DOUBLE) / CAST(ns.ns AS DOUBLE)) *
        |    log2(CAST(st.cst AS DOUBLE) * CAST(n.n AS DOUBLE)
        |      / (CAST(ns.ns AS DOUBLE) * CAST(ct.ct AS DOUBLE))), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE) AS kl_bits
        |FROM st JOIN ns USING (source) JOIN ct USING (term) CROSS JOIN n
        |GROUP BY st.source""".stripMargin,

    "q_textrank" ->
      """WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |i AS (SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM t),
        |p AS (SELECT toks[i+1] AS x, toks[i+2] AS y FROM i WHERE toks[i+1] <> toks[i+2]),
        |und AS (SELECT least(x, y) AS u, greatest(x, y) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |e0 AS (SELECT u AS src, v AS dst, n FROM und
        |  UNION ALL SELECT v AS src, u AS dst, n FROM und),
        |dg AS (SELECT src, CAST(SUM(n) AS BIGINT) AS deg FROM e0 GROUP BY src),
        |e AS (SELECT e0.src, e0.dst, e0.n, dg.deg FROM e0 JOIN dg USING (src)),
        |s0 AS (SELECT DISTINCT src AS term, CAST(1.0 AS DOUBLE) AS score FROM e),
        |s1 AS (SELECT e.dst AS term,
        |    round(0.15 + 0.85 * CAST(SUM(CAST(round(s0.score * CAST(e.n AS DOUBLE)
        |      / CAST(e.deg AS DOUBLE), 12) AS DECIMAL(38,12))) AS DOUBLE), 12) AS score
        |  FROM e JOIN s0 ON e.src = s0.term GROUP BY e.dst),
        |s2 AS (SELECT e.dst AS term,
        |    round(0.15 + 0.85 * CAST(SUM(CAST(round(s1.score * CAST(e.n AS DOUBLE)
        |      / CAST(e.deg AS DOUBLE), 12) AS DECIMAL(38,12))) AS DOUBLE), 12) AS score
        |  FROM e JOIN s1 ON e.src = s1.term GROUP BY e.dst),
        |s3 AS (SELECT e.dst AS term,
        |    round(0.15 + 0.85 * CAST(SUM(CAST(round(s2.score * CAST(e.n AS DOUBLE)
        |      / CAST(e.deg AS DOUBLE), 12) AS DECIMAL(38,12))) AS DOUBLE), 12) AS score
        |  FROM e JOIN s2 ON e.src = s2.term GROUP BY e.dst)
        |SELECT term, round(score, 6) AS score FROM s3
        |ORDER BY score DESC, term ASC LIMIT 20""".stripMargin,

    "q_curation" ->
      """WITH lex(term, lang) AS (VALUES
        |  ('the','en'),('and','en'),('of','en'),('to','en'),('in','en'),
        |  ('is','en'),('that','en'),('it','en'),('for','en'),('on','en'),
        |  ('el','es'),('la','es'),('de','es'),('que','es'),('y','es'),
        |  ('en','es'),('un','es'),('los','es'),('se','es'),('por','es'),
        |  ('le','fr'),('et','fr'),('les','fr'),('des','fr'),('une','fr'),
        |  ('du','fr'),('est','fr'),('pour','fr'),('dans','fr'),('ce','fr'),
        |  ('der','de'),('die','de'),('und','de'),('das','de'),('von','de'),
        |  ('zu','de'),('mit','de'),('den','de'),('ein','de'),('ist','de'),
        |  ('的','zh'),('是','zh'),('在','zh'),('了','zh'),('我','zh'),
        |  ('有','zh'),('和','zh'),('不','zh'),('人','zh'),('这','zh')),
        |toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |q AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(CAST(COUNT(DISTINCT term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr
        |  FROM toks GROUP BY doc_id),
        |m AS (SELECT t.doc_id, l.lang, COUNT(*) AS matches
        |  FROM toks t JOIN lex l ON t.term = l.term GROUP BY 1, 2),
        |best AS (SELECT doc_id, lang FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY matches DESC, lang ASC) AS rn FROM m) WHERE rn = 1),
        |lng AS (SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
        |  FROM documents d LEFT JOIN best b USING (doc_id)),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |f AS (SELECT q.doc_id, q.n_tokens, q.ttr
        |  FROM q JOIN keep USING (doc_id) JOIN lng USING (doc_id)
        |  WHERE pred_lang = 'en' AND ttr >= 0.5),
        |c AS (SELECT doc_id, n_tokens, ttr,
        |  CAST(SUM(n_tokens) OVER (ORDER BY ttr DESC, doc_id ASC) AS BIGINT) AS cum_tokens
        |  FROM f)
        |SELECT doc_id, n_tokens, ttr, cum_tokens FROM c WHERE cum_tokens <= 2500""".stripMargin,

    // Same lang/quality/budget chain as q_curation, but the keep set is the
    // SimHash connected-component representatives (DedupQueries' closure
    // CTEs; curation's cumulative CTE renamed cum — the simhash prefix
    // already defines a CTE named c).
    "q_curation_neardup" -> (DedupQueries.clustersCtePrefix +
      """, lex(term, lang) AS (VALUES
        |  ('the','en'),('and','en'),('of','en'),('to','en'),('in','en'),
        |  ('is','en'),('that','en'),('it','en'),('for','en'),('on','en'),
        |  ('el','es'),('la','es'),('de','es'),('que','es'),('y','es'),
        |  ('en','es'),('un','es'),('los','es'),('se','es'),('por','es'),
        |  ('le','fr'),('et','fr'),('les','fr'),('des','fr'),('une','fr'),
        |  ('du','fr'),('est','fr'),('pour','fr'),('dans','fr'),('ce','fr'),
        |  ('der','de'),('die','de'),('und','de'),('das','de'),('von','de'),
        |  ('zu','de'),('mit','de'),('den','de'),('ein','de'),('ist','de'),
        |  ('的','zh'),('是','zh'),('在','zh'),('了','zh'),('我','zh'),
        |  ('有','zh'),('和','zh'),('不','zh'),('人','zh'),('这','zh')),
        |toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |q AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(CAST(COUNT(DISTINCT term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr
        |  FROM toks GROUP BY doc_id),
        |m AS (SELECT t.doc_id, l.lang, COUNT(*) AS matches
        |  FROM toks t JOIN lex l ON t.term = l.term GROUP BY 1, 2),
        |best AS (SELECT doc_id, lang FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY matches DESC, lang ASC) AS rn FROM m) WHERE rn = 1),
        |lng AS (SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
        |  FROM documents d LEFT JOIN best b USING (doc_id)),
        |keep AS (SELECT d.doc_id FROM documents d
        |  LEFT JOIN minr mr ON d.doc_id = mr.u
        |  WHERE LEAST(d.doc_id, COALESCE(mr.mv, d.doc_id)) = d.doc_id),
        |f AS (SELECT q.doc_id, q.n_tokens, q.ttr
        |  FROM q JOIN keep USING (doc_id) JOIN lng USING (doc_id)
        |  WHERE pred_lang = 'en' AND ttr >= 0.5),
        |cum AS (SELECT doc_id, n_tokens, ttr,
        |  CAST(SUM(n_tokens) OVER (ORDER BY ttr DESC, doc_id ASC) AS BIGINT) AS cum_tokens
        |  FROM f)
        |SELECT doc_id, n_tokens, ttr, cum_tokens FROM cum WHERE cum_tokens <= 2500""".stripMargin),

    // Symbol sequences ride as chr(1)-wrapped strings (⟨SEP⟩sym⟨SEP⟩ per
    // symbol, so a pattern can never match across symbol boundaries and
    // adjacent occurrences never share characters); one replace() = the
    // greedy L2R non-overlapping fold; the recursive CTE = the per-word
    // best-rank round loop, exactly Bpe.tokenize's semantics.
    "q_bpe_replay" -> {
      val vals = BpeMerges.zipWithIndex
        .map { case ((l, r), i) => s"(${i + 1},'$l','$r')" }.mkString(",")
      s"""WITH RECURSIVE merges(rank, l, r) AS (VALUES $vals),
         |words AS (
         |  SELECT doc_id, wpos, w FROM (
         |    SELECT doc_id, unnest(str_split(text, ' ')) AS w,
         |      generate_subscripts(str_split(text, ' '), 1) AS wpos
         |    FROM documents) WHERE length(w) > 0),
         |vocab AS (SELECT DISTINCT w FROM words),
         |enc(w, s) AS (
         |  SELECT w, array_to_string(list_transform(str_split(w, ''),
         |    c -> chr(1)||c||chr(1)), '') FROM vocab
         |  UNION ALL
         |  SELECT e.w, replace(e.s, chr(1)||m.l||chr(1)||chr(1)||m.r||chr(1),
         |      chr(1)||m.l||m.r||chr(1))
         |  FROM (SELECT w, s,
         |      (SELECT min(mm.rank) FROM merges mm
         |        WHERE contains(s, chr(1)||mm.l||chr(1)||chr(1)||mm.r||chr(1))) AS br
         |    FROM enc) e
         |  JOIN merges m ON m.rank = e.br),
         |fin AS (
         |  SELECT w, s FROM enc e
         |  WHERE NOT EXISTS (SELECT 1 FROM merges mm
         |    WHERE contains(e.s, chr(1)||mm.l||chr(1)||chr(1)||mm.r||chr(1)))),
         |toks AS (
         |  SELECT w, trim(replace(s, chr(1)||chr(1), ' '), chr(1)) AS tok_str,
         |    CAST(len(str_split(trim(replace(s, chr(1)||chr(1), ' '), chr(1)), ' ')) AS BIGINT) AS n
         |  FROM fin)
         |SELECT doc_id, CAST(sum(t.n) AS BIGINT) AS n_tokens,
         |  string_agg(t.tok_str, ' ' ORDER BY wpos) AS toks
         |FROM words JOIN toks t USING (w)
         |GROUP BY doc_id""".stripMargin
    },

    "q_media_meta" ->
      """WITH RECURSIVE
        |gen AS (
        |  SELECT doc_id, CAST(doc_id AS BIGINT) % 5 AS fmt,
        |    CAST(doc_id AS BIGINT) % 200 + 16 AS w, CAST(doc_id AS BIGINT) % 100 + 9 AS h,
        |    CAST(doc_id AS BIGINT) % 2 + 1 AS ch, (CAST(doc_id AS BIGINT) % 4 + 1) * 8000 AS rate,
        |    (CAST(doc_id AS BIGINT) % 2 + 1) * 8 AS bits, CAST(doc_id AS BIGINT) % 2 + 1 AS bp,
        |    CAST(doc_id AS BIGINT) % 16 AS dlen, CAST(doc_id AS BIGINT) % 32 AS mlen
        |  FROM documents),
        |blobs AS (
        |  SELECT doc_id,
        |    CASE fmt
        |      WHEN 0 THEN 'FFD8FFE000104A46494600010100000100010000FFC0001108'
        |        || printf('%04X', h) || printf('%04X', w) || '03011100021101031101FFD9'
        |      WHEN 1 THEN '474946383961'
        |        || printf('%02X%02X', w % 256, w // 256) || printf('%02X%02X', h % 256, h // 256) || 'F70000'
        |      WHEN 2 THEN '52494646'
        |        || printf('%02X%02X%02X%02X', (36 + dlen) % 256, ((36 + dlen) // 256) % 256, 0, 0)
        |        || '57415645666D7420100000000100'
        |        || printf('%02X%02X', ch % 256, (ch // 256) % 256)
        |        || printf('%02X%02X%02X%02X', rate % 256, (rate // 256) % 256, (rate // 65536) % 256, (rate // 16777216) % 256)
        |        || printf('%02X%02X%02X%02X', (rate*ch*bp) % 256, ((rate*ch*bp) // 256) % 256, ((rate*ch*bp) // 65536) % 256, ((rate*ch*bp) // 16777216) % 256)
        |        || printf('%02X%02X', (ch*bp) % 256, ((ch*bp) // 256) % 256)
        |        || printf('%02X%02X', bits % 256, (bits // 256) % 256)
        |        || '64617461'
        |        || printf('%02X%02X%02X%02X', dlen % 256, (dlen // 256) % 256, 0, 0)
        |        || repeat('00', dlen)
        |      WHEN 3 THEN '000000106674797069736F6D00000000' || '0000000866726565'
        |        || '000000006D646174' || repeat('00', mlen)
        |      ELSE '89504E470D0A1A0A0000000D49484452'
        |        || printf('%08X', w) || printf('%08X', h) || '080600000000000000'
        |    END AS s
        |  FROM gen),
        |jwalk(doc_id, s, i, pos, w, h, done, bad) AS (
        |  SELECT doc_id, s, 0, CAST(3 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), false, false FROM blobs
        |  UNION ALL
        |  SELECT doc_id, s, i + 1,
        |    CASE WHEN done OR bad THEN pos
        |         WHEN m0 <> 255 OR m1 < 0 OR m1 = 217 OR m1 = 0 THEN pos
        |         WHEN m1 = 255 THEN pos + 1
        |         WHEN sof THEN pos
        |         WHEN standalone THEN pos + 2
        |         WHEN seglen < 2 THEN pos
        |         ELSE pos + 2 + seglen END,
        |    CASE WHEN done OR bad THEN w
        |         WHEN sof AND NOT (hh < 0 OR ww < 0) THEN ww ELSE -1 END,
        |    CASE WHEN done OR bad THEN h
        |         WHEN sof AND NOT (hh < 0 OR ww < 0) THEN hh ELSE -1 END,
        |    CASE WHEN done OR bad THEN done
        |         WHEN m0 <> 255 OR m1 < 0 OR m1 = 217 OR m1 = 0 THEN false
        |         WHEN m1 = 255 THEN false
        |         WHEN sof THEN NOT (hh < 0 OR ww < 0)
        |         ELSE false END,
        |    CASE WHEN done OR bad THEN bad
        |         WHEN m0 <> 255 OR m1 < 0 OR m1 = 217 OR m1 = 0 THEN true
        |         WHEN m1 = 255 THEN false
        |         WHEN sof THEN (hh < 0 OR ww < 0)
        |         WHEN standalone THEN false
        |         WHEN seglen < 2 THEN true
        |         ELSE false END
        |  FROM (
        |    SELECT *,
        |      CASE WHEN length(s) >= 2*pos THEN list_reduce(list_transform(string_split(substr(s, 2*pos - 1, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END AS m0,
        |      CASE WHEN length(s) >= 2*(pos+1) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 1, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END AS m1,
        |      (CASE WHEN length(s) >= 2*(pos+2) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 3, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END) * 256
        |        + CASE WHEN length(s) >= 2*(pos+3) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 5, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END AS seglen,
        |      (CASE WHEN length(s) >= 2*(pos+5) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 9, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END) * 256
        |        + CASE WHEN length(s) >= 2*(pos+6) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 11, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END AS hh,
        |      (CASE WHEN length(s) >= 2*(pos+7) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 13, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END) * 256
        |        + CASE WHEN length(s) >= 2*(pos+8) THEN list_reduce(list_transform(string_split(substr(s, 2*pos + 15, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END AS ww,
        |      m1 IN (192,193,194,195,197,198,199,201,202,203,205,206,207) AS sof,
        |      (m1 = 1 OR (m1 BETWEEN 208 AND 215) OR m1 = 216) AS standalone
        |    FROM jwalk) WHERE i < 24),
        |jfin AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(s, 1, 4) = 'FFD8' AND done AND NOT bad THEN w ELSE -1 END AS jpeg_w,
        |    CASE WHEN substr(s, 1, 4) = 'FFD8' AND done AND NOT bad THEN h ELSE -1 END AS jpeg_h,
        |    (substr(s, 1, 4) = 'FFD8' AND done AND NOT bad) AS jpeg_ok
        |  FROM jwalk WHERE i = 24),
        |mwalk(doc_id, s, i, pos, types, bad) AS (
        |  SELECT doc_id, s, 0, CAST(1 AS BIGINT), CAST([] AS VARCHAR[]), false FROM blobs
        |  UNION ALL
        |  SELECT doc_id, s, i + 1,
        |    CASE WHEN bad OR pos > tot THEN pos
        |         WHEN pos + 7 > tot THEN pos
        |         WHEN effsz < minhdr OR pos + effsz - 1 > tot THEN pos
        |         ELSE pos + effsz END,
        |    CASE WHEN bad OR pos > tot THEN types
        |         WHEN pos + 7 > tot THEN types
        |         WHEN effsz < minhdr OR pos + effsz - 1 > tot THEN types
        |         ELSE list_append(types, decode(unhex(substr(s, 2*(pos+4) - 1, 8)))) END,
        |    CASE WHEN bad OR pos > tot THEN bad
        |         WHEN pos + 7 > tot THEN true
        |         WHEN effsz < minhdr OR pos + effsz - 1 > tot THEN true
        |         ELSE false END
        |  FROM (
        |    SELECT *,
        |      CASE WHEN sz = 1 THEN
        |        (SELECT sum(CASE WHEN length(s) >= 2*(pos+8+k) THEN list_reduce(list_transform(string_split(substr(s, 2*(pos+8+k) - 1, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END * power(256, 7 - k)::BIGINT) FROM range(0, 8) t(k))
        |        WHEN sz = 0 THEN tot - pos + 1
        |        ELSE sz END AS effsz,
        |      CASE WHEN sz = 1 THEN 16 ELSE 8 END AS minhdr
        |    FROM (
        |      SELECT *, length(s) // 2 AS tot,
        |        (SELECT sum(CASE WHEN length(s) >= 2*(pos+k) THEN list_reduce(list_transform(string_split(substr(s, 2*(pos+k) - 1, 2), ''), c -> instr('0123456789ABCDEF', c) - 1), (a, b) -> a*16 + b) ELSE -1 END * power(256, 3 - k)::BIGINT) FROM range(0, 4) t(k)) AS sz
        |      FROM mwalk)) WHERE i < 16),
        |mfin AS (
        |  SELECT doc_id,
        |    CASE WHEN ok THEN CAST(len(types) AS BIGINT) ELSE 0 END AS mp4_n,
        |    CASE WHEN ok THEN array_to_string(types, ',') ELSE '' END AS mp4_types,
        |    ok AS mp4_ok
        |  FROM (
        |    SELECT doc_id, types,
        |      (NOT bad AND pos = length(s) // 2 + 1 AND len(types) > 0 AND types[1] = 'ftyp') AS ok
        |    FROM mwalk WHERE i = 16)),
        |fixed AS (
        |  SELECT doc_id,
        |    (substr(s,1,8) = '47494638' AND substr(s,9,4) IN ('3761','3961') AND length(s) >= 26) AS gif_ok,
        |    CASE WHEN substr(s,1,8) = '47494638' AND substr(s,9,4) IN ('3761','3961') AND length(s) >= 26
        |      THEN list_reduce(list_transform(string_split(substr(s,13,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |         + 256 * list_reduce(list_transform(string_split(substr(s,15,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |      ELSE -1 END AS gif_w,
        |    CASE WHEN substr(s,1,8) = '47494638' AND substr(s,9,4) IN ('3761','3961') AND length(s) >= 26
        |      THEN list_reduce(list_transform(string_split(substr(s,17,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |         + 256 * list_reduce(list_transform(string_split(substr(s,19,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |      ELSE -1 END AS gif_h,
        |    CASE WHEN substr(s,1,8) = '47494638' AND substr(s,9,4) IN ('3761','3961') AND length(s) >= 26
        |      THEN decode(unhex(substr(s,7,6))) ELSE '' END AS gif_ver,
        |    (substr(s,1,8) = '52494646' AND substr(s,17,8) = '57415645' AND substr(s,25,8) = '666D7420' AND length(s) >= 72) AS wav_ok,
        |    (substr(s,1,16) = '89504E470D0A1A0A' AND substr(s,25,8) = '49484452' AND length(s) >= 52) AS png_ok,
        |    s
        |  FROM blobs),
        |wavpng AS (
        |  SELECT doc_id, gif_ok, gif_w, gif_h, gif_ver, wav_ok, png_ok,
        |    CASE WHEN wav_ok THEN CAST(list_reduce(list_transform(string_split(substr(s,45,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |         + 256 * list_reduce(list_transform(string_split(substr(s,47,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) AS INTEGER) ELSE -1 END AS wav_ch,
        |    CASE WHEN wav_ok THEN CAST((SELECT sum(list_reduce(list_transform(string_split(substr(s, 49 + 2*k, 2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) * power(256, k)::BIGINT) FROM range(0, 4) t(k)) AS BIGINT) ELSE -1 END AS wav_rate,
        |    CASE WHEN wav_ok THEN CAST(list_reduce(list_transform(string_split(substr(s,69,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |         + 256 * list_reduce(list_transform(string_split(substr(s,71,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) AS INTEGER) ELSE -1 END AS wav_bits,
        |    CASE WHEN wav_ok THEN (list_reduce(list_transform(string_split(substr(s,41,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)
        |         + 256 * list_reduce(list_transform(string_split(substr(s,43,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b)) = 1 ELSE false END AS wav_pcm,
        |    CASE WHEN png_ok THEN CAST((SELECT sum(list_reduce(list_transform(string_split(substr(s, 33 + 2*k, 2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) * power(256, 3 - k)::BIGINT) FROM range(0, 4) t(k)) AS BIGINT) ELSE -1 END AS png_w,
        |    CASE WHEN png_ok THEN CAST((SELECT sum(list_reduce(list_transform(string_split(substr(s, 41 + 2*k, 2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) * power(256, 3 - k)::BIGINT) FROM range(0, 4) t(k)) AS BIGINT) ELSE -1 END AS png_h,
        |    CASE WHEN png_ok THEN CAST(list_reduce(list_transform(string_split(substr(s,49,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) AS INTEGER) ELSE -1 END AS png_depth,
        |    CASE WHEN png_ok THEN CAST(list_reduce(list_transform(string_split(substr(s,51,2),''), c -> instr('0123456789ABCDEF', c)-1), (a,b) -> a*16+b) AS INTEGER) ELSE -1 END AS png_color
        |  FROM fixed)
        |SELECT f.doc_id,
        |  j.jpeg_w, j.jpeg_h, j.jpeg_ok,
        |  f.gif_w, f.gif_h, f.gif_ver, f.gif_ok,
        |  f.wav_ch, f.wav_rate, f.wav_bits, f.wav_pcm, f.wav_ok,
        |  m.mp4_n, m.mp4_types, m.mp4_ok,
        |  f.png_w, f.png_h, f.png_depth, f.png_color, f.png_ok
        |FROM wavpng f JOIN jfin j USING (doc_id) JOIN mfin m USING (doc_id)
        |""".stripMargin,

    "q_approx_distinct" ->
      """WITH toks AS (SELECT source, unnest(str_split(text, ' ')) AS term FROM documents)
        |SELECT source, CAST(COUNT(DISTINCT term) AS BIGINT) AS exact_terms,
        |  TRUE AS approx_within_5pct
        |FROM toks GROUP BY source""".stripMargin,

    "q_audio_energy" ->
      """WITH d AS (SELECT doc_id, doc_id % 64 + 32 AS n FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, n)) AS j FROM d),
        |v AS (SELECT doc_id, j // 16 AS frame,
        |    (doc_id * 7 + j * 11) % 256 AS sv FROM s)
        |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM((sv - 128) * (sv - 128)) AS BIGINT) AS energy
        |FROM v GROUP BY doc_id, frame""".stripMargin,

    "q_image_dedup" ->
      """WITH d AS (SELECT doc_id, doc_id % 17 AS img_id,
        |    CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS lossy
        |  FROM documents)
        |SELECT CAST(img_id % 64 + 16 AS BIGINT) AS pix_w,
        |  CAST(img_id % 32 + 9 AS BIGINT) AS pix_h,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(min(doc_id) AS BIGINT) AS rep_doc
        |FROM d GROUP BY img_id, lossy""".stripMargin,

    "q_gif_frames" ->
      """WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 6 AS h,
        |    doc_id % 5 + 2 AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM d),
        |p AS (SELECT doc_id, w, h, fi, unnest(range(0, w * h)) AS i
        |  FROM f WHERE fi % 2 = 0)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(10 AS BIGINT) AS frame_delay_cs,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |  CAST(SUM((7 * (i % w) + 13 * (i // w) + doc_id + 17 * fi) % 251)
        |    AS BIGINT) AS pix_sum
        |FROM p GROUP BY doc_id, fi, w, h""".stripMargin,

    "q_avi_frames" ->
      """WITH d AS (SELECT doc_id, doc_id % 28 + 8 AS w, doc_id % 18 + 6 AS h,
        |    doc_id % 5 + 2 AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM d)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(10 AS BIGINT) AS frame_delay_cs,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |  CAST(((31 * doc_id + 17 * fi) % 256) * w * h AS BIGINT) AS pix_sum
        |FROM f WHERE fi % 2 = 0""".stripMargin,

    "q_video_dedup" ->
      """WITH d AS (SELECT doc_id, doc_id // 4 AS fam,
        |    (doc_id // 4) % 6 + 8 AS w, (doc_id // 4) % 4 + 6 AS h,
        |    doc_id % 5 + 2 AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, fam % 13 AS sx, fam % 11 AS sy,
        |    (fam + 17 * unnest(range(0, nf))) % 251 AS ad FROM d),
        |dfq AS (SELECT w, h, sx, sy, ad FROM f
        |  GROUP BY w, h, sx, sy, ad HAVING COUNT(*) <= 64),
        |kept AS (SELECT f.* FROM f JOIN dfq USING (w, h, sx, sy, ad)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS vid_a, b.doc_id AS vid_b, COUNT(*) AS i
        |  FROM kept a JOIN kept b ON a.w = b.w AND a.h = b.h AND a.sx = b.sx
        |    AND a.sy = b.sy AND a.ad = b.ad AND a.doc_id < b.doc_id
        |  GROUP BY vid_a, vid_b)
        |SELECT vid_a, vid_b, CAST(i AS BIGINT) AS n_shared,
        |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
        |FROM inter
        |JOIN sz sa ON sa.doc_id = vid_a
        |JOIN sz sb ON sb.doc_id = vid_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5""".stripMargin,

    "q_scene_cuts_avi" ->
      """WITH d AS (SELECT doc_id, doc_id % 20 + 6 AS w, doc_id % 12 + 5 AS h,
        |    doc_id % 4 + 4 AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, nf // 2 AS cut, unnest(range(1, nf)) AS fi
        |  FROM d),
        |v AS (SELECT doc_id, fi, w, h,
        |    ABS((doc_id % 60 + 2 * fi + CASE WHEN fi >= cut THEN 120 ELSE 0 END)
        |      - (doc_id % 60 + 2 * (fi - 1)
        |         + CASE WHEN fi - 1 >= cut THEN 120 ELSE 0 END)) AS dpp
        |  FROM f)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(dpp * w * h AS BIGINT) AS diff_sum,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  dpp * w * h > 30 * w * h AS is_cut
        |FROM v""".stripMargin,

    "q_scene_cuts" ->
      """WITH d AS (SELECT doc_id, doc_id % 20 + 6 AS w, doc_id % 12 + 5 AS h,
        |    doc_id % 4 + 4 AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, nf // 2 AS cut, unnest(range(1, nf)) AS fi
        |  FROM d),
        |p AS (SELECT doc_id, w, h, cut, fi, unnest(range(0, w * h)) AS i
        |  FROM f),
        |v AS (SELECT doc_id, fi, w, h,
        |    (7 * (i % w) + 13 * (i // w) + doc_id + 2 * fi
        |      + CASE WHEN fi >= cut THEN 120 ELSE 0 END) % 251 AS cur,
        |    (7 * (i % w) + 13 * (i // w) + doc_id + 2 * (fi - 1)
        |      + CASE WHEN fi - 1 >= cut THEN 120 ELSE 0 END) % 251 AS prv
        |  FROM p)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(SUM(ABS(cur - prv)) AS BIGINT) AS diff_sum,
        |  CAST(w * h AS BIGINT) AS n_pix,
        |  SUM(ABS(cur - prv)) > 30 * w * h AS is_cut
        |FROM v GROUP BY doc_id, fi, w, h""".stripMargin,

    "q_thumbnail" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 64 + 16 AS BIGINT) AS w,
        |    CAST(doc_id % 32 + 9 AS BIGINT) AS h FROM documents),
        |g AS (SELECT doc_id, w, h, GREATEST(w, h) AS m FROM d)
        |SELECT doc_id, w, h,
        |  CAST(CASE WHEN m <= 32 THEN w ELSE GREATEST(1, w * 32 // m) END AS BIGINT) AS thumb_w,
        |  CAST(CASE WHEN m <= 32 THEN h ELSE GREATEST(1, h * 32 // m) END AS BIGINT) AS thumb_h,
        |  TRUE AS thumb_ok
        |FROM g""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS digest, md5(text) AS checksum
        |FROM documents""".stripMargin,

    "q_dsir" ->
      """WITH t AS (SELECT doc_id, lang = 'en' AS tgt, str_split(text, ' ') AS toks
        |  FROM documents WHERE len(str_split(text, ' ')) >= 2),
        |f AS (SELECT doc_id, tgt,
        |    CAST(concat('0x', substring(md5(toks[i+1] || ' ' || toks[i+2]), 1, 15))
        |      AS BIGINT) % 4096 AS feat
        |  FROM (SELECT doc_id, tgt, toks, unnest(range(0, len(toks) - 1)) AS i FROM t)),
        |model AS (SELECT feat, CAST(count(*) AS BIGINT) AS cnt_raw,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_tgt
        |  FROM f GROUP BY feat),
        |tot AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS tot_raw,
        |    CAST(sum(cnt_tgt) AS BIGINT) AS tot_tgt FROM model),
        |w AS (SELECT feat,
        |    ln(CAST(cnt_tgt + 1 AS DOUBLE) / CAST(tot_tgt + 4096 AS DOUBLE))
        |      - ln(CAST(cnt_raw + 1 AS DOUBLE) / CAST(tot_raw + 4096 AS DOUBLE)) AS lw
        |  FROM model, tot),
        |d AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_features,
        |    round(sum(w.lw), 6) AS dsir_score
        |  FROM f JOIN w ON f.feat = w.feat GROUP BY f.doc_id)
        |SELECT doc_id, n_features, dsir_score
        |FROM d ORDER BY dsir_score DESC, doc_id ASC LIMIT 20""".stripMargin
  )
}
