package graft.text

import graft.util.CacheLedger.CacheOps
import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text-analysis operators for a large-scale training-data pipeline, covering
  * the reference's NLP chain (SURVEY.md §2.9 — tokenize / normalize /
  * stopwords / frequency top-k from `Spark/Word_cloud_evaluation.ipynb`
  * cells 9–24) plus language-ID, quality scoring, token counting and
  * fingerprinting.
  *
  * Everything is declarative `functions._` algebra — no UDFs — so the whole
  * chain stays inside WholeStageCodegen and scales linearly with input
  * splits; the only shuffles are the explicit groupBys on (doc) or (term).
  */
object TextAnalysis {

  /** Whitespace tokenization — the reference's `Tokenizer` stage for its
    * space-delimited text. For natural text swap the delimiter regex.
    */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))

  /** BPE-ish regex token count: word runs + single non-word-non-space marks.
    * Mirrors what a byte-pair pre-tokenizer counts, cheap enough to run over
    * 100 TB as a single projection.
    */
  def regexTokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("\\w+|[^\\w\\s]"), lit(0))).cast("long")

  /** Flesch reading-ease per document from three regex counts — words
    * ([a-z]+ runs of the lowercased text), sentences ([.!?]+ runs) and
    * syllables (vowel-group [aeiouy]+ runs, the standard heuristic):
    *
    *   fre = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * The readability band is a routine curation gate next to
    * [[quality]]/[[gopherQuality]] (too-low often means boilerplate or
    * OCR noise, too-high means listings). Pure projection — three
    * codegen regex scans, zero shuffles; all ratios are integer/integer
    * IEEE divisions so the score is engine-exact. Zero-count docs are
    * floored (denominators ≥ 1) rather than dropped, keeping the gate
    * total.
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        expr(s"CAST(size(regexp_extract_all(lower($textCol), '[a-z]+', 0)) AS BIGINT)")
          .as("n_words"),
        expr(s"CAST(size(regexp_extract_all($textCol, '[.!?]+', 0)) AS BIGINT)")
          .as("n_sentences"),
        expr(s"CAST(size(regexp_extract_all(lower($textCol), '[aeiouy]+', 0)) AS BIGINT)")
          .as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
        round(lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            greatest(col("n_sentences"), lit(1L)).cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            greatest(col("n_words"), lit(1L)).cast("double")), 6).as("fre"))

  /** Per-document quality metrics: token counts, type-token ratio, mean
    * token length, stopword ratio. One explode + one groupBy(doc) — a
    * map-side-combinable aggregation.
    */
  def quality(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String]): DataFrame = {
    tokens(docs, idCol, textCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col("term")).as("n_uniq"),
        round(countDistinct(col("term")).cast("double") /
          count(lit(1)).cast("double"), 6).as("ttr"),
        round(sum(length(col("term"))).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_tok_len"),
        round(sum(when(col("term").isin(stopwords: _*), 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double"), 6).as("stop_ratio"))
  }

  /** Model-based quality score — the linear-classifier stand-in for the
    * fasttext-style quality filter a curation pipeline runs after the rule
    * gates: p(keep) = sigmoid(w0 + w·features) over the [[quality]]
    * features (ttr, mean token length, stopword ratio, log token count).
    * Weights are caller-supplied (a trained model's coefficients slot in
    * unchanged); the whole scorer is the [[quality]] aggregation plus one
    * projection — no model server, no UDF, scan-speed at 100 TB.
    *
    * Engine parity: the linear combination runs in exact DECIMAL (weights
    * quantized to 6 decimals, features are already round6 values) and is
    * rounded in decimal space before the sigmoid — a plain double sum
    * drifts by 1 ulp across engines exactly at half-up boundaries (the
    * graft.util.Num decimal-routing rule). Both engines then exponentiate
    * the identical logit.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], w0: Double, wTtr: Double,
                   wMeanLen: Double, wStop: Double, wLogTok: Double): DataFrame = {
    def dec(x: Double): Column =
      lit(java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP))
    def feat(c: Column): Column = c.cast("decimal(20,6)")
    val z = round(dec(w0)
      + dec(wTtr) * feat(col("ttr"))
      + dec(wMeanLen) * feat(col("mean_tok_len"))
      + dec(wStop) * feat(col("stop_ratio"))
      + dec(wLogTok) * feat(round(log(col("n_tokens").cast("double")), 6)), 6)
      .cast("double")
    quality(docs, idCol, textCol, stopwords)
      .withColumn("logit", z)
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(negate(col("logit")))), 6))
      .select(col(idCol), col("logit"), col("score"),
        (col("score") >= 0.5).as("keep"))
  }

  /** N-gram-lexicon language ID: score each document against small per-language
    * lexicons, pick the best-matching language (ties broken alphabetically),
    * fall back to "und" when nothing matches.
    *
    * The lexicon join is a broadcast hash join (lexicon is tiny); the argmax
    * is a windowed row_number — deterministic under any partitioning.
    */
  def langId(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
             lexicon: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val lex = lexicon.toDF("term", "lang")
    val matches = tokens(docs, idCol, textCol)
      .join(broadcast(lex), "term")
      .groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).cast("long").as("matches"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("matches").desc, col("lang").asc)
    val best = matches.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lang"), lit("und")).as("pred_lang"),
        coalesce(col("matches"), lit(0L)).as("matches"))
  }

  /** Within-document repetition: duplicate word n-gram ratio — the
    * Gopher-style repetition filter signal (a doc whose bigrams repeat
    * heavily is boilerplate/spam). Pure projection over the token array
    * (transform + array_distinct) — no explode, no shuffle; scales as a
    * map-only pass. Docs with fewer than n tokens are dropped (no gram
    * exists; also guards Spark's descending `sequence(0, k<0)`).
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 2): DataFrame = {
    val toks = split(col(textCol), " ")
    // tokenize once into __t — the [[ngramCounts]]/[[cdcChunks]] no-CSE
    // note: inlined split() would re-tokenize per lambda reference
    docs
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), expr(
        s"""transform(sequence(0, size(__t) - $n),
           |  i -> concat_ws(' ', slice(__t, i + 1, $n)))"""
          .stripMargin).as("__g"))
      .select(col(idCol),
        size(col("__g")).cast("long").as("n_grams"),
        size(array_distinct(col("__g"))).cast("long").as("n_uniq_grams"),
        round(lit(1.0) -
          size(array_distinct(col("__g"))).cast("double") /
            size(col("__g")).cast("double"), 6).as("rep_ratio"))
  }

  /** Fixed-size token chunks with stride — training-sequence preparation
    * (sliding windows with overlap, the packing-prep every pretraining
    * pipeline runs before tokenizer batching). One explode over chunk
    * starts; chunk_id is derivable from the start offset, so the output
    * can be written partitioned/bucketed by (doc, chunk_id) for
    * deterministic shard assembly. Final partial chunks are kept
    * (n_chunk_tokens < size marks them).
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             chunkSize: Int = 32, stride: Int = 16): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(expr(s"sequence(0, size(__toks) - 1, $stride)")).as("__i"))
      .select(col(idCol),
        expr(s"CAST(__i DIV $stride AS BIGINT)").as("chunk_id"),
        concat_ws(" ", expr(s"slice(__toks, __i + 1, $chunkSize)")).as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("__i")).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Pack chunks into fixed-token-budget training sequences, PER SHARD:
    * within each shard (partition column), chunks are laid out in a
    * deterministic order and assigned seq_id = floor(tokens-before / budget)
    * — the concat-then-split packing every pretraining pipeline runs before
    * batching, at chunk granularity (a sequence can overrun the budget by at
    * most one chunk; exact token-boundary splitting is the downstream
    * tokenizer's re-chunk, see [[chunks]]).
    *
    * Scale shape: the running sum is a window PARTITIONED BY the shard
    * column — never a global ORDER BY (which would serialize 100 TB through
    * one sort partition). Shards are the natural packing domain anyway:
    * training data is materialized shard-by-shard and sequences must not
    * cross shard files.
    */
  def packChunks(chunks: DataFrame, shardCol: String, orderCols: Seq[Column],
                 tokCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("__before", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"CAST(__before DIV $budget AS BIGINT)"))
      .drop("__before")
  }

  /** Per-document TF-IDF top-k keywords: tf(doc,term) · ln((N+1)/(df+1)),
    * the classic smoothed IDF. Two map-side-combinable aggregations (tf,
    * then df over the tf rows — df never re-touches raw tokens), the corpus
    * size N broadcast as a 1-row crossJoin, and a per-doc row_number window
    * for the top-k. Scores are rounded to 6 decimals BEFORE ranking with a
    * term tiebreak, so the ordering is engine-independent (oracle-parity
    * round6+tiebreak contract).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast("double") *
        log((col("__n") + lit(1.0)) / (col("df").cast("double") + lit(1.0))), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rnk"))
  }

  /** Vocabulary head statistics (Zipf audit): the top-k corpus terms with
    * frequency, rank, and cumulative corpus-coverage fraction — the "how
    * much of the corpus do the top 100 terms cover" check run before
    * tokenizer training. The top-k is a TakeOrderedAndProject (scale-safe:
    * only k rows survive to the driver-side-free global window); the
    * cumulative window then runs over k rows, not the vocabulary.
    */
  def vocabStats(docs: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame = {
    val freqs = tokens(docs, idCol, textCol)
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("n"))
    val tot = freqs.agg(sum(col("n")).cast("double").as("__tot"))
    val topk = freqs.orderBy(col("n").desc, col("term").asc).limit(k)
    // single-partition window is fine HERE: input is the k-row top-k
    val w = Window.orderBy(col("n").desc, col("term").asc)
    topk.crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum_frac",
        round(sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double") / col("__tot"), 6))
      .select(col("term"), col("n"), col("rnk"), col("cum_frac"))
  }

  /** PII patterns shared by scrub and count — conservative syntax that means
    * the same thing to Java regex (Spark) and RE2 (DuckDB oracle).
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]+"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Redact emails/phones in place — the pre-training PII scrub, as a pure
    * codegen'd projection (regexp_replace replaces ALL matches).
    */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Corpus n-gram counts, top-k — the language-model count table (bigram/
    * trigram frequencies). Grams are built as a per-row transform over the
    * token array ([[repetition]]'s trick — no intermediate token explode),
    * so the only shuffle is the map-side-combined groupBy(gram), and the
    * top-k is a TakeOrderedAndProject.
    */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    // tokenize ONCE into __t and reference it from the lambda — inlining
    // split() into the expr string re-tokenizes each doc twice more (the
    // sequence bound and the slice), since Spark does not CSE across a
    // projection boundary into lambda bodies (the [[cdcChunks]] note;
    // optimization guide §1.2 step 2 — per-task work)
    docs
      .select(toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(explode(expr(
        s"""transform(sequence(0, size(__t) - $n),
           |  i -> concat_ws(' ', slice(__t, i + 1, $n)))"""
          .stripMargin)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }

  /** Content-defined chunking audit (Rabin-style, over tokens): a chunk
    * boundary falls after every position whose n-gram hash ≡ 0 (mod
    * `modulus`), so boundaries move WITH the content — the property that
    * makes CDC dedup robust to insertions, unlike fixed-size [[chunks]].
    * The hash is the engine-portable md5→60-bit-int family (the MinHash
    * recipe), so the oracle reproduces boundaries bit-for-bit. One pure
    * projection (transform + filter over the gram array): no explode, no
    * shuffle — boundary detection over 100 TB rides the scan. Docs
    * shorter than n tokens have no gram and form a single chunk.
    * Returns (id, n_grams, n_boundaries, n_chunks).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 3, modulus: Int = 8): DataFrame = {
    // tokenize ONCE into __t and reference it from every lambda — inlining
    // split() into the expr strings would re-tokenize each doc three times
    // (the guard, the sequence bound, and the slice) since Spark does not
    // CSE across a projection boundary into lambda bodies
    docs.select(col(idCol), split(col(textCol), " ").as("__t"))
      .select(col(idCol),
        when(size(col("__t")) >= n, expr(
          s"""transform(sequence(0, size(__t) - $n),
             |  i -> concat_ws(' ', slice(__t, i + 1, $n)))""".stripMargin))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")).as("__g"))
      .select(col(idCol),
        size(col("__g")).cast("long").as("n_grams"),
        size(expr(
          s"""filter(__g, g ->
             |  CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % $modulus = 0)"""
            .stripMargin)).cast("long").as("n_boundaries"))
      .withColumn("n_chunks", (col("n_boundaries") + 1L).cast("long"))
  }

  /** Term co-occurrence counts within a forward window of `w` tokens —
    * the PMI/embedding-training count table. Pairs are generated by ONE
    * positional explode followed by a bounded slice-explode (output rows ≤
    * tokens × w, the information-theoretic minimum for this statistic);
    * the only full shuffle is the map-side-combined groupBy(a, b), and
    * the top-k is a TakeOrderedAndProject with the deterministic
    * (n desc, a, b) tiebreak.
    */
  def cooccurrence(docs: DataFrame, textCol: String, w: Int, k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    // tokenize once (the [[cdcChunks]] no-CSE note)
    docs
      .select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("__t"), explode(sequence(lit(0), size(col("__t")) - lit(2))).as("__i"))
      .select(expr("element_at(__t, __i + 1)").as("a"),
        explode(expr(s"slice(__t, __i + 2, $w)")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Smoothed bigram language-model table: P(b|a) = (c(a,b) + k) /
    * (c(a·) + k·V) with add-k smoothing, where c(a·) sums a's outgoing
    * bigrams and V is the corpus vocabulary size. The first aggregation
    * every count-based LM (and every PMI table) needs. Plan: one bigram
    * groupBy (combinable), one groupBy(a) OVER THE BIGRAM COUNTS (never
    * re-touching raw tokens — the [[tfidfTopK]] df trick), the scalar V
    * broadcast as a 1-row crossJoin, and TakeOrdered top-k with the
    * deterministic (n desc, a, b) tiebreak. Probabilities round6 for
    * engine parity.
    */
  def bigramLm(docs: DataFrame, textCol: String, k: Double,
               topK: Int): DataFrame =
    bigramLmTable(docs, textCol, k)
      .select(col("a"), col("b"), col("n"), col("p"))
      .orderBy(col("n").desc, col("a").asc, col("b").asc)
      .limit(topK)

  /** Adjacent-token bigram rows (a, b) per document, with any caller
    * columns carried through — the one positional-explode walk shared by
    * [[bigramLmTable]], [[bigramPerplexity]] and [[textRank]] so the
    * tokenization/bigram contract lives in exactly one place.
    */
  private def docBigrams(docs: DataFrame, textCol: String,
                         carry: Seq[Column]): DataFrame = {
    val toks = split(col(textCol), " ")
    // tokenize once, then filter/explode over the materialized array (the
    // [[cdcChunks]] no-CSE note: the filter and the explode bound each
    // re-ran split() in the previous shape)
    docs
      .select(carry ++ Seq(toks.as("__t")): _*)
      .filter(size(col("__t")) >= 2)
      .select(carry ++ Seq(col("__t"),
        explode(sequence(lit(0), size(col("__t")) - lit(2))).as("__i")): _*)
      .select(carry ++ Seq(expr("element_at(__t, __i + 1)").as("a"),
        expr("element_at(__t, __i + 2)").as("b")): _*)
  }

  /** PMI collocations: top-k adjacent bigrams by pointwise mutual
    * information ln((c_xy/N_b) / ((c_x/N_u)·(c_y/N_u))) with a minimum
    * pair count (PMI without a count floor surfaces hapax noise) — the
    * standard multi-word-expression / named-entity-candidate extractor.
    * One bigram groupBy + one unigram groupBy + two vocab-sized joins;
    * totals are 1-row broadcast attaches. All counts exact longs; the
    * score is a fixed-order chain of IEEE divisions, engine-exact.
    */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    // the unigram and bigram count tables each feed their own total AND
    // the join below — cut each once, and take the totals off the
    // AGGREGATED tables (Σ cu ≡ the token count, Σ cxy ≡ the bigram
    // count) instead of re-tokenizing the corpus for a global count
    // (optimization guide §1.2 step 1 / §2.3 aggregate-before-shuffle:
    // two full tokenize+explode passes become zero)
    val uni = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .cutLineage()
    val nu = broadcast(uni.agg(sum(col("cu")).cast("double").as("__nu")))
    val bg = docBigrams(docs, textCol, Nil)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cxy"))
      .cutLineage()
    val nb = broadcast(bg.agg(sum(col("cxy")).cast("double").as("__nb")))
    bg.filter(col("cxy") >= minCount)
      .join(uni.select(col("w").as("a"), col("cu").as("__ca")), "a")
      .join(uni.select(col("w").as("b"), col("cu").as("__cb")), "b")
      .crossJoin(nu).crossJoin(nb)
      .select(col("a"), col("b"), col("cxy"),
        round(log(
          (col("cxy").cast("double") / col("__nb")) /
            ((col("__ca").cast("double") / col("__nu")) *
              (col("__cb").cast("double") / col("__nu")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Heaps-law vocabulary growth over the BIGRAM vocabulary (rich enough
    * to keep growing on any corpus — a small unigram vocabulary
    * saturates immediately): each bigram is attributed to its FIRST
    * document; new-type counts per corpus decile plus the cumulative
    * curve answer "is the vocabulary saturating?" for tokenizer/corpus
    * planning. One bigram groupBy; the ≤`buckets`-row cumulative rides
    * a fold over the collected decile array (no unpartitioned window).
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 10): DataFrame = {
    val firstDoc = docBigrams(docs, textCol, Seq(col(idCol)))
      .groupBy(col("a"), col("b")).agg(min(col(idCol)).as("fd"))
    val maxDoc = broadcast(docs.agg(max(col(idCol)).as("__md")))
    firstDoc.crossJoin(maxDoc)
      .withColumn("decile",
        least(floor(col("fd") * buckets / (col("__md") + 1)),
          lit(buckets - 1L)).cast("long"))
      .groupBy(col("decile")).agg(count(lit(1)).as("new_terms"))
      .agg(expr("array_sort(collect_list(struct(decile, new_terms)))")
        .as("__a"))
      .select(explode(expr(
        """transform(__a, (e, i) -> struct(
          |  e.decile AS decile, e.new_terms AS new_terms,
          |  aggregate(slice(__a, 1, i + 1), 0L,
          |    (acc, x) -> acc + x.new_terms) AS vocab_cum))""".stripMargin))
        .as("__e"))
      .select(col("__e.decile"), col("__e.new_terms"), col("__e.vocab_cum"))
  }

  /** The full (unlimited) smoothed bigram LM table — see [[bigramLm]] for
    * the formula and plan notes. Shared by the top-k view and the per-doc
    * perplexity scorer. `p` is the round(6) display probability; `p_raw`
    * is the unrounded quotient — surprisal math MUST use `p_raw`, since
    * round(6) collapses rare-bigram probabilities to exactly 0.0 once the
    * smoothed denominator passes ~2·10⁶·k (log2(0) = NULL would silently
    * drop those bigrams from a sum).
    */
  def bigramLmTable(docs: DataFrame, textCol: String, k: Double): DataFrame = {
    // persisted: ca inside lmFromBigrams derives from bi, and without
    // materialization the whole bigram aggregation re-runs for that branch
    // (two corpus scans — verified in the plan). The bigram table is tiny
    // next to the corpus, the opposite trade from spanDedup's two-scan
    // choice.
    val bi = docBigrams(docs, textCol, Nil)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n"))
      .persistBounded()
    lmFromBigrams(bi, unigramVocabSize(docs, textCol), k)
  }

  /** Corpus vocabulary size as a 1-row frame — the smoothing denominator's
    * V. A separate unigram pass by definition (bigram endpoints miss
    * single-token docs).
    */
  private def unigramVocabSize(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .agg(countDistinct(col("term")).cast("double").as("__v"))

  /** Smoothing formula over a prebuilt (a, b, n) bigram-count table —
    * shared by [[bigramLmTable]] and [[bigramPerplexity]] (which derives
    * the counts from its already-persisted per-doc bigrams instead of
    * re-scanning the corpus).
    */
  private def lmFromBigrams(bi: DataFrame, v: DataFrame, k: Double): DataFrame = {
    val ca = bi.groupBy(col("a")).agg(sum(col("n")).cast("long").as("__ca"))
    val praw = (col("n").cast("double") + lit(k)) /
      (col("__ca").cast("double") + lit(k) * col("__v"))
    bi.join(ca, "a")
      .crossJoin(broadcast(v))
      .select(col("a"), col("b"), col("n"),
        round(praw, 6).as("p"), praw.as("p_raw"))
  }

  /** Per-document perplexity under the corpus-level add-k bigram LM — the
    * standard LM-based quality filter for training-data curation (low-ppl ≈
    * fluent under the corpus distribution, high-ppl ≈ noise). Per-bigram
    * surprisal −log2 P(b|a) comes from [[bigramLmTable]]; the per-doc mean
    * runs each surprisal through round(6)→DECIMAL so the sum is
    * order-independent (engine parity — double sums are not associative).
    *
    * The mean itself is reported in integer MICRO-BITS, half-up-rounded via
    * pure integer arithmetic — (2·Σ_µ + n) DIV (2·n) — never by round() on
    * the double quotient: Σ_µ/n is a small-denominator rational that lands
    * EXACTLY on round-half boundaries with probability ~1/n per doc, where
    * Spark (exact binary HALF_UP) and DuckDB (multiply-based round) disagree
    * on the coin flip (observed: 1 doc in 5000 at sf0.1). Integer DIV is
    * engine-exact. ppl = 2^mean is then a single IEEE pow on an identical
    * double.
    *
    * Plan: the per-doc bigram table is computed ONCE and persisted; the
    * LM's bigram counts are a rollup of it, so the corpus is scanned twice
    * total (bigrams + the unigram vocab size), not three times. The LM is
    * tiny (|vocab|² upper bound) and broadcast, so the per-doc side never
    * shuffles for the join — one explode, one broadcast-hash join, one
    * map-side-combinable groupBy(doc).
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
                       k: Double): DataFrame = {
    val docBi = docBigrams(docs, textCol, Seq(col(idCol))).persistBounded()
    val bi = docBi.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n"))
    // surprisal from p_raw, NOT the round(6) display p: rounding first
    // would collapse rare-bigram probabilities below 5e-7 to log2(0)
    val lm = lmFromBigrams(bi, unigramVocabSize(docs, textCol), k)
      .select(col("a"), col("b"), col("p_raw"))
    docBi
      // NO broadcast hint: the LM is CORPUS-derived (distinct bigrams grow
      // with the corpus), so forcing a broadcast is a 100-TB ceiling. AQE
      // picks broadcast from the runtime shuffle stats while the LM is
      // small and falls back to a shuffle join when it isn't.
      .join(lm, Seq("a", "b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(round(-log2(col("p_raw")), 6).cast("decimal(28,6)")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        expr("(2 * CAST(__s * 1000000 AS BIGINT) + n_bigrams) DIV (2 * n_bigrams)")
          .cast("long").as("avg_nll_microbits"))
      .withColumn("ppl",
        round(pow(lit(2.0), col("avg_nll_microbits").cast("double") / lit(1000000.0)), 6))
  }

  /** Per-document token-distribution entropy H = −Σ pᵢ·log2 pᵢ — a
    * repetition/diversity quality signal (near-zero entropy = one token
    * repeated; log2(n_types) = uniform). Computed via the shuffle-friendly
    * identity H = log2(n) − (Σ c·log2 c)/n so a single (doc,term) count pass
    * feeds one groupBy(doc): no per-term p=c/n join against a totals table.
    * Each c·log2 c term is round(9)→DECIMAL before summing (order-independent,
    * engine-exact); the outer log2/divide/subtract are single IEEE ops on
    * identical inputs, rounded to 6 for the oracle hash.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(round(col("__c").cast("double") * log2(col("__c").cast("double")), 9)
          .cast("decimal(28,9)")).as("__s"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(log2(col("n_tokens").cast("double")) -
          col("__s").cast("double") / col("n_tokens").cast("double"), 6).as("entropy"))

  /** Out-of-vocabulary audit: per-doc token and OOV counts against the
    * corpus top-`vocabSize` vocabulary (deterministic (freq desc, term asc)
    * cut — the stand-in for a fixed tokenizer vocab artifact, which a real
    * deployment would broadcast from a file instead of deriving). High OOV
    * rate flags transcoding junk, wrong-language docs, and tokenizer
    * mismatch before training. INTEGER outputs only — the rate n_oov/n is
    * a small-denominator rational (round-half coin-flip zone); consumers
    * divide downstream at whatever precision they need.
    * Plan: one aggregation for the vocab (broadcast), one left join + one
    * combinable groupBy(doc) for the audit.
    */
  def oovAudit(docs: DataFrame, idCol: String, textCol: String,
               vocabSize: Int): DataFrame = {
    val toks = tokens(docs, idCol, textCol)
    val vocab = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"))
  }

  /** Per-group KL divergence of the group's term distribution from the
    * corpus distribution — KL(P_g ‖ Q) = Σ_t P_g(t)·log2(P_g(t)/Q(t)) — the
    * domain-shift / source-quality signal a mixture-weighted pretraining
    * pipeline monitors per source. P_g(t) > 0 ⇒ Q(t) > 0, so every term is
    * defined; the probability ratio is computed as one integer-product
    * ratio (c_gt·n)/(n_g·c_t) — exact in doubles below 2^53 — so both
    * engines see identical division inputs.
    *
    * Engine parity: per-term contributions are round(9)→DECIMAL and the
    * output IS the exact decimal sum cast to double — no rounding after a
    * division, which is the round-half coin-flip zone (see
    * [[bigramPerplexity]]).
    *
    * Plan: ONE (group,term) count feeds all three marginals (persisted —
    * the group totals, term totals and grand total are rollups of it, never
    * re-touching the corpus); the grand total is a broadcast 1-row cross
    * join; the only shuffles are the combinable groupBys.
    */
  def sourceKl(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val st = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).cast("long").as("__cst"))
      .persistBounded()
    val ns = st.groupBy(col(groupCol)).agg(sum(col("__cst")).cast("long").as("__ns"))
    val ct = st.groupBy(col("term")).agg(sum(col("__cst")).cast("long").as("__ct"))
    val nTot = st.agg(sum(col("__cst")).cast("long").as("__n"))
    st.join(ns, groupCol)
      .join(ct, "term")
      .crossJoin(broadcast(nTot))
      .select(col(groupCol), col("__ns"),
        // each factor cast to double BEFORE multiplying: a long*long
        // numerator overflows int64 (ANSI throw) once n reaches ~1e12
        // tokens; double products are IEEE-identical in both engines
        round((col("__cst").cast("double") / col("__ns").cast("double")) *
          log2(col("__cst").cast("double") * col("__n").cast("double") /
            (col("__ns").cast("double") * col("__ct").cast("double"))), 9)
          .cast("decimal(28,9)").as("__kl_t"))
      .groupBy(col(groupCol))
      .agg(max(col("__ns")).as("n_tokens"),
        sum(col("__kl_t")).cast("double").as("kl_bits"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank
    * over the undirected token-adjacency graph, weighted by co-occurrence
    * count. `iters` synchronous rounds of
    * s'(v) = teleport + damping · Σ_{u∈N(v)} s(u)·w(u,v)/deg(u), then top-k
    * terms by final score. `teleport` is passed explicitly (not computed as
    * 1−damping) so the literal matches the oracle bit-for-bit.
    *
    * Engine parity: each neighbor contribution is round(12)→DECIMAL(38,12)
    * before the groupBy sum (double addition is not associative; decimal
    * addition is exact), and the damping update is IEEE ops on the exact sum.
    *
    * Scale: the edge+degree table is built once, persisted, and re-joined
    * each round — per round ONE shuffle join on src plus ONE combinable
    * groupBy(dst), both partitioned by term; the corpus itself is scanned
    * exactly once. At 100 TB the graph (≤|vocab|² edges) is orders smaller
    * than the corpus, so the iteration cost is decoupled from input size.
    */
  def textRank(docs: DataFrame, textCol: String, damping: Double = 0.85,
               teleport: Double = 0.15, iters: Int = 3, topK: Int = 20): DataFrame = {
    require(iters >= 1, s"textRank needs iters >= 1, got $iters")
    val pairs = docBigrams(docs, textCol, Nil)
      .select(col("a").as("x"), col("b").as("y"))
      .filter(col("x") =!= col("y"))
    val und = pairs
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).cast("long").as("n"))
    val edges = und.select(col("u").as("src"), col("v").as("dst"), col("n"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst"), col("n")))
    val deg = edges.groupBy(col("src")).agg(sum(col("n")).cast("long").as("deg"))
    val ed = edges.join(deg, "src").persistBounded()
    var scores = ed.select(col("src").as("term")).distinct()
      .withColumn("score", lit(1.0))
    (1 to iters).foreach { _ =>
      scores = ed.join(scores, ed("src") === scores("term"))
        .select(col("dst"),
          round(col("score") * col("n").cast("double") / col("deg").cast("double"), 12)
            .cast("decimal(38,12)").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__s"))
        .select(col("dst").as("term"),
          round(lit(teleport) + lit(damping) * col("__s").cast("double"), 12).as("score"))
    }
    scores
      .select(col("term"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("term").asc)
      .limit(topK)
  }

  /** Content fingerprints: raw digest, strong digest, and an order-invariant
    * bag-of-words fingerprint (detects shuffled duplicates). All codegen'd
    * built-ins — no shuffle at all.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      md5(col(textCol)).as("fp_md5"),
      sha2(col(textCol), 256).as("fp_sha256"),
      md5(concat_ws(" ", array_sort(split(lower(col(textCol)), " ")))).as("fp_bow"))

  /** Rule-based POS tagging — the public-algorithm stand-in for the
    * reference's pretrained perceptron tagger (SURVEY §2.9; the model
    * artifact is non-public, the rule-tagger idea is textbook): a
    * closed-class lexicon decides function words (broadcast join), suffix
    * heuristics decide the rest. Supports the same downstream shape the
    * reference uses POS for — filtering word-cloud terms by tag class.
    * Returns (id, term, pos).
    */
  def posTag(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String): DataFrame = {
    import spark.implicits._
    val lex = Lexicons.posLexicon.toDF("term", "__lex_pos")
    tokens(docs, idCol, textCol)
      .join(broadcast(lex), Seq("term"), "left")
      .select(col(idCol), col("term"),
        coalesce(col("__lex_pos"),
          when(col("term").endsWith("ing"), "VBG")
            .when(col("term").endsWith("ed"), "VBD")
            .when(col("term").endsWith("ly"), "RB")
            .when(col("term").endsWith("s") && length(col("term")) > 3, "NNS")
            .otherwise("NN")).as("pos"))
  }

  /** Per-document term-frequency MAP — the map-typed column family
    * (`map_from_entries` / `map_filter` / `map_values` / `aggregate`) over
    * real data. The map is built from one (doc, term) aggregation, so the
    * only shuffles are the two map-side-combinable groupBys; everything
    * after is a codegen'd projection over the assembled MapType column.
    *
    * Map columns have no canonical wire order, so for engine-independent
    * output the filtered map is serialized as its entry list sorted by key
    * (`array_sort(map_entries(...))`) — the same round6+tiebreak idea the
    * oracle-parity contract uses for floats, applied to container types.
    * Returns (id, n_terms, n_tokens, repeated_terms) where repeated_terms
    * is "term:count,..." for terms with count ≥ minCount.
    */
  def termCountMap(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 2L): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("term"), col("cnt"))))
        .as("__tf"))
      .select(col(idCol),
        size(col("__tf")).cast("long").as("n_terms"),
        expr("aggregate(map_values(__tf), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("n_tokens"),
        expr(
          s"""array_join(transform(array_sort(map_entries(
             |  map_filter(__tf, (k, v) -> v >= $minCount))),
             |  e -> concat(e.key, ':', e.value)), ',')""".stripMargin)
          .as("repeated_terms"))

  /** Gopher-style rule-based quality gate (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * table A1 — adapted to this corpus's signal ranges): token-count
    * bounds, mean-token-length band, minimum stopword fraction, and a
    * maximum single-token frequency share (the repetition rule). All four
    * signals are computed as ONE pure projection over the token array — no
    * explode, no shuffle, embarrassingly parallel over 100 TB of splits.
    * The max-frequency signal is O(distinct·n) per doc via array
    * higher-order functions, the right trade below ~1k tokens/doc; longer
    * docs should use the [[quality]] groupBy formulation instead.
    * Returns every doc with its signals and per-rule flags; `pass` is the
    * conjunction.
    */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
                    stopwords: Seq[String] = Lexicons.enStop,
                    minTokens: Int = 30, maxTokens: Int = 100000,
                    minMeanTokLen: Double = 4.0, maxMeanTokLen: Double = 6.0,
                    minStopFrac: Double = 0.02,
                    maxWordFrac: Double = 0.15): DataFrame = {
    // Column-API lambdas throughout — no SQL-string splicing, so stopwords
    // containing quotes ("don't") and column names needing backticks work
    val toks = split(col(textCol), " ")
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        round(length(regexp_replace(col(textCol), " ", "")).cast("double") /
          size(toks), 6).as("mean_tok_len"),
        round(size(filter(toks, t => array_contains(stopArr, t)))
          .cast("double") / size(toks), 6).as("stop_frac"),
        round(array_max(transform(array_distinct(toks),
            d => size(filter(toks, x => x === d)))).cast("double") /
          size(toks), 6).as("max_word_frac"))
      .withColumn("ok_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("ok_tok_len",
        col("mean_tok_len") >= minMeanTokLen && col("mean_tok_len") <= maxMeanTokLen)
      .withColumn("ok_stop", col("stop_frac") >= minStopFrac)
      .withColumn("ok_rep", col("max_word_frac") <= maxWordFrac)
      .withColumn("pass",
        col("ok_len") && col("ok_tok_len") && col("ok_stop") && col("ok_rep"))
  }

  /** Trending-words top-k — the reference's word-cloud frequency query
    * (`Word_cloud_evaluation.ipynb` cells 22–24: explode → count → top 500).
    * Partial aggregation makes the (term) shuffle carry only distinct terms.
    */
  def trending(docs: DataFrame, idCol: String, textCol: String,
               stopwords: Seq[String], k: Int): DataFrame =
    tokens(docs, idCol, textCol)
      .filter(!col("term").isin(stopwords: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)

  /** Luhn checksum residue of a digit-string column (0 = valid). The
    * verification step a PII pipeline runs AFTER the 13–19-digit regex:
    * checksum-verifying candidates is what separates card numbers from
    * order ids and timestamps, cutting false-positive redactions by ~10×
    * (only 1 in 10 random digit runs passes Luhn). Pure HOF arithmetic —
    * codegen'd, zero shuffle, no UDF.
    */
  def luhnMod(digits: Column): Column = {
    val ds = filter(split(digits, ""), c => c =!= "")
    val n = size(ds)
    val total = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val d = element_at(ds, i).cast("int")
      // double every second digit counted from the RIGHT (r = n - i + 1)
      val doubled = when((n - i + 1) % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      acc + doubled
    })
    total % 10
  }

  /** Exact heavy hitters (terms with count > N/k) via the two-pass
    * sketch-then-verify pattern: pass 1 runs a Misra–Gries summary of
    * capacity k inside each partition (per-partition imperative state —
    * the legitimate mapPartitions case) and unions the surviving
    * candidates; pass 2 recounts ONLY the candidates exactly and applies
    * the threshold.
    *
    * Correctness is sketch-order-independent: MG(k) can undercount an item
    * by at most n_p/k within a partition, so any term with global count
    * > N/k survives at least one partition's summary — the candidate union
    * is a guaranteed superset, and the exact recount makes the final set
    * identical to the brute-force GROUP BY answer no matter how partitions
    * split.
    *
    * Scale story vs a straight groupBy: the only full-corpus shuffle-free
    * pass is the sketch (bounded k entries per partition, collected as
    * ≤ partitions × k strings); the recount shuffles only tokens matching
    * the broadcast candidate set. On a 100 TB corpus with a web-scale
    * vocabulary the straight groupBy shuffles every distinct term;
    * this shuffles only the ~k hot ones.
    */
  def heavyHitters(docs: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = tokens(docs, idCol, textCol)
      .filter(col("term").isNotNull)
      .select(col("term")).as[String]
    val candidates = toks.mapPartitions { it =>
      val summary = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        summary.get(t) match {
          case Some(c) => summary.update(t, c + 1)
          case None if summary.size < k => summary.update(t, 1L)
          case None =>
            // decrement-all step; amortized O(1) per input token
            val dead = summary.iterator.collect { case (s, 1L) => s }.toList
            summary.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(summary.remove)
        }
      }
      summary.keysIterator
    }.distinct().toDF("term")
    val total = toks.count()
    toks.toDF("term")
      .join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("n"))
      .filter(col("n") * k > total)
  }
}

/** Shared lexicons (public stopword lists, abbreviated). */
object Lexicons {
  val enStop: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it", "for", "on")

  /** (term, pos) closed-class lexicon for the rule-based tagger. */
  val posLexicon: Seq[(String, String)] = Seq(
    "the" -> "DT", "a" -> "DT", "an" -> "DT", "this" -> "DT", "that" -> "DT",
    "and" -> "CC", "or" -> "CC", "but" -> "CC",
    "of" -> "IN", "to" -> "IN", "in" -> "IN", "for" -> "IN", "on" -> "IN",
    "at" -> "IN", "by" -> "IN", "with" -> "IN", "from" -> "IN",
    "is" -> "VB", "are" -> "VB", "was" -> "VB", "were" -> "VB", "be" -> "VB",
    "it" -> "PRP", "he" -> "PRP", "she" -> "PRP", "they" -> "PRP",
    "we" -> "PRP", "i" -> "PRP", "you" -> "PRP")

  /** (term, lang) seed lexicon for language ID. */
  val langLexicon: Seq[(String, String)] = Seq(
    "the" -> "en", "and" -> "en", "of" -> "en", "to" -> "en", "in" -> "en",
    "is" -> "en", "that" -> "en", "it" -> "en", "for" -> "en", "on" -> "en",
    "el" -> "es", "la" -> "es", "de" -> "es", "que" -> "es", "y" -> "es",
    "en" -> "es", "un" -> "es", "los" -> "es", "se" -> "es", "por" -> "es",
    "le" -> "fr", "et" -> "fr", "les" -> "fr", "des" -> "fr", "une" -> "fr",
    "du" -> "fr", "est" -> "fr", "pour" -> "fr", "dans" -> "fr", "ce" -> "fr",
    "der" -> "de", "die" -> "de", "und" -> "de", "das" -> "de", "von" -> "de",
    "zu" -> "de", "mit" -> "de", "den" -> "de", "ein" -> "de", "ist" -> "de",
    "的" -> "zh", "是" -> "zh", "在" -> "zh", "了" -> "zh", "我" -> "zh",
    "有" -> "zh", "和" -> "zh", "不" -> "zh", "人" -> "zh", "这" -> "zh")
}
