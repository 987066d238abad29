package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the spark engine is fast"),
    (2L, "el motor es rapido y la memoria es grande"),
    (3L, "xyzzy plugh")
  ).toDF("doc_id", "text")

  test("language id picks the best lexicon and falls back to und") {
    val preds = TextAnalysis.langId(spark, docs, "doc_id", "text", Lexicons.langLexicon)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("quality metrics: counts, ttr, stopword ratio") {
    val q = TextAnalysis.quality(docs, "doc_id", "text", Lexicons.enStop)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Long]("n_tokens") == 5)
    assert(q(1L).getAs[Double]("ttr") == 1.0)
    assert(q(1L).getAs[Double]("stop_ratio") == 0.4) // "the", "is"
  }

  test("trending excludes stopwords and orders by count then term") {
    val top = TextAnalysis.trending(docs, "doc_id", "text", Lexicons.enStop, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.head == ("es", 2L))
    assert(!top.map(_._1).contains("the"))
  }

  test("fingerprints: bag-of-words fp is word-order invariant") {
    val shuffled = Seq((10L, "fast is engine spark the")).toDF("doc_id", "text")
    val fp1 = TextAnalysis.fingerprints(docs.filter("doc_id = 1"), "doc_id", "text")
      .select("fp_bow").head().getString(0)
    val fp2 = TextAnalysis.fingerprints(shuffled, "doc_id", "text")
      .select("fp_bow").head().getString(0)
    assert(fp1 == fp2)
  }

  test("chunks invariant: stride == size partitions the doc losslessly") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val back = TextAnalysis.chunks(docs, "doc_id", "text", chunkSize = 5, stride = 5)
      .orderBy("chunk_id").collect().map(_.getString(2)).mkString(" ")
    assert(back == text)
  }

  test("pos tagging: closed-class lexicon wins, then suffix rules, then NN") {
    val docs = Seq((1L, "the running dog barked quickly over walls in it")).toDF("doc_id", "text")
    val tags = TextAnalysis.posTag(spark, docs, "doc_id", "text")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(tags("the") == "DT")      // lexicon beats the '-e' / default rules
    assert(tags("running") == "VBG")
    assert(tags("barked") == "VBD")
    assert(tags("quickly") == "RB")
    assert(tags("walls") == "NNS")
    assert(tags("in") == "IN")       // lexicon beats nothing else
    assert(tags("it") == "PRP")
    assert(tags("dog") == "NN")
  }

  test("spell correction: distance-1 typos map to the most frequent vocab term") {
    val vocab = Seq(
      ("spark", 100L), ("spare", 40L), ("shark", 90L), ("query", 50L)
    ).toDF("term", "freq")
    val suspects = Seq(
      (1L, "sparkx"), // insert: delete-of-typo == vocab word
      (2L, "spak"),   // delete: typo == delete-of-vocab ("spark"/"spak"? lev=1)
      (3L, "sparc"),  // substitution: spark (100) beats spare (40), both lev 1
      (4L, "query"),  // known word: returned as-is
      (5L, "zzzzzz")  // no candidate within distance 1: dropped
    ).toDF("id", "typo")
    val out = Spell.correct(vocab, suspects).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(1L) == (("spark", 100L)))
    assert(out(2L) == (("spark", 100L)))
    assert(out(3L) == (("spark", 100L)))
    assert(out(4L) == (("query", 50L)))
    assert(!out.contains(5L))
  }

  test("repetition ratio: repeated bigrams score high, unique text scores 0") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),       // 4 bigrams, 1 distinct
      (2L, "all words here are different"),   // 4 bigrams, all distinct
      (3L, "x")                               // < n tokens: dropped
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 1L, 0.75)))
    assert(r(2L) == ((4L, 4L, 0.0)))
    assert(!r.contains(3L))
  }

  test("chunks: stride windows cover the doc, final partial chunk kept") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val c = TextAnalysis.chunks(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(c.toSeq == Seq(
      (0L, "t1 t2 t3 t4", 4L),
      (1L, "t4 t5 t6 t7", 4L),
      (2L, "t7 t8 t9 t10", 4L),
      (3L, "t10", 1L)))
  }

  test("packChunks: per-shard prefix-sum binning, never crossing shards") {
    import org.apache.spark.sql.functions.col
    // shard A: chunks of 4,4,4,2 tokens, budget 8 → seqs 0,0,1,1
    // shard B: 7,7 → seqs 0,0 (7 before-second < 8); B restarts at 0
    val ch = Seq(
      ("A", 1L, 0L, 4L), ("A", 1L, 1L, 4L), ("A", 2L, 0L, 4L), ("A", 2L, 1L, 2L),
      ("B", 3L, 0L, 7L), ("B", 3L, 1L, 7L)
    ).toDF("source", "doc_id", "chunk_id", "n_chunk_tokens")
    val out = TextAnalysis.packChunks(ch, "source",
        Seq(col("doc_id"), col("chunk_id")), "n_chunk_tokens", budget = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(out.toSeq == Seq(
      ("A", 1L, 0L, 0L), ("A", 1L, 1L, 0L), ("A", 2L, 0L, 1L), ("A", 2L, 1L, 1L),
      ("B", 3L, 0L, 0L), ("B", 3L, 1L, 0L)))
  }

  test("tfidf: corpus-wide terms score zero-ish, rare terms rank first") {
    val corpus = Seq(
      (1L, "common rare1 common common"),
      (2L, "common filler filler"),
      (3L, "common other words")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val d1 = top.filter(_._1 == 1L).sortBy(_._4)
    // "rare1" (df=1) must outrank "common" (df=3) despite tf 1 vs 3
    assert(d1.head._2 == "rare1")
    // smoothed idf of an every-doc term: ln(4/4) = 0 → score 0
    assert(d1.find(_._2 == "common").forall(_._3 == 0.0))
  }

  test("vocabStats: rank by freq desc then term, cum_frac reaches 1 at full k") {
    val corpus = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabStats(corpus, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._3)
    assert(v.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", 3L, 1L), ("b", 2L, 2L), ("c", 1L, 3L)))
    assert(v.head._4 == 0.5 && v.last._4 == 1.0)
  }

  test("ngramCounts: bigram table ordered by count desc then gram") {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val grams = TextAnalysis.ngramCounts(corpus, "text", n = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(grams == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("redactPii scrubs all emails and 555-phones, leaves the rest") {
    import org.apache.spark.sql.functions.{col, lit}
    val out = Seq("mail bob.smith@corp.io and jo@x.net or 555-1234 not 5555-1234x")
      .toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("r")).head().getString(0)
    assert(out == "mail <EMAIL> and <EMAIL> or <PHONE> not 5555-1234x")
  }

  test("tokenEntropy: zero for constant docs, log2(n) for uniform, bounded") {
    val d = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b c")).toDF("doc_id", "text")
    val e = TextAnalysis.tokenEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(e(1L) == ((4L, 1L, 0.0)))
    assert(e(2L) == ((4L, 4L, 2.0)))
    val (n3, t3, h3) = e(3L)
    assert(n3 == 4L && t3 == 3L)
    assert(h3 > 0.0 && h3 < math.log(3.0) / math.log(2.0) + 1e-9)
  }

  test("bigramPerplexity: deterministic corpus scores ppl >= 1, repeated bigram lowest") {
    val d = Seq((1L, "x y x y x y"), (2L, "p q r s t")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramPerplexity(d, "doc_id", "text", k = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == 5L && out(2L)._1 == 4L)
    assert(out(1L)._3 >= 1.0 && out(2L)._3 >= 1.0)
    // doc 1 repeats its bigrams — its corpus-LM perplexity must be lower
    assert(out(1L)._3 < out(2L)._3)
  }

  test("oovAudit counts tokens outside the derived top-k vocab") {
    // corpus freqs: a:4, b:3, c:1, d:1 -> top-2 vocab = {a, b}
    val d = Seq((1L, "a a b c"), (2L, "a a b b d")).toDF("doc_id", "text")
    val out = TextAnalysis.oovAudit(d, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((4L, 1L)))  // c is OOV
    assert(out(2L) == ((5L, 1L)))  // d is OOV
  }

  test("sourceKl: zero when a source matches the corpus mix, positive when skewed") {
    // s1 and s2 have IDENTICAL term distributions -> corpus == each -> KL 0
    val even = Seq((1L, "s1", "a b"), (2L, "s2", "a b")).toDF("doc_id", "source", "text")
    val kl0 = TextAnalysis.sourceKl(even, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl0("s1") == 0.0 && kl0("s2") == 0.0)
    val skew = Seq((1L, "s1", "a a a a"), (2L, "s2", "a b c d")).toDF("doc_id", "source", "text")
    val kl = TextAnalysis.sourceKl(skew, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("s1") > 0.0 && kl("s2") > 0.0)
    // s1 diverges more: all its mass sits on one term at 1.6x its corpus
    // rate (1*log2(1.6) = 0.678) vs s2's mixed over/under-weights (0.420)
    assert(kl("s1") > kl("s2"))
  }

  test("textRank: hub term outranks leaves; every graph vertex is scored") {
    // star graph: "hub" adjacent to each leaf, leaves never adjacent;
    // trailing "hub" closes the walk so every leaf edge has weight 2
    val d = Seq((1L, "hub a hub b hub c hub d hub")).toDF("doc_id", "text")
    val ranked = TextAnalysis.textRank(d, "text", iters = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(ranked.head._1 == "hub")
    assert(ranked.map(_._1).toSet == Set("hub", "a", "b", "c", "d"))
    assert(ranked.forall(_._2 > 0.0))
    // leaves are symmetric under the graph — identical scores
    assert(ranked.filter(_._1 != "hub").map(_._2).distinct.size == 1)
  }

  test("luhnMod: known-valid card shapes score 0, corrupted ones do not") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("4532015112830366", true),  // textbook-valid 16-digit
      ("4532015112830367", false), // last digit corrupted
      ("79927398713", true),       // the classic odd-length Luhn example
      ("79927398710", false)
    ).toDF("card", "expected")
    val out = cases.select(col("expected"),
        (TextAnalysis.luhnMod(col("card")) === 0).as("valid"))
      .collect().map(r => r.getBoolean(0) == r.getBoolean(1))
    assert(out.forall(identity))
  }

  test("heavyHitters: exact answer despite a sketch capacity below vocab size") {
    // vocab 26 >> k=4, skew: 'hot' 40×, 'warm' 12×, singletons elsewhere.
    // Spread over 8 partitions so per-partition Misra-Gries must evict.
    val words = Seq.fill(40)("hot") ++ Seq.fill(12)("warm") ++
      ('a' to 'z').map(_.toString)
    val corpus = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      .repartition(8)
    val k = 4
    val out = TextAnalysis.heavyHitters(corpus, "doc_id", "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute-force truth: count > N/k = 78/4 = 19.5 → only 'hot'
    assert(out == Map("hot" -> 40L))
    // and with a looser threshold 'warm' (12 > 78/8=9.75) joins the set
    val out8 = TextAnalysis.heavyHitters(corpus, "doc_id", "text", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out8 == Map("hot" -> 40L, "warm" -> 12L))
  }

  test("pmiCollocations: hand PMI, count floor drops hapax pairs") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "w w"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L, k = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // unigrams x=3 y=2 z=1 w=2 (Nu=8); bigrams (x,y)=2 (x,z)=1 (w,w)=1
    // (Nb=4); floor=2 keeps only (x,y):
    // pmi = ln((2/4) / ((3/8)(2/8))) = ln(16/3)
    val expect = math.rint(math.log((2.0 / 4.0) /
      ((3.0 / 8.0) * (2.0 / 8.0))) * 1e6) / 1e6
    assert(out == Map(("x", "y") -> ((2L, expect))))
  }

  test("readability: regex counts and Flesch formula, zero-count floors") {
    import spark.implicits._
    val docs = Seq(
      // "The cat sat. It ran!" → 5 words, 2 sentences,
      // syllable groups: e|a|a|i|a → 5
      (1L, "The cat sat. It ran!"),
      (2L, "12345"), // 0 words, 0 sentences → floored denominators
      (3L, "beautiful day") // 1 sentence floor; eau|i|u + a = 4 groups...
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def fre(w: Long, s: Long, y: Long): Double = {
      val v = 206.835 - 1.015 * (w.toDouble / math.max(s, 1).toDouble) -
        84.6 * (y.toDouble / math.max(w, 1).toDouble)
      math.rint(v * 1e6) / 1e6
    }
    assert(out(1L) == ((5L, 2L, 5L, fre(5, 2, 5))))
    assert(out(2L) == ((0L, 0L, 0L, fre(0, 0, 0))))
    // "beautiful day": eau|i|u|ay → 4 vowel groups, 2 words, 0 sentences
    assert(out(3L) == ((2L, 0L, 4L, fre(2, 0, 4))))
  }
}
