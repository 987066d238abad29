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
}
