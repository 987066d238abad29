package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges finds the classic greedy merge sequence") {
    // word freqs: abab x2, abc x1
    // pair counts round 1: (a,b)=5, (b,a)=2, (b,c)=1 -> merge (a,b)
    // round 2 on [ab,ab] x2, [ab,c] x1: (ab,ab)=2, (ab,c)=1 -> merge (ab,ab)
    // round 3: remaining pairs all count 1 -> early stop
    val docs = Seq((1L, "abab abc"), (2L, "abab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(spark, docs, "text", nMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(merges == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "ab", "abab", 2L)))
  }

  test("sampled driver-side learning ≡ exact distributed learning on the fixture") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Bpe.learnMerges(spark, fixture, "text", nMerges = 12)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // maxWords ≥ |vocab| → same word-frequency table → identical merges
    val sampled = Bpe.learnMergesLocal(fixture, "text", nMerges = 12)
    assert(sampled == exact)
    // a hard cap keeps the head of the merge list (freq-dominant words
    // carry the top pairs) and never crashes — the 100 TB posture
    val capped = Bpe.learnMergesLocal(fixture, "text", nMerges = 12, maxWords = 10)
    assert(capped.nonEmpty && capped.head._1 == 1)
  }

  test("batched learning ≡ one-merge-per-round learning for any batch width") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // batchTopK = 1 degenerates to the strict sequential loop (the floor
    // equals the argmax count, so guard #3 trims every batch to one)
    val strict = Bpe.learnMerges(spark, fixture, "text", nMerges = 10, batchTopK = 1)
      .collect().map(_.toSeq).toSeq
    Seq(4, 256).foreach { w =>
      val batched = Bpe.learnMerges(spark, fixture, "text", nMerges = 10, batchTopK = w)
        .collect().map(_.toSeq).toSeq
      assert(batched == strict, s"batchTopK=$w diverged from sequential BPE")
    }
  }

  test("batched learning cuts driver round-trips: fewer Spark jobs than " +
      "the sequential loop, identical merges") {
    // disjoint pairs with strictly decreasing counts — the Zipf shape
    // the batch acceptance proof is built for: one round accepts all 4
    // merges (vs 4 sequential rounds), then one empty round stops
    val docs = (Seq.fill(16)("aa") ++ Seq.fill(8)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(2)("dd"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    class JobCounter extends org.apache.spark.scheduler.SparkListener {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    def countJobs(body: => Seq[Seq[Any]]): (Int, Seq[Seq[Any]]) = {
      val c = new JobCounter
      spark.sparkContext.addSparkListener(c)
      try {
        val r = body
        // the listener bus is async — wait for the count to go quiet
        var last = -1
        var spins = 0
        while (c.n.get != last && spins < 50) {
          last = c.n.get; Thread.sleep(100); spins += 1
        }
        (c.n.get, r)
      } finally spark.sparkContext.removeSparkListener(c)
    }
    val (strictJobs, strict) = countJobs(
      Bpe.learnMerges(spark, docs, "text", nMerges = 4, batchTopK = 1)
        .collect().map(_.toSeq).toSeq)
    val (batchJobs, batched) = countJobs(
      Bpe.learnMerges(spark, docs, "text", nMerges = 4, batchTopK = 256)
        .collect().map(_.toSeq).toSeq)
    assert(batched == strict, "batched diverged from sequential BPE")
    assert(strict.map(_(3)) == Seq("aa", "bb", "cc", "dd"))
    // 4 accepted in one round: the batch must spend well under half the
    // sequential loop's jobs (2 collect rounds vs 5)
    assert(batchJobs * 2 < strictJobs,
      s"batch didn't cut round-trips: $batchJobs vs $strictJobs jobs")
  }

  test("tokenize replays learned merges per doc, order preserved") {
    val docs = Seq((1L, "abab abc"), (2L, "abab")).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(spark, docs, "text", nMerges = 5)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = Bpe.tokenize(docs, "doc_id", "text", learned)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // per-doc token stream, word order preserved: abab -> [abab]; abc -> [ab, c]
    assert(toks(1L) == List("abab", "ab", "c"))
    assert(toks(2L) == List("abab"))
    // unseen word: only applicable merges fire, rest stay characters
    val unseen = Bpe.tokenize(Seq((9L, "abba")).toDF("id", "text"), "id", "text", learned)
      .head().getSeq[String](1).toList
    assert(unseen == List("ab", "b", "a"))
  }

  test("tokenize scales with merge-list size (no per-merge expression nesting)") {
    // a 5000-entry merge list of irrelevant pairs plus the two real ones:
    // tree depth must not grow with the list, only the map literal does
    val docs = Seq((1L, "abab abc")).toDF("doc_id", "text")
    val noise = (1 to 5000).map(i => (s"x$i", s"y$i"))
    val merges = Seq(("a", "b"), ("ab", "ab")) ++ noise
    val toks = Bpe.tokenize(docs, "doc_id", "text", merges)
      .head().getSeq[String](1).toList
    assert(toks == List("abab", "ab", "c"))
  }

  test("greedy fold merges left-to-right without overlap") {
    // merging (a,a) over "aaaa" gives [aa, aa]; over "aaa" -> [aa, a];
    // per-doc stream concatenates the three words in order
    val docs = Seq((1L, "aaaa aaaa aaa")).toDF("id", "text")
    val out = Bpe.tokenize(docs, "id", "text", Seq(("a", "a")))
      .head().getSeq[String](1).toList
    assert(out == List("aa", "aa", "aa", "aa", "aa", "a"))
  }
}
