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

  test("tokenize replays learned merges and round-trips training words") {
    val docs = Seq((1L, "abab abc"), (2L, "abab")).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(spark, docs, "text", nMerges = 5)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = Bpe.tokenize(docs, "text", learned)
      .select("tokens").collect().map(_.getSeq[String](0).toList).toSet
    // abab -> one token after both merges; abc -> [ab, c]
    assert(toks == Set(List("abab"), List("ab", "c")))
    // unseen word: only applicable merges fire, rest stay characters
    val unseen = Bpe.tokenize(Seq((9L, "abba")).toDF("id", "text"), "text", learned)
      .select("tokens").head().getSeq[String](0).toList
    assert(unseen == List("ab", "b", "a"))
  }

  test("greedy fold merges left-to-right without overlap") {
    // merging (a,a) over "aaaa" must give [aa, aa]; over "aaa" -> [aa, a]
    val docs = Seq((1L, "aaaa aaaa aaa")).toDF("id", "text")
    val out = Bpe.tokenize(docs, "text", Seq(("a", "a")))
      .select("tokens").collect().map(_.getSeq[String](0).toList)
    assert(out.count(_ == List("aa", "aa")) == 2)
    assert(out.count(_ == List("aa", "a")) == 1)
  }
}
