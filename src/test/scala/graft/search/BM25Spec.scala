package graft.search

import graft.SparkSpec

class BM25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark query engine"),                        // both terms, short
    (2L, "spark spark spark filler filler filler filler filler"), // one term, repeated, long
    (3L, "query languages and query planners for query workloads"),
    (4L, "nothing relevant at all in this document"),
    (5L, "spark query spark query")                    // both terms, repeated, short
  ).toDF("doc_id", "text")

  test("docs containing both terms outrank single-term docs; misses are absent") {
    val top = BM25.scoreTopK(docs, "doc_id", "text", Seq("spark", "query"), 5).collect()
    val ids = top.map(_.getLong(0)).toSeq
    assert(!ids.contains(4L))
    assert(ids.take(2).toSet == Set(1L, 5L))
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("query terms pass through the same analyzer as documents") {
    val normalized = BM25.scoreTopK(docs, "doc_id", "text", Seq("Spark!", "QUERY", "spark"), 5)
      .collect().map(_.getLong(0)).toSet
    val plain = BM25.scoreTopK(docs, "doc_id", "text", Seq("spark", "query"), 5)
      .collect().map(_.getLong(0)).toSet
    // capitalization/punctuation/duplicates must not change the result set
    assert(normalized == plain)
  }

  test("scores are deterministic across runs") {
    val a = BM25.scoreTopK(docs, "doc_id", "text", Seq("spark", "query"), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val b = BM25.scoreTopK(docs, "doc_id", "text", Seq("spark", "query"), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(a == b)
  }
}
