package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the cat ran to the mat"),
    (3L, "xx", "der hund lief zum haus"),
    (4L, "xx", "the cat sat on the mat"), // raw doc that LOOKS like target
    (5L, "xx", "ein hund und eine katze")
  ).toDF("doc_id", "lang", "text")

  test("importanceWeights ranks target-like raw docs above unlike ones") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 1024)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 4 is byte-identical to target doc 1 → identical features,
    // identical score, despite being outside the target slice itself
    assert(w(4L)._2 == w(1L)._2)
    // both score strictly above the out-of-distribution docs
    assert(w(4L)._2 > w(3L)._2 && w(4L)._2 > w(5L)._2)
    // bag semantics: n_features = token count − 1 bigram occurrences
    assert(w.view.mapValues(_._1).toMap ==
      Map(1L -> 5L, 2L -> 5L, 3L -> 4L, 4L -> 5L, 5L -> 4L))
  }

  test("importanceWeights is partition-independent") {
    val a = Dsir.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en", 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Dsir.importanceWeights(docs.repartition(7), "doc_id", "text",
        col("lang") === "en", 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("selectTopK is deterministic on ties (score desc, id asc)") {
    val top = Dsir.selectTopK(docs, "doc_id", "text",
        col("lang") === "en", buckets = 1024, k = 3)
      .collect().map(_.getLong(0)).toSeq
    // doc 2 wins (its unique bigrams are exclusively target-side); docs 1
    // and 4 tie with identical text and id breaks the tie
    assert(top == Seq(2L, 1L, 4L))
  }
}
