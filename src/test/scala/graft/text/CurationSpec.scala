package graft.text

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // docs 1 and 2 are NEAR dups, not byte dups: 30 copies of "x" dominate
  // every simhash bit (margin ≥ 25) so the single differing token cannot
  // flip any bit — hamming 0 by construction, texts unequal. doc 3 is
  // unrelated. All are lexicon-English.
  private lazy val docs = {
    val base = "the engine is fast " + Seq.fill(30)("x").mkString(" ")
    Seq(
      (1L, s"$base alpha"),
      (2L, s"$base beta"),
      (3L, "completely different unique words the and of it for on")
    ).toDF("doc_id", "text")
  }

  test("exact-dedup curation keeps near-dups; cluster curation drops them") {
    val exact = Curation.curate(spark, docs, "doc_id", "text",
      lang = "en", minTtr = 0.0, tokenBudget = 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nearDup = Curation.curateNearDup(spark, docs, "doc_id", "text",
      lang = "en", minTtr = 0.0, tokenBudget = 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // texts differ byte-wise → exact dedup keeps both near-dups
    assert(exact == Set(1L, 2L, 3L))
    // cluster resolution keeps only the representative (min id)
    assert(nearDup == Set(1L, 3L))
  }

  test("budget stage spends highest-ttr docs first and stops at the cap") {
    // doc 3 has the highest type-token ratio (all-distinct tokens); with a
    // budget that fits only it, the repeat-heavy docs are excluded
    val out = Curation.curate(spark, docs, "doc_id", "text",
      lang = "en", minTtr = 0.0, tokenBudget = 12L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }
}
