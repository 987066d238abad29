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

  test("two-phase quota ≡ global-window reference on the documents fixture") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val fixture = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = Curation.curate(spark, fixture, "doc_id", "text",
      lang = "en", minTtr = 0.5, tokenBudget = 2500L)
    // reference semantics: one global running sum over (ttr desc, id asc)
    val w = Window.orderBy(col("ttr").desc, col("doc_id").asc)
    val ref = out.select(col("doc_id"), col("n_tokens"), col("ttr"))
      .unionByName(
        // rebuild the full filtered set the budget stage consumed, via the
        // same public stages, so the reference cutoff sees every candidate
        graft.dedup.Dedup.exact(fixture, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
          .join(TextAnalysis.quality(fixture, "doc_id", "text", Lexicons.enStop), "doc_id")
          .join(TextAnalysis.langId(spark, fixture, "doc_id", "text", Lexicons.langLexicon), "doc_id")
          .filter(col("pred_lang") === "en" && col("ttr") >= 0.5)
          .select(col("doc_id"), col("n_tokens"), col("ttr")))
      .distinct()
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 2500L)
    val a = out.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = ref.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, s"two-phase diverged: ${a.size} vs ${b.size} rows")
    assert(a.nonEmpty)
  }

  test("budget plan has no unpartitioned window (the 100 TB scale guard)") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Curation.curate(spark, fixture, "doc_id", "text",
      lang = "en", minTtr = 0.5, tokenBudget = 2500L)
      .queryExecution.executedPlan.toString
    val bad = "Window \\[[^\\]]*\\], \\[\\]".r // windowExprs, [] partition spec
    assert(bad.findFirstIn(p).isEmpty, s"unpartitioned Window in:\n$p")
  }

  test("budget stage spends highest-ttr docs first and stops at the cap") {
    // doc 3 has the highest type-token ratio (all-distinct tokens); with a
    // budget that fits only it, the repeat-heavy docs are excluded
    val out = Curation.curate(spark, docs, "doc_id", "text",
      lang = "en", minTtr = 0.0, tokenBudget = 12L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }

  test("alpha mixture up-weights the small source vs proportional") {
    // big source: 100 tokens, small: 4 → proportional share 4/104; sqrt
    // parts 10 vs 2 → alpha share 2/12. The small source's target fraction
    // must rise under alpha-weighting (the multilingual up-weighting rule).
    val mix = Seq(
      (1L, "big", Array.fill(100)("t").mkString(" ")),
      (2L, "small", Array.fill(4)("t").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val plan = Curation.mixturePlanAlpha(mix, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(plan("big") == ((10L, 104L * 10L / 12L)))
    assert(plan("small")._1 == 2L)
    val smallShare = plan("small")._2.toDouble / 104
    assert(smallShare > 4.0 / 104, "alpha must lift the small source's target")
  }

  test("interleave order rotates across sources, deterministic rank per source") {
    val mix = (1L to 30L).map(i => (i, s"src${i % 3}", s"doc $i"))
      .toDF("doc_id", "source", "text")
    val out = Curation.interleaveOrder(mix, "source", "doc_id")
      .orderBy($"intl_rank".asc, $"intl_key".asc)
      .select("source", "intl_rank").collect().map(r => (r.getString(0), r.getLong(1)))
    // global (rank, key) order visits every source once per rank round
    out.grouped(3).zipWithIndex.foreach { case (round, i) =>
      assert(round.map(_._1).toSet == Set("src0", "src1", "src2"),
        s"rank round $i must hold one doc of each source: ${round.mkString(",")}")
      assert(round.forall(_._2 == i + 1L))
    }
    // reproducible: same input, same order
    val again = Curation.interleaveOrder(mix.repartition(7), "source", "doc_id")
      .orderBy($"intl_rank".asc, $"intl_key".asc)
      .select("source", "intl_rank").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == again.toSeq)
  }
}
