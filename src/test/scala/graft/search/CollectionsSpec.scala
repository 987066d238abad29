package graft.search

import graft.SparkSpec
import graft.sources.Readers
import graft.tweets.{TweetNormalize, TweetSchema}
import org.apache.spark.sql.functions._

class CollectionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val processed = TweetNormalize.dedupKeepLatest(
    TweetNormalize.normalize(
      Readers.multilineJson(spark, resourcePath("tweets_fixture.json"), TweetSchema.raw)))
    .cache()

  private lazy val usersC = Collections.users(processed).cache()
  private lazy val tweetsC = Collections.tweets(processed).cache()

  test("collections carry the Solr schemas, one row per id") {
    assert(usersC.columns.toSet.contains("userScreenName"))
    assert(tweetsC.columns.toSet.contains("tweetHashtags"))
    assert(usersC.select("id").distinct().count() == usersC.count())
    assert(tweetsC.select("id").distinct().count() == tweetsC.count())
    assert(tweetsC.count() == 7) // org ids 1,2,9,100,101,200,201
  }

  test("upsert replaces same-id rows and appends new ones") {
    val updates = Seq(
      ("1", "11", "updated text"), ("999", "11", "brand new")
    ).toDF("id", "userID", "tweetText")
    val merged = Collections.upsert(
      tweetsC.select("id", "userID", "tweetText"), updates, "id")
    assert(merged.count() == 8)
    assert(merged.filter(col("id") === "1").head().getAs[String]("tweetText")
      == "updated text")
    assert(merged.filter(col("id") === "999").count() == 1)
  }

  test("upsertLatest dedups a raw update batch by version before merging") {
    val updates = Seq(
      ("1", 100L, "old update"), ("1", 200L, "new update")
    ).toDF("id", "version", "tweetText")
    val merged = Collections.upsertLatest(
      tweetsC.select(col("id"), org.apache.spark.sql.functions.lit(0L).as("version"),
        col("tweetText")),
      updates, "id", "version")
    assert(merged.filter(col("id") === "1").count() == 1)
    assert(merged.filter(col("id") === "1").head().getAs[String]("tweetText")
      == "new update")
  }

  test("keyword search scores tweets and resolves authors in one join") {
    val hits = Collections.keywordSearch(tweetsC, usersC, Seq("hiring", "apply"), 5)
      .collect()
    assert(hits.nonEmpty)
    val top = hits.head
    assert(top.getAs[String]("tweetText").toLowerCase.contains("hiring"))
    assert(top.getAs[String]("userScreenName") != null)
  }

  test("multi-field search ranks a tweet whose match is OCR-only") {
    // media text for tweet 2 carries terms that appear in NO tweet's text;
    // tweet 2 has TWO media items — they must merge into one field, not
    // fan the tweet row out
    val mediaText = Seq(
      ("2", "stub ocr zebra unicorn banner"),
      ("2", "stub ocr second image")).toDF("id", "media_text")
    val withMedia = Collections.tweetsWithMediaText(processed, mediaText)
    assert(withMedia.columns.contains("tweetMediaText"))
    assert(withMedia.filter(col("id") === "2").count() == 1, "no fan-out on multi-media")
    assert(withMedia.filter(col("id") === "2").head()
      .getAs[String]("tweetMediaText").contains("zebra"))
    // non-media tweets carry "" (never null — BM25 tokenization drops them)
    assert(withMedia.filter(col("tweetMediaText").isNull).count() == 0)
    val multi = Collections.keywordSearchMultiField(withMedia, usersC,
      Seq("zebra", "unicorn"), 5).collect().map(_.getAs[String]("tweet_id")).toSet
    assert(multi == Set("2"), "OCR-only match must rank in multi-field search")
    val single = Collections.keywordSearch(tweetsC, usersC,
      Seq("zebra", "unicorn"), 5).collect().map(_.getAs[String]("tweet_id")).toSet
    assert(single.isEmpty, "fixture invariant: no tweet text matches these terms")
  }

  test("REAL OCR: PNG media -> decode -> recognize -> index field -> search") {
    // The full reference enrichment loop (SolrIndexer.java:115-129) with
    // nothing stubbed: render term-bearing PNGs, attach to tweet 2, run
    // the real decoder + matcher, merge into tweetMediaText, search.
    import graft.multimodal.{GlyphOcr, Multimodal}
    val media = Seq(
      ("2", GlyphOcr.renderPng("ZEBRA UNICORN")),
      ("2", GlyphOcr.renderPng("BANNER 99")),
      ("9", Array[Byte](9, 9, 9)) // corrupt media must index as ""
    ).toDF("id", "media")
    val mediaText = Multimodal.ocrText(media, "media").select("id", "media_text")
    val withMedia = Collections.tweetsWithMediaText(processed, mediaText)
    val t2 = withMedia.filter(col("id") === "2").head().getAs[String]("tweetMediaText")
    assert(t2.contains("ZEBRA UNICORN") && t2.contains("BANNER 99"))
    assert(withMedia.filter(col("id") === "9").head()
      .getAs[String]("tweetMediaText") == "")
    val hits = Collections.keywordSearchMultiField(withMedia, usersC,
      Seq("zebra", "unicorn"), 5).collect().map(_.getAs[String]("tweet_id")).toSet
    assert(hits == Set("2"), "text recovered by real OCR must be searchable")
  }

  test("hashtag search matches the array exactly") {
    val hits = Collections.hashtagSearch(tweetsC, "hiring")
      .select("id").collect().map(_.getString(0)).toSet
    assert(hits == Set("1"))
  }

  test("user timeline expands the FK newest-first") {
    val tl = Collections.userTimeline(tweetsC, usersC, "acme")
    val rows = tl.collect()
    assert(rows.map(_.getAs[String]("tweet_id")).toSeq == Seq("1"))
    assert(rows.head.getAs[String]("userScreenName") == "acme")
  }

  test("elevate: pins rank first in elevate.xml order, non-matching pin admitted at 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = (1L to 6L).toDF("doc")
    val scored = Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).toDF("doc", "score")
    // doc 6 never matched the query; doc 3 did — both pinned, 6 first
    val out = graft.search.Collections.elevate(corpus, scored, "doc",
      pinned = Seq(6L, 3L), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (6L, 0.0, true), (3L, 3.0, true),   // pins, configured order
      (1L, 5.0, false), (2L, 4.0, false))) // organic fill by score
  }
}
