package graft.tweets

import graft.SparkSpec
import graft.sources.Readers

class TweetNormalizeSpec extends SparkSpec {

  private lazy val raw = Readers.multilineJson(spark, resourcePath("tweets_fixture.json"),
    TweetSchema.raw)
  private lazy val normalized = TweetNormalize.normalize(raw).cache()

  test("normalize produces the canonical 24-column relation in order") {
    assert(normalized.columns.toSeq == TweetNormalize.ProcessedColumns)
  }

  test("only truthy possibly_sensitive drops; false and null are kept") {
    // 10 fixture rows: 9 kept (incl. possibly_sensitive=false id 9 and one
    // org_id=1 dup pair) + 1 truthy-sensitive dropped
    val orgIds = normalized.select("org_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(orgIds == Seq(1L, 1L, 2L, 9L, 100L, 101L, 200L, 201L))
  }

  test("truncated branches read extended_tweet paths") {
    val t2 = normalized.filter("org_id = 2").select("org_text").head().getString(0)
    assert(t2 == "Our team is now hiring engineers across the stack")
    val t201 = normalized.filter("org_id = 201").select("org_text").head().getString(0)
    assert(t201 == "They are still hiring for the platform team")
  }

  test("quoted tweets carry the permalink as org_url; retweets the first media url") {
    val quoted = normalized.filter("org_id = 200").select("org_url").head().getString(0)
    assert(quoted == "https://twitter.com/delta/status/200")
    val rt = normalized.filter("org_id = 100").select("org_url").head().getString(0)
    assert(rt == "https://t.co/100")
  }

  test("dedup keeps the latest observation per org_id") {
    val deduped = TweetNormalize.dedupKeepLatest(normalized)
    assert(deduped.count() == 7)
    val kept = deduped.filter("org_id = 1").head()
    assert(kept.getAs[String]("org_text") == "We are hiring! Apply now v2")
  }

  test("hiring filter keeps only hiring tweets") {
    val result = TweetNormalize.process(raw)
    val kept = result.select("org_id").collect().map(_.getLong(0)).sorted.toSeq
    // 1: "we are hiring", 2: "now hiring", 9: "apply now"/"to join",
    // 100: "join us", 201: "still hiring";
    // 200 ("nothing interesting") and 101 ("boring status") drop out.
    assert(kept == Seq(1L, 2L, 9L, 100L, 201L))
  }

  test("created_at parsing matches the reference regex chain") {
    val dt = normalized.filter("org_id = 100").select("org_datetime")
      .head().getTimestamp(0).toInstant.toString
    assert(dt == "2021-10-22T20:00:00Z")
  }
}
