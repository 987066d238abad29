package graft

import graft.search.Collections
import graft.sources.Readers
import graft.tweets.{TweetNormalize, TweetSchema}
import org.apache.spark.sql.SparkSession

/** End-to-end demo of the reference system's full path on the bundled
  * fixture: raw nested JSON → 24-column normalize → collections →
  * the three serving query shapes. `sbt "runMain graft.TweetDemo [file]"`.
  */
object TweetDemo {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("src/test/resources/tweets_fixture.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Readers.multilineJson(spark, path, TweetSchema.raw)
    val processed = TweetNormalize.dedupKeepLatest(TweetNormalize.normalize(raw)).cache()
    println(s"processed relation: ${processed.count()} rows, " +
      s"${processed.columns.length} columns")

    val users = Collections.users(processed).cache()
    val tweets = Collections.tweets(processed).cache()
    println(s"collections: ${users.count()} users, ${tweets.count()} tweets")

    println("\n== keyword search: 'hiring apply' ==")
    Collections.keywordSearch(tweets, users, Seq("hiring", "apply"), 5).show(false)

    println("== hashtag search: #hiring ==")
    Collections.hashtagSearch(tweets, "hiring").select("id", "tweetText").show(false)

    println("== user timeline: @acme ==")
    Collections.userTimeline(tweets, users, "acme").show(false)

    println("== timeline for unknown user (graceful empty) ==")
    println(s"rows: ${Collections.userTimeline(tweets, users, "nobody").count()}")

    println("== upsert(t, t) idempotence ==")
    println(s"rows: ${Collections.upsert(tweets, tweets, "id").count()} " +
      s"(expect ${tweets.count()})")

    spark.stop()
  }
}
