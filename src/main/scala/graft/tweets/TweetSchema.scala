package graft.tweets

import org.apache.spark.sql.types._

/** Explicit schema for raw Twitter v1.1 tweet JSON — every path the
  * normalize pipeline touches (SURVEY.md §1.1; paths from
  * `Spark/Tweets_preprocessing.py:120,138,141,176-190,235`).
  *
  * The reference relies on per-file schema inference
  * (`Tweets_preprocessing.py:103`), which (a) costs a full extra pass over
  * the data — prohibitive at 100 TB — and (b) mistypes any struct-array that
  * happens to be empty in a batch (an empty `urls: []` infers as
  * array<string> and breaks `.expanded_url` access). Declaring the schema
  * fixes both; inference remains available for exploration.
  */
object TweetSchema {

  val entities: StructType = StructType(Seq(
    StructField("hashtags", ArrayType(StructType(Seq(
      StructField("text", StringType))))),
    StructField("user_mentions", ArrayType(StructType(Seq(
      StructField("screen_name", StringType))))),
    StructField("urls", ArrayType(StructType(Seq(
      StructField("expanded_url", StringType)))))))

  val media: StructType = StructType(Seq(
    StructField("media_url", StringType),
    StructField("type", StringType),
    StructField("expanded_url", StringType)))

  val extendedEntities: StructType = StructType(Seq(
    StructField("media", ArrayType(media))))

  val extendedTweet: StructType = StructType(Seq(
    StructField("full_text", StringType),
    StructField("entities", entities),
    StructField("extended_entities", extendedEntities)))

  val user: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("screen_name", StringType),
    StructField("verified", BooleanType),
    StructField("followers_count", LongType),
    StructField("friends_count", LongType),
    StructField("profile_image_url", StringType),
    StructField("profile_banner_url", StringType),
    StructField("profile_background_image_url", StringType)))

  /** One tweet without the recursive quoted/retweeted nesting. */
  private def tweetFields: Seq[StructField] = Seq(
    StructField("id", LongType),
    StructField("created_at", StringType),
    StructField("text", StringType),
    StructField("truncated", BooleanType),
    StructField("possibly_sensitive", BooleanType),
    StructField("favorite_count", LongType),
    StructField("quote_count", LongType),
    StructField("reply_count", LongType),
    StructField("retweet_count", LongType),
    StructField("entities", entities),
    StructField("extended_entities", extendedEntities),
    StructField("extended_tweet", extendedTweet),
    StructField("user", user))

  val innerTweet: StructType = StructType(tweetFields)

  /** Top-level (sampled) tweet: inner tweet + quote/retweet envelopes. */
  val raw: StructType = StructType(tweetFields ++ Seq(
    StructField("is_quote_status", BooleanType),
    StructField("quoted_status_id", LongType),
    StructField("quoted_status_permalink", StructType(Seq(
      StructField("expanded", StringType)))),
    StructField("quoted_status", innerTweet),
    StructField("retweeted_status", innerTweet)))
}
