package graft.tweets

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's batch preprocessing pipeline
  * (`Spark/Tweets_preprocessing.py:102-473`) as declarative Spark algebra:
  * normalize the three tweet variants (original / retweet / quoted, each
  * truncated / untruncated) into the canonical 24-column relation
  * (SURVEY.md §1.5), drop sensitive rows, dedup keep-latest, filter to
  * hiring tweets.
  *
  * Differences from the reference, by design:
  *  - no driver round-trips: the reference collects id lists to the driver
  *    and filters with `isin` (`Tweets_preprocessing.py:112-115,232-234`);
  *    here sensitive filtering is a plain null-predicate and the
  *    quoted/retweet/original split is a single `when` classification —
  *    each row is routed exactly once, no anti-join needed;
  *  - deterministic dedup: windowed row_number instead of the reference's
  *    order-dependent `sort().drop_duplicates()`
  *    (`Tweets_preprocessing.py:156-157,464-466`);
  *  - six flatten branches are one parametric select builder; the union
  *    stays positional with a locked column order, as the reference's CSV
  *    contract requires (`SolrIndexer.java:90-113`).
  *
  * Scale: the whole normalize is shuffle-free until the final dedup (one
  * shuffle on org_id); hiring filter and flatten are pure projections that
  * stay in WholeStageCodegen.
  */
object TweetNormalize {

  /** The canonical 24-column order (SURVEY.md §1.5). */
  val ProcessedColumns: Seq[String] = Seq(
    "org_id", "samp_id", "samp_datetime", "org_url", "org_media_url",
    "org_media_type", "org_attached_links", "org_text", "org_hashtags",
    "org_user_metions", "user_id", "user_name", "user_screen_name",
    "user_verified", "user_profile_image_url", "user_profile_banner_url",
    "user_profile_background_image_url", "user_followers_count",
    "user_friends_count", "org_favorite_count", "org_quote_count",
    "org_reply_count", "org_retweet_count", "org_datetime")

  /** Hiring-tweet regex alternation — semantics of the reference's term list
    * (`Tweets_preprocessing.py:584-589`).
    */
  val HiringTerms: Seq[String] = Seq(
    "REQUEST RECRUITMENT FORM", "is[\\S\\s]+hiring", "are[\\S\\s]+hiring",
    "is[\\S\\s]+recruiting", "are[\\S\\s]+recruiting", "application form",
    "now hiring", "hiring now", "now recruiting", "recruiting now",
    "'re[\\S\\s]+hiring", "'re[\\S\\s]+recruiting", "'re[\\S\\s]+interested",
    "recruitment form", "open positions", "interested .+candidates",
    "apply now", "to apply", "to join", "are looking for", "'re looking for",
    "to register", "join us", "send .+resume", "will .+hiring",
    "will .+recruiting", "still hiring", "are .+open", "hiring for",
    "recruiting for")

  /** Parse Twitter's `created_at` ("Thu Oct 21 18:57:29 +0000 2021"):
    * strip the weekday prefix and tz offset, then to_timestamp — the
    * reference's regexp chain (`Tweets_preprocessing.py:125-128`).
    */
  def parseCreatedAt(c: Column): Column =
    // try_to_timestamp: a malformed created_at yields null (the reference's
    // legacy-parser behavior) instead of failing the whole job under ANSI.
    try_to_timestamp(
      regexp_replace(ltrim(regexp_extract(c, "(\\ \\w+.+)", 1)), "(\\+\\d+\\ )", ""),
      lit("MMM dd HH:mm:ss yyyy"))

  /** One flatten branch: project the 24 columns out of a tweet rooted at
    * `p` ("" = top level, or "quoted_status"/"retweeted_status"), reading
    * the extended_tweet paths when the inner tweet is truncated.
    * `orgUrl` is the per-class permalink expression.
    */
  private def flatten(df: DataFrame, prefix: String, truncated: Boolean,
                      orgUrl: Column): DataFrame = {
    def p(f: String): String = if (prefix.isEmpty) f else s"$prefix.$f"
    val ent   = if (truncated) p("extended_tweet.entities") else p("entities")
    val media = if (truncated) p("extended_tweet.extended_entities.media")
                else p("extended_entities.media")
    val text  = if (truncated) col(p("extended_tweet.full_text")) else col(p("text"))
    df.select(
      col(p("id")).as("org_id"),
      col("samp_id"),
      col("samp_datetime"),
      orgUrl.as("org_url"),
      col(s"$media.media_url").as("org_media_url"),
      col(s"$media.type").as("org_media_type"),
      col(s"$ent.urls.expanded_url").as("org_attached_links"),
      text.as("org_text"),
      col(s"$ent.hashtags.text").as("org_hashtags"),
      // [sic] — the misspelling is the reference's column contract
      // (`Tweets_preprocessing.py:182`, consumed positionally by SolrIndexer).
      col(s"$ent.user_mentions.screen_name").as("org_user_metions"),
      col(p("user.id")).as("user_id"),
      col(p("user.name")).as("user_name"),
      col(p("user.screen_name")).as("user_screen_name"),
      col(p("user.verified")).as("user_verified"),
      col(p("user.profile_image_url")).as("user_profile_image_url"),
      col(p("user.profile_banner_url")).as("user_profile_banner_url"),
      col(p("user.profile_background_image_url")).as("user_profile_background_image_url"),
      col(p("user.followers_count")).as("user_followers_count"),
      col(p("user.friends_count")).as("user_friends_count"),
      col(p("favorite_count")).as("org_favorite_count"),
      col(p("quote_count")).as("org_quote_count"),
      col(p("reply_count")).as("org_reply_count"),
      col(p("retweet_count")).as("org_retweet_count"),
      parseCreatedAt(col(p("created_at"))).as("org_datetime"))
  }

  /** First media expanded_url, else null — the reference's
    * `convert_org_url_tostring` UDF (`Tweets_preprocessing.py:85-89`) as the
    * `element_at` built-in.
    */
  private def firstMediaUrl(mediaPath: String): Column =
    get(col(s"$mediaPath.expanded_url"), lit(0)) // null-safe under ANSI mode

  /** Normalize raw (nested, schema-inferred) tweets into the 24-column
    * relation. Routes each row to exactly one class — quoted takes
    * precedence over retweet (the reference's exclusion id-lists,
    * `Tweets_preprocessing.py:347-359`) — and unions the truncated /
    * untruncated flatten of each class.
    */
  def normalize(raw: DataFrame): DataFrame = {
    // Drop only TRUTHY possibly_sensitive — the reference's filter_func
    // (`Tweets_preprocessing.py:81-83`) collects ids where the flag is
    // truthy; `false` (the common real-world value) must be KEPT.
    def notSensitive(path: String) =
      coalesce(col(path), lit(false)) === false
    val base = raw
      .filter(notSensitive("possibly_sensitive"))
      .withColumn("samp_id", col("id"))
      .withColumn("samp_datetime", parseCreatedAt(col("created_at")))

    val quoted = base.filter(
      col("is_quote_status") === true && col("quoted_status").isNotNull &&
        notSensitive("quoted_status.possibly_sensitive"))
    val retweet = base.filter(
      !(col("is_quote_status") === true && col("quoted_status").isNotNull) &&
        col("retweeted_status").isNotNull &&
        notSensitive("retweeted_status.possibly_sensitive"))
    val original = base.filter(
      !(col("is_quote_status") === true && col("quoted_status").isNotNull) &&
        col("retweeted_status").isNull)

    val branches = Seq(
      flatten(quoted.filter(col("quoted_status.truncated") === true),
        "quoted_status", truncated = true, col("quoted_status_permalink.expanded")),
      flatten(quoted.filter(col("quoted_status.truncated") === false),
        "quoted_status", truncated = false, col("quoted_status_permalink.expanded")),
      flatten(retweet.filter(col("retweeted_status.truncated") === true),
        "retweeted_status", truncated = true,
        firstMediaUrl("retweeted_status.extended_tweet.extended_entities.media")),
      flatten(retweet.filter(col("retweeted_status.truncated") === false),
        "retweeted_status", truncated = false,
        firstMediaUrl("retweeted_status.extended_entities.media")),
      flatten(original.filter(col("truncated") === true),
        "", truncated = true,
        firstMediaUrl("extended_tweet.extended_entities.media")),
      flatten(original.filter(col("truncated") === false),
        "", truncated = false,
        firstMediaUrl("extended_entities.media")))

    branches.reduce(_ union _)
  }

  /** Keep the latest observation of each original tweet — deterministic
    * replacement for `sort + drop_duplicates` (`Tweets_preprocessing.py:464-466`).
    */
  def dedupKeepLatest(df: DataFrame): DataFrame =
    Relational.dedupKeepFirst(df,
      key = Seq(col("org_id")),
      order = Seq(col("samp_datetime").desc, col("samp_id").desc))

  /** Hiring filter (`Tweets_preprocessing.py:475-481`): lowercase, normalize
    * the curly apostrophe, rlike the 30-term alternation.
    */
  def hiringFilter(df: DataFrame): DataFrame =
    df.filter(
      regexp_replace(lower(col("org_text")), "[’]", "'")
        .rlike(HiringTerms.map(t => t.toLowerCase).mkString("|")))

  /** Full pipeline: normalize → dedup keep-latest → hiring filter. */
  def process(raw: DataFrame): DataFrame =
    hiringFilter(dedupKeepLatest(normalize(raw)))

  /** Streaming variant (SURVEY.md §2.10): the same normalize + hiring
    * projections run unchanged on a `readStream` frame; keep-latest becomes
    * watermarked first-wins `dropDuplicates` (streaming can't rank a key's
    * future rows; with the file source replaying batches in event-time
    * order, first-seen == the reference's sequential-file behavior).
    */
  def processStreaming(raw: DataFrame, watermark: String = "1 day",
                       dedupKeys: Seq[String] = Seq("org_id")): DataFrame =
    hiringFilter(normalize(raw))
      .withWatermark("samp_datetime", watermark)
      // WithinWatermark bounds the dedup state: plain dropDuplicates keeps
      // one state row per org_id forever (the watermark only evicts when
      // the event-time column is part of the dedup key). An UPSERT-aware
      // downstream (the reference indexer's overwrite loop) dedups on
      // (org_id, samp_datetime) instead: an at-least-once re-delivery of
      // the same observation is dropped, but an EDIT — same id, newer
      // timestamp — passes through to the stores' tombstone-upsert path.
      .dropDuplicatesWithinWatermark(dedupKeys)
}
