package graft.tweets

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The reference's ordered-file replay (SURVEY.md §2.10) as a real
  * Structured Streaming job: file source over one-JSON-array-per-batch
  * files → normalize → hiring filter → watermarked dedup.
  */
class StreamingPipelineSpec extends SparkSpec {

  test("file-source streaming pipeline matches the batch org_id set") {
    val dir = Files.createTempDirectory("stream_in")
    Files.copy(Paths.get(resourcePath("tweets_fixture.json")),
      dir.resolve("tweets_1634810000.json"))

    val stream = spark.readStream
      .schema(TweetSchema.raw)
      .option("multiLine", value = true)
      .option("latestFirst", value = false)
      .json(dir.toString)

    val q = TweetNormalize.processStreaming(stream)
      .writeStream.format("memory").queryName("tweet_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tweet_stream_out")
        .select("org_id").collect().map(_.getLong(0)).toSet
      val batch = TweetNormalize.process(
        graft.sources.Readers.multilineJson(spark, resourcePath("tweets_fixture.json"),
          TweetSchema.raw))
        .select("org_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(streamed == Set(1L, 2L, 9L, 100L, 201L))
    } finally q.stop()
  }
}
