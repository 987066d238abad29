package graft.tweets

import java.io.PrintWriter
import java.net.ServerSocket

import graft.SparkSpec

/** Live-socket ingest end-to-end: a real server socket pushes the fixture
  * tweets as NDJSON, the socket pipeline normalizes/filters/dedups them,
  * and the result matches the batch pipeline on the same fixture.
  */
class SocketIngestSpec extends SparkSpec {

  test("socket pipeline matches the batch org_id set; poison lines are dropped") {
    val batchRaw = graft.sources.Readers.multilineJson(
      spark, resourcePath("tweets_fixture.json"), TweetSchema.raw)
    val lines = batchRaw.toJSON.collect()
    val expected = TweetNormalize.process(batchRaw)
      .select("org_id").collect().map(_.getLong(0)).toSet

    val server = new ServerSocket(0)
    val feeder = new Thread(() => {
      val sock = server.accept() // Spark's socket source connects here
      val out = new PrintWriter(sock.getOutputStream, true)
      out.println("{ this is not json")   // poison: must be dropped, not fatal
      lines.foreach(out.println)
      out.flush()
      // keep the connection open; the source treats close as end-of-stream
      Thread.sleep(30000)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val q = TweetIngest.socketPipeline(spark, "localhost", server.getLocalPort)
      .writeStream.format("memory").queryName("socket_out")
      .outputMode("append").start()
    try {
      // socket delivery is asynchronous — poll until the pipeline has
      // produced the full expected set (or time out)
      val deadline = System.currentTimeMillis() + 60000
      var got = Set.empty[Long]
      while (got != expected && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.table("socket_out")
          .select("org_id").collect().map(_.getLong(0)).toSet
        if (got != expected) Thread.sleep(200)
      }
      assert(got == expected)
      assert(got == Set(1L, 2L, 9L, 100L, 201L))
    } finally {
      q.stop()
      server.close()
    }
  }
}
