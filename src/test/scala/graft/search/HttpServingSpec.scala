package graft.search

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end HTTP serving: real server on a real port, driven with the
  * JDK HTTP client, responses checked against the reference envelope
  * contract (Handler.java paths/params, Report Table 4 shapes).
  */
class HttpServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tweets = Seq(
    ("11", "7", "spark is hiring engineers", Seq("jobs"), "2021-03-01T10:00:00Z"),
    ("12", "7", "query engines are fast", Seq("perf"), "2021-03-02T10:00:00Z"),
    ("13", "8", "hello world", Seq("jobs"), "2021-03-03T10:00:00Z")
  ).toDF("id", "userID", "tweetText", "tweetHashtags", "tweetDateTime")

  private lazy val users = Seq(
    ("7", "ada", "Ada L"), ("8", "bob", "Bob D")
  ).toDF("id", "userScreenName", "userName")

  private def withServer(f: Int => Unit): Unit = {
    val server = HttpServing.start(0, HttpServing.referenceRoutes(tweets, users))
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, pathAndQuery: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$pathAndQuery")).build(),
      HttpResponse.BodyHandlers.ofString())

  private def json(body: String, path: String): String = {
    val row = Seq(body).toDF("j")
      .select(get_json_object(col("j"), path)).head()
    if (row.isNullAt(0)) null else row.getString(0)
  }

  test("requests racing store maintenance serve the old generation or " +
      "the error envelope — never a mixed generation — and the first " +
      "request after the swap succeeds (round-12 verdict item 6)") {
    val tidx = java.nio.file.Files.createTempDirectory("graft-http-maint").toString
    HttpServing.buildTweetIndex(tweets, users, tidx)
    ServingStores.appendPostings(
      Seq(("14", "7", "more jobs news", Seq("jobs"), "2021-03-04T10:00:00Z"))
        .toDF("id", "userID", "tweetText", "tweetHashtags", "tweetDateTime"),
      col("tweetHashtags"), s"$tidx/hashtags")
    val server = HttpServing.start(0, HttpServing.referenceRoutes(
      tweets, users, tweetIndexDir = Some(tidx)))
    try {
      val port = server.getAddress.getPort
      val before = get(port, "/api/search/hashtag?tag=jobs").body()
      assert(json(before, "$.count") == "3")
      var duringTmp: String = null
      var duringSwap: String = null
      ServingStores.testHookBeforeSwap = d => if (d.endsWith("/hashtags")) {
        // tmp materialized, store untouched: a racing request serves the
        // complete OLD generation
        duringTmp = get(port, "/api/search/hashtag?tag=jobs").body()
        // mid-swap (sentinel down): the route answers with the reference
        // error envelope — HTTP 200, status_code 500 — never a partial set
        val sentinel = java.nio.file.Paths.get(d, "_buckets.txt")
        val saved = java.nio.file.Files.readString(sentinel)
        java.nio.file.Files.delete(sentinel)
        duringSwap = get(port, "/api/search/hashtag?tag=jobs").body()
        java.nio.file.Files.writeString(sentinel, saved)
      }
      try ServingStores.compactPostings(spark, s"$tidx/hashtags")
      finally ServingStores.testHookBeforeSwap = _ => ()
      assert(duringTmp == before, "mid-maintenance request diverged from the old generation")
      assert(json(duringSwap, "$.status_code") == "500", duringSwap)
      // first request after the swap: the new generation, same rows
      assert(get(port, "/api/search/hashtag?tag=jobs").body() == before,
        "first request after the swap must serve the full new generation")
    } finally server.stop(0)
  }

  test("GET /api/search/query serves the keyword envelope over HTTP") {
    withServer { port =>
      val resp = get(port, "/api/search/query?query=spark%20engines")
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").get() == "application/json")
      assert(resp.headers().firstValue("Access-Control-Allow-Origin").get() == "*")
      val body = resp.body()
      assert(json(body, "$.status_code") == "200")
      assert(json(body, "$.message") == "Success")
      assert(json(body, "$.count") == "2")
      // both hits mention a term; best-ranked first
      assert(Set("11", "12").contains(json(body, "$.data[0].tweet.tweet_id")))
      assert(json(body, "$.data[0].user.userScreenName") == "ada")
    }
  }

  test("GET /api/search/hashtag serves id-ordered matches") {
    withServer { port =>
      val body = get(port, "/api/search/hashtag?tag=jobs").body()
      assert(json(body, "$.count") == "2")
      assert(json(body, "$.data[0].tweet.id") == "11")
      assert(json(body, "$.data[1].tweet.id") == "13")
      assert(json(body, "$.data[1].user.userScreenName") == "bob")
    }
  }

  test("GET /api/search/user serves one user plus newest-first timeline") {
    withServer { port =>
      val body = get(port, "/api/search/user?id=ada").body()
      assert(json(body, "$.user.userScreenName") == "ada")
      assert(json(body, "$.count") == "2")
      assert(json(body, "$.tweets[0].tweet_id") == "12") // newest first
      assert(json(body, "$.tweets[1].tweet_id") == "11")
      assert(json(body, "$.status_code") == "200")
    }
  }

  test("indexed keyword route: postings-store plan, byte-identical envelope") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-bm25").toString
    BM25Index.build(tweets, "id", "tweetText", dir)
    // the scoring plan reads the pruned postings store — no tokenize
    // (Generate/explode) anywhere in the request plan
    val indexed = Collections.keywordSearchIndexed(tweets, users, dir,
      Seq("spark", "engines"), k = 10)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("postings"), "plan must scan the postings store")
    assert(!plan.contains("Generate"), "served plan must not tokenize the corpus")
    // byte-identical envelopes: ad-hoc server vs indexed server
    val adhoc = HttpServing.start(0, HttpServing.referenceRoutes(tweets, users))
    val served = HttpServing.start(0,
      HttpServing.referenceRoutes(tweets, users, bm25IndexDir = Some(dir)))
    try {
      val q = "/api/search/query?query=spark%20engines"
      val a = get(adhoc.getAddress.getPort, q).body()
      val b = get(served.getAddress.getPort, q).body()
      assert(a == b, "served envelope must be byte-identical to ad hoc")
      assert(json(b, "$.status_code") == "200")
      assert(json(b, "$.count") == "2")
    } finally { adhoc.stop(0); served.stop(0) }
  }

  test("stored hashtag/user routes: bucket-pruned probe plans, " +
      "byte-identical envelopes (round-10 verdict item 7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-tidx").toString
    HttpServing.buildTweetIndex(tweets, users, dir)
    // plan shape: the probe reads ONE bucket of the posting store — no
    // array_contains over the corpus anywhere in the request plan
    val probe = ServingStores.postingProbe(spark, dir + "/hashtags", "jobs")
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("array_contains"),
      s"stored hashtag plan still scans the corpus:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"stored hashtag plan lost its bucket pruning:\n$plan")
    // byte-identical envelopes across both non-keyword routes, incl.
    // empty-match and unknown-user error shapes
    val adhoc = HttpServing.start(0, HttpServing.referenceRoutes(tweets, users))
    val served = HttpServing.start(0,
      HttpServing.referenceRoutes(tweets, users, tweetIndexDir = Some(dir)))
    try {
      for (q <- Seq("/api/search/hashtag?tag=jobs",
          "/api/search/hashtag?tag=perf",
          "/api/search/hashtag?tag=nosuch",
          "/api/search/user?id=ada",
          "/api/search/user?id=bob",
          "/api/search/user?id=nobody")) {
        val a = get(adhoc.getAddress.getPort, q).body()
        val b = get(served.getAddress.getPort, q).body()
        assert(a == b, s"$q: served envelope differs from ad hoc")
      }
    } finally { adhoc.stop(0); served.stop(0) }
  }

  test("missing params and unknown users return the error envelope, HTTP 200") {
    withServer { port =>
      // the reference embeds errors in the body and always answers 200
      val noQ = get(port, "/api/search/query")
      assert(noQ.statusCode() == 200)
      assert(json(noQ.body(), "$.status_code") == "500")
      assert(json(noQ.body(), "$.message") == "Internal Server Error")
      val noUser = get(port, "/api/search/user?id=nobody")
      assert(json(noUser.body(), "$.status_code") == "500")
    }
  }
}
