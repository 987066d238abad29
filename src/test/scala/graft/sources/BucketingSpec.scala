package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Proof that bucketing removes the join shuffle — the mechanism SCALE.md
  * relies on for the serving tables.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }.size

  test("join on the bucket key is shuffle-free; non-bucketed join shuffles") {
    val left = (0L until 200L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (0L until 200L).map(i => (i, i * 2)).toDF("id", "rv")

    Seq("b_left", "b_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
    Sinks.bucketedTable(left, "b_left", "id", 4)
    Sinks.bucketedTable(right, "b_right", "id", 4)
    val bucketed = spark.table("b_left").join(spark.table("b_right"), "id")
    val plain = left.join(right, "id")

    // disable broadcast + AQE so the static plan exposes its exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assert(shuffleCount(spark.table("b_left").join(spark.table("b_right"), "id")) == 0,
        "bucketed join must not shuffle")
      assert(shuffleCount(left.join(right, "id")) > 0,
        "non-bucketed join is expected to shuffle")
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
