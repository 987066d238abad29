package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** In-flight pipeline metrics via `Dataset.observe`: admission counters
  * (rows seen, null payloads, bytes) collected DURING the action that
  * already runs — no second scan, no collect. The ops face of the DQ
  * gate (q_dq_checks audits a table at rest; this instruments the write
  * path itself — at 100 TB a dedicated metrics pass is a full extra
  * read).
  */
class ObservationSpec extends SparkSpec {
  import spark.implicits._

  test("observe collects admission metrics during the action, once") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, "gamma")
    ).toDF("doc_id", "text")
    val obs = Observation("admission")
    val gated = docs
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"),
        sum(coalesce(length(col("text")), lit(0))).cast("long").as("chars"))
      .filter(col("text").isNotNull) // the gate the metrics instrument
    // one action drives BOTH the pipeline and the metrics
    assert(gated.count() == 2)
    val m = obs.get
    assert(m("rows_seen") == 3L, "metrics must see PRE-gate rows")
    assert(m("null_texts") == 1L)
    assert(m("chars") == 15L) // "alpha beta" (10) + "gamma" (5)
  }
}
