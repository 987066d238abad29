package graft.layout

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("compaction: pinned file counts, nothing lost, ranges disjoint") {
    val audit = Compaction.audit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (sFiles, sRows, sSum) = audit("small")
    val (cFiles, cRows, cSum) = audit("compacted")
    assert(sFiles == Compaction.SmallFiles && cFiles == Compaction.CompactedFiles)
    assert(sRows == cRows && sSum == cSum, "rewrite lost or duplicated rows")

    // range partitioning must leave per-file id ranges DISJOINT — the
    // clustering min/max pruning relies on
    val dest = Compaction.defaultDir(sf)
    val ranges = spark.read.parquet(s"$dest/compacted.parquet")
      .select(input_file_name().as("f"), col("doc_id"))
      .groupBy(col("f"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == Compaction.CompactedFiles)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
      case _ =>
    }
  }
}
