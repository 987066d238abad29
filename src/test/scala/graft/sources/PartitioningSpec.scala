package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("ORC roundtrip preserves schema and values") {
    val dest = Files.createTempDirectory("orcout").resolve("t").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    Sinks.orc(df, dest)
    val back = Readers.orc(spark, dest)
    // file formats read back nullable; compare names and types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("corrupt JSON records land in _corrupt_record instead of failing") {
    val dir = Files.createTempDirectory("badjson")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "name": "ok"}
        |{"id": not-valid-json!!!
        |{"id": 3, "name": "also ok"}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val df = Readers.jsonWithCorrupt(spark, dir.toString, schema).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("filters on partition columns prune partitions at the scan") {
    val dest = Files.createTempDirectory("partout").resolve("t").toString
    val df = (0 until 100).map(i => (i.toLong, s"src${i % 4}", i * 1.0))
      .toDF("id", "source", "v")
    Sinks.partitionedTable(df, dest, Seq("source"))

    val q = spark.read.parquet(dest).filter(col("source") === "src1")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no file scan in plan"))
    // planning-time pruning: the partition predicate shows up as a
    // PartitionFilter on the scan (directory-level pruning), not a data
    // filter over all files
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("source"), s"PartitionFilters missing: ${scan.metadata}")
    assert(q.count() == 25)
  }

  test("range-clustered layout prunes row groups for range predicates") {
    val clustered = Files.createTempDirectory("rc").resolve("c").toString
    val scattered = Files.createTempDirectory("rc").resolve("s").toString
    val df = (0 until 10000).map(i => ((i * 7919) % 10000L, i.toLong))
      .toDF("k", "payload") // k in scrambled order
    Sinks.rangeClustered(df, clustered, numFiles = 8, clusterCols = Seq("k"))
    df.repartition(8).write.mode("overwrite").parquet(scattered)

    // rows the parquet scan PRODUCES (after pushed-filter row-group
    // skipping, before Spark's re-evaluation filter)
    def scanOutput(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("k") >= 9000)
      // drive THIS plan instance so its metrics populate (a separate
      // count() would execute a different query execution)
      assert(q.collect().length == 1000)
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.getOrElse(fail("no file scan"))
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(k,9000)"))
      scan.metrics("numOutputRows").value
    }
    val pruned = scanOutput(clustered)
    val full = scanOutput(scattered)
    // scattered: every file's row group spans the whole key range — nothing
    // skips, the scan emits all 10k rows. clustered: 7 of 8 files have
    // max(k) < 9000, so their row groups skip entirely.
    assert(full == 10000L, s"expected unclustered scan to read everything, got $full")
    assert(pruned <= 2000L, s"expected clustered scan to skip non-matching row groups, got $pruned")
  }
}
