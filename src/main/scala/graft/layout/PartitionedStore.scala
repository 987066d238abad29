package graft.layout

import graft.util.{Stamp, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Directory-partitioned fact layout — the dynamic-partition-pruning
  * member of the layout family ([[BucketStore]] co-locates on the join
  * key, [[graft.similarity.IvfStore]] prunes on a STATIC literal; this
  * one is pruned by a RUNTIME value): orders written once, partitioned
  * by a dimension-aligned bucket column. A join against a filtered
  * dimension then plans a DynamicPruningExpression into the fact scan's
  * PartitionFilters — the fact directories that cannot match are never
  * listed or read, with the pruning VALUES coming from the dimension's
  * broadcast at runtime, not from any literal in the query.
  *
  * At 100 TB this is the difference between scanning a fact table and
  * scanning one partition of it whenever a query narrows the dimension
  * — the star-schema pattern DPP exists for.
  */
object PartitionedStore {

  def defaultDir(sfDir: String): String = {
    graft.util.StoreDirs.resolve("part-store-v1", sfDir)
  }

  /** Build-if-stale: orders partitioned by `o_bucket = o_custkey % 5`
    * (the region-aligned bucket: one directory per region key).
    */
  def ensureBuilt(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "orders.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      Tables.orders(spark, sfDir)
        .withColumn("o_bucket", (col("o_custkey") % 5).cast("int"))
        .repartition(col("o_bucket"))
        .write.mode("overwrite").partitionBy("o_bucket")
        .parquet(s"$dest/orders.parquet")
      Stamp.write(dest, stamp)
    }
    dest
  }

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensureBuilt(spark, sfDir)}/orders.parquet")
}
