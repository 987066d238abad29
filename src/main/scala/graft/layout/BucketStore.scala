package graft.layout

import graft.util.{Stamp, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the co-located-join member of the engine's
  * build-once store family ([[graft.similarity.IvfStore]] prunes by
  * partition directory; this prunes and co-locates by BUCKET).
  *
  * Orders and lineitem are written ONCE, hash-bucketed (and sorted) on the
  * join key into the same bucket count. Every downstream orderkey
  * equi-join or orderkey aggregation then runs with ZERO pre-join/pre-agg
  * exchanges: Spark's bucketing metadata proves both sides already hash
  * to the same partitioning, so the sort-merge join consumes the scans
  * directly (asserted in `PlanHealthSpec` — no `Exchange` below the
  * join), and a point filter on the bucket key prunes the scan to
  * 1-of-N bucket FILES at planning time (`SelectedBucketsCount`).
  *
  * This is the 100 TB shape for a fact table that is joined on the same
  * key by every query in a workload: the shuffle is paid once at layout
  * time and amortized over every subsequent query, exactly like the
  * reference's Solr collections pay indexing cost once to serve every
  * search (`Ranking Model/src/main/java/Main/SolrIndexer.java:84-87`).
  * Bucket count scales with the corpus (buckets ∝ data / target
  * partition size) without changing the query shape.
  *
  * Catalog handling: bucketing metadata lives in the session catalog, so
  * a fresh session re-registers the table over the existing bucket files
  * with `CREATE TABLE ... CLUSTERED BY ... LOCATION` (bucket ids are
  * encoded in the file names Spark wrote, so re-registration preserves
  * the mapping); the data itself is rewritten only when the testdata
  * stamp changes.
  */
object BucketStore {

  val NumBuckets = 8

  def defaultDir(sfDir: String): String = {
    graft.util.StoreDirs.resolve("bucket-store-v1", sfDir)
  }

  private def tableName(sfDir: String, base: String): String =
    s"graft_b_${base}_" + sfDir.replaceAll("[^A-Za-z0-9]+", "_")

  /** Build-if-absent-or-stale, register-if-unregistered. Returns the
    * catalog names of the bucketed (orders, lineitem) tables.
    */
  def ensureBuilt(spark: SparkSession, sfDir: String): (String, String) = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "orders.parquet") + "\n" +
      Stamp.sourceStamp(sfDir, "lineitem.parquet")
    val fresh = Stamp.isFresh(dest, stamp)
    val oTbl = tableName(sfDir, "orders")
    val lTbl = tableName(sfDir, "lineitem")
    if (!fresh) {
      write(spark, Tables.orders(spark, sfDir), oTbl, "o_orderkey",
        s"$dest/orders")
      write(spark, Tables.lineitem(spark, sfDir), lTbl, "l_orderkey",
        s"$dest/lineitem")
      Stamp.write(dest, stamp)
    } else {
      register(spark, Tables.orders(spark, sfDir), oTbl, "o_orderkey",
        s"$dest/orders")
      register(spark, Tables.lineitem(spark, sfDir), lTbl, "l_orderkey",
        s"$dest/lineitem")
    }
    (oTbl, lTbl)
  }

  private def write(spark: SparkSession, df: DataFrame, name: String,
                    key: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.format("parquet")
      .bucketBy(NumBuckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Re-attach an existing bucket-file directory to this session's catalog
    * (schema from the source table, bucket spec re-declared).
    */
  private def register(spark: SparkSession, source: DataFrame, name: String,
                       key: String, path: String): Unit =
    if (!spark.catalog.tableExists(name)) {
      spark.sql(
        s"""CREATE TABLE $name (${source.schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
}
