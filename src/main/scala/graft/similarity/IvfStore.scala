package graft.similarity

import graft.expressions.GraftFunctions
import graft.util.{Stamp, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent IVF index — the cluster-partitioned member of the engine's
  * build-once serving family ([[graft.search.BM25Index]] for keyword
  * search, [[SrpStore]] for sketch-filtered ANN, `SimHashStore` for
  * near-dup): vectors are written ONCE, directory-partitioned by their
  * IVF cluster, plus a tiny (vec_id, cluster) forward table sorted by id.
  *
  * This is the layout the IVF recall/cost contract actually wants at
  * 100 TB: a query resolves its probe cluster(s) from the forward table
  * (row-group-pruned point read), then the vector scan is pruned to those
  * PARTITION DIRECTORIES at planning time (`PartitionFilters` — asserted
  * in the spec), i.e. it reads nprobe/nCentroids of the corpus from disk
  * instead of filtering it after a full scan, which is what the ad-hoc
  * [[Similarity.ivfTopK]] necessarily does. Scale the centroid count with
  * the corpus (k ∝ N) to hold per-partition size; swap the seed
  * centroids for trained ones ([[Similarity.kmeansAssign]]) without
  * changing the layout.
  *
  * The probe-cluster lookup is a 1-row driver fetch (the serving
  * boundary, same as [[graft.search.HttpServing]]'s envelope collects) —
  * it becomes the partition-pruning LITERAL, which is exactly why the
  * scan can prune statically. Freshness follows the family's
  * (name, size, mtime) stamp.
  */
object IvfStore {

  val NumCentroids = 8

  def defaultDir(sfDir: String): String = {
    val root = sys.env.getOrElse("GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/target/ivf-store-v1")
    root + "/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
  }

  /** Build-if-absent-or-stale; returns the store directory. */
  def ensureBuilt(spark: SparkSession, sfDir: String): String = {
    val dest = defaultDir(sfDir)
    val stamp = Stamp.sourceStamp(sfDir, "embeddings.parquet")
    if (!Stamp.isFresh(dest, stamp)) {
      val assigned = Similarity.ivfAssign(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", NumCentroids)
      assigned.select(col("vec_id"), col("embedding"), col("cluster"))
        .repartition(col("cluster"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$dest/vectors.parquet")
      assigned.select(col("vec_id"), col("cluster"))
        .coalesce(1).sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").parquet(s"$dest/byid.parquet")
      Stamp.write(dest, stamp)
    }
    dest
  }

  /** [[Similarity.ivfTopK]] (nprobe = 1) served from the store: identical
    * results, but the vector scan is pruned to the probe cluster's
    * partition directory instead of post-filtering a full corpus scan.
    */
  def topK(spark: SparkSession, sfDir: String, queryId: Long, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val dest = ensureBuilt(spark, sfDir)
    // serving-boundary point read: the query's cluster id, needed as a
    // literal so the partition filter prunes at planning time
    val qCluster = spark.read.parquet(s"$dest/byid.parquet")
      .filter(col("vec_id") === queryId)
      .head().getAs[Number]("cluster").longValue()
    val qv = spark.read.parquet(s"$dest/vectors.parquet")
      .filter(col("cluster") === qCluster && col("vec_id") === queryId)
      .select(col("embedding").as("__qv"))
    spark.read.parquet(s"$dest/vectors.parquet")
      .filter(col("cluster") === qCluster)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(Similarity.cosineFast("embedding", "__qv"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }
}
