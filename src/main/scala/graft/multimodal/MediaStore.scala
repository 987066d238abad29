package graft.multimodal

import graft.util.Stamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once persisted media corpora — the binary-column analogue of the
  * BM25 / SimHash / IVF serving stores: media arrives in a pipeline as
  * BYTES IN A TABLE (a crawl's image blobs, a video lake's MJPEG segments),
  * not as something re-encoded per query. The synthetic fixtures exist to
  * make decode chains oracle-replayable; persisting them once per corpus
  * makes every downstream query measure what the operator actually costs
  * at 100 TB — the demux/decode scan — instead of re-paying fixture
  * ENCODE on every run (the round-9 plan audit made this argument for
  * q_audio_energy in prose; this store makes it structural).
  *
  * Freshness follows the [[graft.util.Stamp]] contract: the stamp of the
  * source documents table is stored beside the data; a regenerated corpus
  * at the same path forces a rebuild. Dest is rooted at
  * `GRAFT_MEDIA_STORE_ROOT` (default `target/media-store-v1`), keyed by
  * fixture name + sanitized source dir, so SFs never collide.
  */
object MediaStore {

  private def destDir(sfDir: String, name: String): String =
    sys.env.getOrElse("GRAFT_MEDIA_STORE_ROOT", "target/media-store-v1") +
      "/" + name + "/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  /** Materialize `build` once per (name, source corpus) and serve the
    * persisted parquet thereafter. The stamp is written AFTER the data,
    * so a failed build can never present as fresh.
    */
  def ensure(spark: SparkSession, sfDir: String, name: String)
            (build: => DataFrame): DataFrame = {
    val dest = destDir(sfDir, name)
    val stamp = Stamp.sourceStamp(sfDir)
    if (!Stamp.isFresh(dest, stamp)) {
      build.write.mode("overwrite").parquet(dest + "/data")
      Stamp.write(dest, stamp)
    }
    // Every consumer of this table is DECODE-bound (demux + entropy decode
    // per blob), so scan parallelism — not scan bytes — is what sizes the
    // stage. A small corpus lands in one parquet file, which is ONE scan
    // split (a row group is the split floor), serializing the whole decode
    // onto a single core (optimization guide §2.5 "input skew: one huge
    // unsplittable file — repartition immediately after the read"; §6 split
    // sizing). Spread it only when the persisted layout is narrower than
    // the session's parallelism: at production scale the store has ≥ cores
    // worth of files and this branch is a no-op, so no blob bytes are ever
    // shuffled there.
    // Decide from the FILE LISTING, not df.rdd.getNumPartitions: the rdd
    // probe forced a full physical-plan conversion (planning the query
    // twice per read — r16 advice item), and pre-AQE scan splits can
    // overstate effective parallelism anyway. File count under-counts
    // splits when files exceed maxPartitionBytes — exactly the regime
    // where the store is big enough that the repartition branch must be
    // a no-op, so the conservative direction is right.
    val df = spark.read.parquet(dest + "/data")
    val p = spark.sparkContext.defaultParallelism
    val nFiles = graft.util.StoreFs.list(java.nio.file.Paths.get(dest, "data"))
      .count(_.getFileName.toString.endsWith(".parquet"))
    if (nFiles < p) df.repartition(p) else df
  }
}
