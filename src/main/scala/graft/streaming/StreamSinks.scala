package graft.streaming

import graft.search.Collections
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, Row}

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming sinks beyond the built-ins.
  *
  * [[keyedUpsertSink]] is the reference's continuous indexing step — tweets
  * streamed into Solr with overwrite-on-add keyed by id
  * (`Ranking Model/src/main/java/Main/SolrIndexer.java:47-59`) — as a
  * Structured Streaming `foreachBatch` merge into a parquet "collection".
  */
object StreamSinks {

  /** Merge each micro-batch into a keyed parquet collection, keep-latest
    * per id ([[Collections.upsertLatest]] — dedupes the batch by
    * `versionCol`, then anti-join + union against the current snapshot).
    *
    * Snapshot isolation without a table format: every batch writes a NEW
    * versioned directory (`v<batchId>`), then an atomic symlink swap makes
    * it the `current` snapshot — readers of `<dest>/current` never observe
    * a half-written merge, and the read-then-overwrite-same-path hazard
    * (Spark deletes the target before the reading job finishes) cannot
    * occur by construction. At real scale this whole sink is a table
    * format's MERGE (SCALE.md); the operator shape — dedup batch, anti-join
    * snapshot, union — is identical. Old versions are left for the table
    * format's job (GC/compaction); the spec covers the swap semantics.
    */
  def keyedUpsertSink(stream: DataFrame, idCol: String, versionCol: String,
                      dest: String, checkpoint: String): StreamingQuery = {
    Files.createDirectories(Paths.get(dest))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cur = Paths.get(dest, "current")
        val existing =
          if (Files.exists(cur)) spark.read.parquet(cur.toString)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], batch.schema)
        val next = Paths.get(dest, s"v$batchId")
        Collections.upsertLatest(existing, batch, idCol, versionCol)
          .write.mode("overwrite").parquet(next.toString)
        val tmp = Paths.get(dest, "current.tmp")
        Files.deleteIfExists(tmp)
        Files.createSymbolicLink(tmp, next.toAbsolutePath)
        Files.move(tmp, cur, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      .start()
  }
}
