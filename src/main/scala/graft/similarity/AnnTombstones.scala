package graft.similarity

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The [[graft.search.ServingStores]] tombstone contract shared by the
  * ANN store family (SRP / IVF / PQ): vectors are long-keyed, so the
  * side table is `(__id, __gen)` longs under `_tombstones/`, rows carry
  * the `__gen` that wrote them (`_gen.txt` counter, build = 0), a
  * tombstone kills strictly-older generations of its id, probes
  * anti-join the broadcast set only when one exists, and each store's
  * `compact` purges physically and clears the table. Writers hold the
  * store's [[graft.util.StoreLock]] (these stores' compactions are
  * whole-table rewrites with no segment model, so writer-vs-maintenance
  * collisions must fail loudly).
  */
private[similarity] object AnnTombstones {

  private val Dir = "_tombstones"
  private val schema = StructType(Seq(
    StructField("__id", LongType), StructField("__gen", LongType)))

  def has(dest: String): Boolean =
    Files.isDirectory(Paths.get(dest, Dir))

  def clear(dest: String): Unit = {
    val p = Paths.get(dest, Dir)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
    Files.deleteIfExists(Paths.get(dest, "_gen.txt"))
  }

  /** Monotonic store generation (single-writer contract, like the
    * serving layouts').
    */
  def nextGen(dest: String): Long = {
    val f = Paths.get(dest, "_gen.txt")
    val g = (if (Files.exists(f)) Files.readString(f).trim.toLong else 0L) + 1
    Files.createDirectories(f.getParent)
    Files.writeString(f, g.toString)
    g
  }

  /** Append the ids' tombstones at `gen` (first column of `ids`, cast
    * long, distinct).
    */
  def write(ids: DataFrame, dest: String, gen: Long): Unit =
    ids.select(col(ids.columns.head).cast("long").as("__id")).distinct()
      .withColumn("__gen", lit(gen))
      .coalesce(1).write.mode("append").parquet(s"$dest/$Dir")

  /** Drop rows a newer tombstone outranks; `rows` must carry `__gen`.
    * No-op (no join) when the store has never seen an upsert/delete.
    */
  def dropDead(spark: SparkSession, dest: String, rows: DataFrame,
               idCol: String): DataFrame =
    if (!has(dest)) rows
    else {
      val tb = spark.read.schema(schema).parquet(s"$dest/$Dir")
      rows.join(broadcast(tb),
        rows(idCol).cast("long") === tb("__id") &&
          rows("__gen") < tb("__gen"), "left_anti")
    }
}
