package graft.similarity

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall-under-drift floors for the frozen-space stores with TRAINED
  * state — PQ (round-12 verdict item 4) and IVF-PQ (whose coarse
  * centroids AND residual codebook both freeze at build; the shared
  * coarse space makes its incr/rebuild gap isolate residual-codebook
  * staleness). The round-7 lesson is that unmeasured ANN accuracy can
  * hide recall 0.0: the 20% batch arrives from a SHIFTED distribution,
  * runs through each store's own frozen-space append, and the audit
  * floor guards against catastrophic breakage — the corpus-level
  * measurement with the engine/oracle hash gate is `q_ann_drift`. SRP
  * and IVF need no drift rows: SRP signatures are per-row with constant
  * planes, and IVF's incremental chain keeps every seed id in the base
  * so incr and rebuild share identical centroids — both zero-delta by
  * construction (see [[Similarity.driftedEmbeddings]]).
  */
class AnnDriftSpec extends SparkSpec {
  import spark.implicits._

  test("PQ under a hard mean drift: the frozen-codebook incr store stays " +
      "serviceable (recall floor) and the retrained twin is measured " +
      "beside it") {
    def v(base: Float, d: Int) = Array.tabulate(8)(i => base + 0.01f * i + 0.001f * d)
    val emb = (
      (0L to 4L).map(i => (i, v(1.0f, i.toInt))) ++
      (5L to 9L).map(i => (i, v(-1.0f, i.toInt))) ++
      (10L to 14L).map(i => (i, v(0.3f, i.toInt)))
    ).toDF("vec_id", "embedding")
    val drifted = Similarity.driftedEmbeddings(emb)
    // the fixture genuinely drifts: every vec_id % 5 == 0 row moved
    assert(drifted.except(emb).count() == 3)

    val destIncr = Files.createTempDirectory("graft-pq-drift-incr").toString
    val destFull = Files.createTempDirectory("graft-pq-drift-full").toString
    PqStore.buildAt(destIncr, drifted.filter(col("vec_id") % 5 =!= 0))
    PqStore.appendBatch(spark, destIncr, drifted.filter(col("vec_id") % 5 === 0))
    PqStore.buildAt(destFull, drifted)

    val truth = (0L until 5L).flatMap(q =>
      Similarity.bruteForceTopK(drifted, "vec_id", "embedding", q, k = 4)
        .collect().map(r => (q, r.getLong(0)))).toSet
    def measure(dest: String): Double = {
      val cand = PqStore.topKMultiAt(spark, dest, drifted,
        maxQid = 5, k = 4, rerank = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // the serve contract holds under drift: k rows per query
      cand.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.length == 4, s"query $q returned ${rows.length} rows") }
      truth.count(cand.toSet.contains).toDouble / truth.size
    }
    val incr = measure(destIncr)
    val full = measure(destFull)
    assert(incr >= 0.6, s"frozen-space drift recall collapsed: $incr")
    assert(full >= 0.6, s"retrained drift recall collapsed: $full")
    graft.search.StoreAdmin.truncate(destIncr)
    graft.search.StoreAdmin.truncate(destFull)
  }

  test("IVF-PQ under the same drift: BOTH frozen artifacts (coarse " +
      "centroids shared by construction, residual codebook frozen on the " +
      "base) — recall floor for the incr store, retrained twin beside it") {
    def v(base: Float, d: Int) = Array.tabulate(8)(i => base + 0.01f * i + 0.001f * d)
    val emb = (
      (0L to 4L).map(i => (i, v(1.0f, i.toInt))) ++
      (5L to 9L).map(i => (i, v(-1.0f, i.toInt))) ++
      (10L to 14L).map(i => (i, v(0.3f, i.toInt)))
    ).toDF("vec_id", "embedding")
    val drifted = Similarity.driftedEmbeddings(emb)
    val destIncr = Files.createTempDirectory("graft-ivfpq-drift-incr").toString
    val destFull = Files.createTempDirectory("graft-ivfpq-drift-full").toString
    IvfPqStore.buildAt(destIncr, drifted.filter(
      col("vec_id") < IvfPqStore.DefaultNumCentroids || col("vec_id") % 5 =!= 0))
    IvfPqStore.appendBatch(spark, destIncr, drifted.filter(
      col("vec_id") >= IvfPqStore.DefaultNumCentroids && col("vec_id") % 5 === 0))
    IvfPqStore.buildAt(destFull, drifted)
    val truth = (0L until 5L).flatMap(q =>
      Similarity.bruteForceTopK(drifted, "vec_id", "embedding", q, k = 4)
        .collect().map(r => (q, r.getLong(0)))).toSet
    // nprobe = all clusters: with 15 vectors over 8 seed centroids the
    // clusters are near-singletons, so the floor isolates the ADC+rerank
    // quality rather than cluster-membership luck (the nprobe knob's own
    // curve is measured at corpus scale in SCALE.md)
    def measure(dest: String): Double = {
      val cand = IvfPqStore.topKMultiAt(spark, dest, drifted,
        maxQid = 5, k = 4, rerank = 8, nprobe = IvfPqStore.DefaultNumCentroids)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      cand.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.length == 4, s"query $q returned ${rows.length} rows") }
      truth.count(cand.toSet.contains).toDouble / truth.size
    }
    val incr = measure(destIncr)
    val full = measure(destFull)
    assert(incr >= 0.6, s"frozen-space ivfpq drift recall collapsed: $incr")
    assert(full >= 0.6, s"retrained ivfpq drift recall collapsed: $full")
    graft.search.StoreAdmin.truncate(destIncr)
    graft.search.StoreAdmin.truncate(destFull)
  }
}
