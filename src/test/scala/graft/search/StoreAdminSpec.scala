package graft.search

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkSpec}

/** The serving-store lifecycle contract (SolrCleanup analogue): every
  * persisted store can be emptied and rebuilt cleanly, and the rebuilt
  * store serves results identical to the first build — every store
  * family the engine persists (BM25 index + segmented variant,
  * SimHash signatures, SRP / IVF / PQ / IVF-PQ ANN stores), each
  * exercised through its real `q_*_served`-style driver query.
  */
class StoreAdminSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // one driver query per store family — each one's plan READS the store
  private val servedByStore = Seq(
    "q_keyword_bm25_served", // BM25Index
    "q_keyword_bm25_incr",   // BM25Index segmented (base + appended segment)
    "q_simhash_pairs",       // SimHashStore
    "q_ann_lsh_served",      // SrpStore
    "q_ann_lsh_incr",        // SrpStore append+compact lifecycle store
    "q_ann_filtered_served", // SrpLabelStore (label-partitioned sketch)
    "q_ann_ivf_served",      // IvfStore
    "q_ann_ivf_incr",        // IvfStore append+compact lifecycle store
    "q_ann_ivf_auto",        // IvfStore k-proportional-to-N config
    "q_ann_pq_served",       // PqStore
    "q_ann_pq_incr",         // PqStore frozen-codebook append lifecycle
    "q_ann_pq_big",          // PqStore ksub=256 config
    "q_ann_drift",           // PqStore drift-audit stores (incr + rebuild)
    "q_ann_ivfpq_served",    // IvfPqStore (residual IVFADC)
    "q_ann_ivfpq_incr",      // IvfPqStore frozen-space append lifecycle
    "q_ann_ivfpq_big",       // IvfPqStore non-toy config (nc=64, ksub=256)
    "q_ann_drift_lloyd",     // IvfPqStore Lloyd-coarse drift twins
    "q_ann_drift_lloyd_big", // Lloyd drift twins at the big config
    "q_ann_ivfpq_auto",      // IvfPqStore k-proportional-to-N config
    "q_ann_sq8_served",      // Sq8Store (packed int8 + scale)
    "q_ann_ivfsq8_served",   // IvfSq8Store (cluster-partitioned int8)
    "q_ann_ivfsq8_auto",     // IvfSq8Store k-proportional-to-N config
    "q_ann_retrain_policy",  // RetrainPolicy persisted decision audit
    "q_ann_lsh_stream",      // SrpStore streamed-ingest twin
    "q_hashtag_served",      // ServingStores posting layout
    "q_hashtag_incr",        // posting layout append+compact lifecycle
    "q_user_timeline_served", // ServingStores timeline layout
    "q_user_timeline_incr")  // timeline layout append+compact lifecycle

  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("truncateAll empties every store; rebuild serves byte-identical " +
      "results (deleteByQuery('*:*') + re-index round trip)") {
    // first build + serve
    val before = servedByStore.map(n => n -> snapshot(n)).toMap
    before.foreach { case (n, rows) =>
      assert(rows.nonEmpty, s"$n served nothing before truncate")
    }
    StoreAdmin.storeDirs(dir).foreach(d =>
      assert(Files.exists(Paths.get(d)), s"store $d missing after serve"))

    StoreAdmin.truncateAll(dir)
    assert(StoreAdmin.isEmpty(dir))
    assert(!BM25Index.isBuilt(BM25Index.defaultDir(dir)),
      "BM25 index claims built after truncate")

    // rebuild happens inside each query's ensureBuilt; results identical
    servedByStore.foreach { n =>
      assert(snapshot(n) == before(n), s"$n changed across truncate+rebuild")
    }
    StoreAdmin.storeDirs(dir).foreach(d =>
      assert(Files.exists(Paths.get(d)), s"store $d not rebuilt"))
  }

  test("crash mid-swap is recoverable: stamp-first delete means every " +
      "window either serves the old generation or rebuilds") {
    val store = ServingStores.ensureDocPostings(spark, dir)
    def probe() = ServingStores.postingProbe(spark, store, "the")
      .collect().map(_.toString).sorted.toSeq
    val before = probe()
    assert(before.nonEmpty)

    // window 1: crash after the stamp delete, before the sentinel delete
    // — the store still serves (old generation, consistent), and the
    // missing stamp forces the next ensure* to rebuild
    Files.delete(Paths.get(store, "source_stamp.txt"))
    assert(probe() == before, "stampless store must still serve old gen")
    assert(ServingStores.ensureDocPostings(spark, dir) == store)
    assert(Files.exists(Paths.get(store, "source_stamp.txt")),
      "ensure did not rebuild the stamp")
    assert(probe() == before, "rebuild changed the probe result")

    // window 2: crash after the sentinel delete — probes fail LOUDLY
    // (never a silent wrong answer), and ensure* rebuilds because the
    // stamp was already gone (stamp-first ordering; a surviving stamp
    // here would wedge the store forever)
    Files.delete(Paths.get(store, "source_stamp.txt"))
    Files.delete(Paths.get(store, "_buckets.txt"))
    intercept[Exception](probe())
    assert(ServingStores.ensureDocPostings(spark, dir) == store)
    assert(probe() == before, "recovered store differs from pre-crash")
  }

  test("gcOrphans reclaims rewrite-tmp leftovers without touching live " +
      "stores") {
    val store = ServingStores.ensureDocPostings(spark, dir)
    val orphan = Paths.get(store + "-rewrite-tmp")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-dead.parquet"), "junk")
    val before = ServingStores.postingProbe(spark, store, "the")
      .collect().map(_.toString).sorted.toSeq

    val removed = StoreAdmin.gcOrphans(dir)
    assert(removed.contains(orphan.toString), s"gc missed $orphan: $removed")
    assert(!Files.exists(orphan))
    assert(ServingStores.postingProbe(spark, store, "the")
      .collect().map(_.toString).sorted.toSeq == before,
      "gc changed a live store's probe result")
    assert(StoreAdmin.gcOrphans(dir).isEmpty, "gc is not idempotent")
  }

  test("maintain: the one-call sweep folds fragmented stores, purges " +
      "tombstoned layouts, spares the segmented-gate fixture, and is " +
      "idempotent") {
    // the gated chains run the sweep INTERNALLY — after them the upsert
    // layouts hold zero tombstones (the sweep's full purge ran) and the
    // appended-into timeline buckets are folded
    val upsertRows = snapshot("q_user_timeline_upsert")
    val incrRows = snapshot("q_user_timeline_incr")
    val bmIncrRows = snapshot("q_keyword_bm25_incr")
    assert(upsertRows.nonEmpty && incrRows.nonEmpty)
    val serving = ServingStores.defaultDir(dir)
    assert(!ServingStores.hasTombstones(s"$serving/orders_by_cust_upsert"),
      "the chain-wired sweep did not purge the upsert tombstones")

    // legitimately fragment a FLAT store (2 write generations), sweep,
    // assert the fold ran and a re-sweep is a no-op
    val simhash = graft.dedup.SimHashStore.defaultDir(dir)
    graft.dedup.SimHashStore.ensureBuilt(spark, dir)
    import spark.implicits._
    graft.dedup.SimHashStore.appendBatch(simhash,
      Seq((900001L, "maintain sweep fragmentation probe")).toDF("id", "text"),
      "id", "text")
    val actions = StoreAdmin.maintain(spark, dir)
    assert(actions.exists(_.contains("sig.parquet")),
      s"sweep did not fold the fragmented signature store: $actions")
    // the bm25 __incr fixture keeps its open segment across a sweep (its
    // identity IS base+segment; folding would force a rebuild loop)
    assert(Files.isDirectory(
      Paths.get(BM25Index.defaultDir(dir) + "__incr", "segments")),
      "maintain folded the segmented gate fixture")
    assert(snapshot("q_keyword_bm25_incr") == bmIncrRows)
    assert(snapshot("q_user_timeline_upsert") == upsertRows,
      "maintain changed served results")
    assert(snapshot("q_user_timeline_incr") == incrRows)
    val again = StoreAdmin.maintain(spark, dir)
    assert(again.isEmpty, s"maintain is not idempotent: $again")
    // the fragmented-then-folded signature store now diverges from its
    // source (the probe batch was synthetic) — drop it so later suites
    // rebuild from the corpus
    StoreAdmin.truncate(simhash)
  }

  test("maintain thresholds are a real merge policy: raising " +
      "foldAtGenerations defers the fold, the default takes it") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // an isolated fake corpus dir keys its own store roots, so the sweep
    // cannot touch the real sf0.001 stores other suites serve from
    val fakeSf = Files.createTempDirectory("graft-maintain-thresh").toString
    val srp = graft.similarity.SrpStore.defaultDir(fakeSf)
    val emb = (0 until 20).map(i =>
        (i.toLong, Array.tabulate(16)(j => (i * 7 + j).toFloat / 100f)))
      .toDF("vec_id", "embedding")
    graft.similarity.SrpStore.buildAt(srp, emb.filter(col("vec_id") < 16))
    graft.similarity.SrpStore.appendBatch(srp,
      emb.filter(col("vec_id") >= 16)) // 2 write generations now
    val deferred = StoreAdmin.maintain(spark, fakeSf, foldAtGenerations = 3)
    assert(!deferred.exists(_.contains("srp")),
      s"foldAtGenerations=3 must defer a 2-generation fold: $deferred")
    val taken = StoreAdmin.maintain(spark, fakeSf)
    assert(taken.exists(a => a.startsWith("fold") && a.contains(srp)),
      s"default policy must fold the 2-generation store: $taken")
    assert(StoreAdmin.maintain(spark, fakeSf).isEmpty, "sweep not idempotent")
    intercept[IllegalArgumentException](
      StoreAdmin.maintain(spark, fakeSf, foldAtGenerations = 1))
    StoreAdmin.truncate(srp)
  }

  test("truncate is idempotent and scoped: absent store is a no-op, other " +
      "corpora untouched") {
    StoreAdmin.truncate("/tmp/graft-no-such-store") // must not throw
    StoreAdmin.truncate("/tmp/graft-no-such-store")
    // a sibling corpus store survives a truncateAll for THIS corpus
    val otherDir = "/root/testdata/sf0.01"
    val other = BM25Index.ensureBuilt(spark, otherDir)
    StoreAdmin.truncateAll(dir)
    assert(Files.exists(Paths.get(other)),
      "truncateAll(dir) deleted a different corpus's store")
    assert(BM25Index.isBuilt(other))
  }
}
