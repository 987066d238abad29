package graft.search

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkSpec}

/** The serving-store lifecycle contract (SolrCleanup analogue): every
  * persisted store can be emptied and rebuilt cleanly, and the rebuilt
  * store serves results identical to the first build — the five store
  * families the engine persists (BM25 index + segmented variant,
  * SimHash signatures, SRP / IVF / PQ ANN stores), each exercised
  * through its real `q_*_served`-style driver query.
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
    "q_ann_ivf_served",      // IvfStore
    "q_ann_ivf_incr",        // IvfStore append+compact lifecycle store
    "q_ann_pq_served",       // PqStore
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
