package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now today"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps the min id") {
    val groups = Dedup.exact(docs, "doc_id", "text").collect()
    assert(groups.length == 3)
    val dupGroup = groups.find(_.getAs[Long]("n_docs") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("jaccard pairs finds near- and exact duplicates above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val exact = pairs.find(p => (p._1, p._2) == (1L, 4L)).get
    assert(exact._3 == 1.0)
  }

  test("minhash LSH finds the same high-similarity pairs as exact jaccard") {
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", n = 3,
      numHashes = 12, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact duplicates must always share all bands
    assert(lsh.contains((1L, 4L)))
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("simhash is identical for identical docs, differs for unrelated ones") {
    val hashes = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(4L))
    assert(hashes(1L) != hashes(3L))
    // near-dups should be close in hamming distance (not asserted exactly,
    // but must share most bits)
    val ham = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(ham <= 10, s"hamming distance $ham too large for near-dups")
  }
}
