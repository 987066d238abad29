package graft.search

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

/** Serving-store lifecycle admin — the engine's analogue of the
  * reference's collection cleanup (`Ranking Model/src/main/java/Main/
  * SolrCleanup.java:92-105`: `deleteByQuery("*:*")` + collection
  * deletion). The reference empties and drops Solr collections so a
  * pipeline can rebuild from scratch; here every persisted serving
  * artifact (BM25 inverted index + its segmented variant, SimHash
  * signature store, SRP / IVF / PQ ANN stores) lives under a
  * [[graft.util.Stamp]]-guarded directory, so the lifecycle op is:
  * delete the directory INCLUDING its stamp. The next `ensureBuilt`
  * then rebuilds from the source corpus and serves — and because every
  * build is deterministic, a truncate + rebuild round trip is
  * byte-identical (spec-pinned in StoreAdminSpec for all five store
  * families, and the `q_*_served` driver queries re-run green).
  *
  * Deleting the stamp WITH the data matters: a truncate that left a
  * fresh stamp behind would make the store look built while empty (the
  * failure mode [[graft.multimodal.MediaStore]] guards against by
  * writing the stamp last). `truncate` is idempotent — truncating an
  * absent store is a no-op, like deleteByQuery on an empty collection.
  */
object StoreAdmin {

  /** Every persisted store root for a source corpus dir. */
  def storeDirs(sfDir: String): Seq[String] = Seq(
    BM25Index.defaultDir(sfDir),
    BM25Index.defaultDir(sfDir) + "__incr",
    graft.dedup.SimHashStore.defaultDir(sfDir),
    graft.similarity.SrpStore.defaultDir(sfDir),
    graft.similarity.SrpStore.defaultDir(sfDir) + "__incr",
    graft.similarity.IvfStore.defaultDir(sfDir),
    graft.similarity.IvfStore.defaultDir(sfDir) + "__incr",
    graft.similarity.PqStore.defaultDir(sfDir),
    graft.similarity.PqStore.defaultDir(sfDir) + "__incr",
    ServingStores.defaultDir(sfDir))

  /** Empty one store (data + stamp). Idempotent; the parent root and
    * other corpora's stores are untouched.
    */
  def truncate(dest: String): Unit = deleteRecursively(Paths.get(dest))

  /** Empty every store for a corpus — the "drop all collections" admin
    * sweep before a from-scratch rebuild.
    */
  def truncateAll(sfDir: String): Unit = storeDirs(sfDir).foreach(truncate)

  /** True iff no store for this corpus holds any artifact. */
  def isEmpty(sfDir: String): Boolean =
    storeDirs(sfDir).forall(d => !Files.exists(Paths.get(d)))

  /** Reclaim rewrite leftovers: every atomic-swap rewrite
    * ([[graft.util.AtomicRewrite]], [[ServingStores]]' compaction/
    * rebucketing) materializes its new generation in a sibling
    * `<path>-rewrite-tmp` before touching the store, so a crash during
    * the write leaves the store fully valid plus an orphan tmp holding a
    * dead generation's bytes. This sweep deletes them — correctness
    * never depends on it (rewrites wipe their own tmp before writing),
    * it is the disk-reclaim half of crash recovery. Not safe to run
    * CONCURRENTLY with an in-flight rewrite (it would delete the tmp
    * being written; the rewrite's swap then fails loudly, store
    * untouched) — run it like [[truncate]], between jobs. Returns the
    * deleted roots so callers can log them.
    */
  def gcOrphans(sfDir: String): Seq[String] =
    storeDirs(sfDir).flatMap { root =>
      val p = Paths.get(root)
      if (!Files.isDirectory(p)) Nil
      else {
        val s = Files.walk(p)
        val orphans =
          try s.iterator().asScala
            .filter(q => Files.isDirectory(q) &&
              q.getFileName.toString.endsWith("-rewrite-tmp"))
            .toList
          finally s.close()
        orphans.foreach(deleteRecursively)
        orphans.map(_.toString)
      }
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try
        s.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
