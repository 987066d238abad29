package graft.util

import java.nio.file.{Files, Paths}

/** Filesystem staleness stamps for build-once artifact stores (BM25 index,
  * SimHash signature store): (name, size, mtime) of every file of a source
  * table — metadata only, no data scan. A regenerated corpus at the same
  * path changes the stamp and forces a rebuild.
  */
object Stamp {

  def sourceStamp(sfDir: String, table: String = "documents.parquet"): String = {
    val dir = Paths.get(sfDir, table)
    val files =
      if (StoreFs.isDirectory(dir)) StoreFs.list(dir) else Seq(dir)
    files.filter(StoreFs.exists(_)).sortBy(_.getFileName.toString)
      .map(p => s"${p.getFileName}:${StoreFs.size(p)}:${StoreFs.mtimeMillis(p)}")
      .mkString("\n")
  }

  /** True iff the artifact at `dest` is fresh w.r.t. `stamp` (stored stamp
    * exists and matches).
    */
  def isFresh(dest: String, stamp: String): Boolean = {
    val f = Paths.get(dest, "source_stamp.txt")
    StoreFs.exists(f) && StoreFs.readString(f) == stamp
  }

  def write(dest: String, stamp: String): Unit = {
    val f = Paths.get(dest, "source_stamp.txt")
    StoreFs.createDirectories(f.getParent)
    StoreFs.writeString(f, stamp)
  }
}
