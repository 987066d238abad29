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
      if (Files.isDirectory(dir)) {
        val s = Files.list(dir)
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path]).toSeq
        finally s.close()
      } else Seq(dir)
    files.filter(Files.exists(_)).sortBy(_.getFileName.toString)
      .map(p => s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
      .mkString("\n")
  }

  /** True iff the artifact at `dest` is fresh w.r.t. `stamp` (stored stamp
    * exists and matches).
    */
  def isFresh(dest: String, stamp: String): Boolean = {
    val f = Paths.get(dest, "source_stamp.txt")
    Files.exists(f) && Files.readString(f) == stamp
  }

  def write(dest: String, stamp: String): Unit = {
    val f = Paths.get(dest, "source_stamp.txt")
    Files.createDirectories(f.getParent)
    Files.writeString(f, stamp)
  }
}
