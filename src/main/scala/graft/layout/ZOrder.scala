package graft.layout

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multi-dimensional data clustering via Z-order (Morton) interleaving — the
  * layout technique that makes parquet min/max file skipping work for
  * predicates on MORE THAN ONE column.
  *
  * [[graft.sources.Sinks.rangeClustered]] covers the single-dimension case:
  * sort by one key and range predicates on that key prune files. But a table
  * range-clustered on `date` gives ZERO skipping for a `customer` predicate
  * and vice versa. Interleaving the bits of both keys (Morton code) and
  * range-clustering on the interleaved value bounds BOTH dimensions per
  * file: each of the 2ᵏ Z-curve tiles a file covers is a small rectangle, so
  * a 2-D box predicate touches only the files whose tiles intersect it —
  * O(perimeter) of the box instead of O(all files).
  *
  * Everything here is closed-form integer bit arithmetic (shift/and/or), so
  * it whole-stage-codegens and is reproducible bit-for-bit in the DuckDB
  * oracle with the same operators. At 100 TB the write is one
  * `repartitionByRange(zorder(...))` shuffle — identical cost to the 1-D
  * clustered write the table already pays.
  */
object ZOrder {

  /** Bit-spread pairs for the classic 16→32-bit interleave ladder. */
  private val spreadSteps = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` so original bit i lands at bit 2i
    * (magic-number interleave ladder; public-domain bit-twiddling idiom).
    */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) {
      case (x, (shift, mask)) => (x.bitwiseOR(shiftleft(x, shift))).bitwiseAND(lit(mask))
    }

  /** 32-bit Morton code of two 16-bit non-negative dimensions: x in even
    * bits, y in odd bits. Inputs outside [0, 65535] are masked, so callers
    * should pre-bucket wide domains.
    */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread ladder as a SQL expression string over `in` — emitted
    * for oracle SQL generation so the DuckDB side computes the identical
    * interleave with its own `&`/`|`/`<<` operators.
    */
  def spread16Sql(in: String): String =
    spreadSteps.foldLeft(s"($in & 65535)") { case (x, (shift, mask)) =>
      s"(($x | ($x << $shift)) & $mask)"
    }

  /** Morton code as SQL text (see [[spread16Sql]]). */
  def morton2Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** File-skipping audit comparing layouts for a 2-D box predicate
    * `xLo <= x <= xHi AND yLo <= y <= yHi`: assigns each row to one of
    * `nFiles` equal-width bins of its layout's clustering value (`zorder`
    * = Morton of (x, y); `linear_x` / `linear_y` = the 1-D clusterings),
    * computes each bin's min/max footprint of both dims — exactly the
    * parquet footer stats a scan consults — and reports how many files and
    * rows a stats-pruned scan would read per layout.
    *
    * Bin = `(v - min) * nFiles div (max - min + 1)` rather than `ntile` so
    * no global-sort window appears in the plan (equal-width on the
    * clustering value ≈ `repartitionByRange` with uniform splits). The
    * extremes travel as a 1-row broadcast.
    *
    * Output: one row per layout — `layout, total_files, files_touched,
    * rows_scanned, rows_matching` (rows_matching is layout-invariant; it is
    * repeated per row as the audit's baseline column).
    */
  def skippingAudit(df: DataFrame, xCol: String, yCol: String, nFiles: Int,
                    xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("z", morton2(col("x"), col("y")))
    val ext = broadcast(base.agg(
      min("x").as("x_min"), max("x").as("x_max"),
      min("y").as("y_min"), max("y").as("y_max"),
      min("z").as("z_min"), max("z").as("z_max")))
    val withExt = base.crossJoin(ext)
    def bin(v: String, lo: String, hi: String): Column =
      expr(s"($v - $lo) * $nFiles DIV ($hi - $lo + 1)")
    val stacked = withExt.select(lit("zorder").as("layout"),
        bin("z", "z_min", "z_max").as("file"), col("x"), col("y"))
      .unionAll(withExt.select(lit("linear_x").as("layout"),
        bin("x", "x_min", "x_max").as("file"), col("x"), col("y")))
      .unionAll(withExt.select(lit("linear_y").as("layout"),
        bin("y", "y_min", "y_max").as("file"), col("x"), col("y")))
    val inBox = col("x").between(xLo, xHi) && col("y").between(yLo, yHi)
    val files = stacked
      .groupBy(col("layout"), col("file"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(inBox, 1L).otherwise(0L)).as("n_match"),
        min("x").as("fx0"), max("x").as("fx1"),
        min("y").as("fy0"), max("y").as("fy1"))
    // A stats-pruned scan reads a file iff its [min,max] footprint overlaps
    // the box on BOTH dims — the parquet row-group pruning rule.
    val touched = col("fx0") <= xHi && col("fx1") >= xLo &&
      col("fy0") <= yHi && col("fy1") >= yLo
    files.groupBy(col("layout"))
      .agg(count(lit(1)).cast("long").as("total_files"),
        sum(when(touched, 1L).otherwise(0L)).as("files_touched"),
        sum(when(touched, col("n_rows")).otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_matching"))
  }
}
