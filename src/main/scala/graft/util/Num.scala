package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Numeric helpers that keep aggregate results bit-identical to the DuckDB
  * oracle regardless of partitioning / summation order.
  *
  * Rationale: a double sum is order-dependent, and Spark's partial aggregation
  * order varies run to run; DECIMAL sums are exact and associative, so both
  * engines produce the same value no matter the plan. The per-row
  * double→decimal rounding is itself deterministic (same IEEE input on both
  * sides). Cast back to double at the end so output schemas stay simple.
  */
object Num {
  /** Per-row exact fixed-point view of a money/quantity double. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent sum of a double column, returned as double. */
  def sumd(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum divided by count (one IEEE
    * division — identical on both engines).
    */
  def avgd(c: Column): Column = sumd(c) / count(lit(1))

  /** Long-typed counts (DuckDB `count` is BIGINT; Spark's is too, but be
    * explicit for anything that could widen to int).
    */
  def cnt: Column = count(lit(1)).cast(LongType)

  /** Round a computed double to 6 decimals — absorbs sub-ulp libm
    * differences (e.g. `ln`) between JVM and C implementations.
    */
  def r6(c: Column): Column = round(c, 6)
}
