package graft.layout

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("morton2 matches the per-bit reference interleave") {
    val cases = Seq((0L, 0L), (3L, 0L), (0L, 3L), (5L, 10L), (12345L, 54321L),
      (65535L, 65535L), (70000L, 1L)) // >16-bit input is masked
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x & 0xFFFF, y & 0xFFFF),
        s"morton2($x, $y)")
    }
    assert(got((65535L, 65535L)) == 0xFFFFFFFFL)
  }

  test("skippingAudit: z-order prunes a tile-aligned 2-D box to one file") {
    // 64×64 uniform grid, 64 files. Each z-order file is then one aligned
    // 8×8 Morton tile, so the tile-aligned box [8,15]² sits in exactly one
    // file; each linear layout needs 8 of its 64 stripes.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = ZOrder.skippingAudit(grid, "x", "y", nFiles = 64,
        xLo = 8, xHi = 15, yLo = 8, yHi = 15)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("zorder") == ((64L, 1L, 64L, 64L)))
    assert(out("linear_x") == ((64L, 8L, 512L, 64L)))
    assert(out("linear_y") == ((64L, 8L, 512L, 64L)))
  }
}
