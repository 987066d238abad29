package graft.expressions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class SrpSignatureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    // deterministic mixed-sign 64-dim vectors plus edge shapes
    val mk = (seed: Int) => Array.tabulate(64)(i => math.sin(seed * 97 + i).toFloat)
    Seq(
      (1L, mk(1)), (2L, mk(2)), (3L, mk(3)),
      (4L, Array.fill(64)(0.0f)),               // all-zero: every dot = 0, no bit set
      (5L, Array.tabulate(3)(_.toFloat))        // wrong dimension: all words 0
    ).toDF("vec_id", "embedding")
  }

  test("graft_srp equals the per-plane sequential-fold reference, bit for bit") {
    GraftFunctions.register(spark)
    val got = Similarity.srpSignature(vecs, "embedding")
      .select(col("vec_id"), col("__w0"), col("__w1"), col("__w2"), col("__w3"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    // reference: the portable aggregate(zip_with) fold per plane — the
    // formulation the DuckDB oracle mirrors
    val refCols = (0 until 4).map { w =>
      (0 until 32).map { b =>
        val plane = Similarity.srpPlane(w * 32 + b)
        val planeCol = typedlit(plane)
        when(Similarity.dotd(col("embedding"), planeCol) > 0.0, lit(1L << b))
          .otherwise(lit(0L))
      }.reduce(_ bitwiseOR _).as(s"rw$w")
    }
    val ref = vecs.select((col("vec_id") +: refCols): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(got == ref)
    // edge shapes: zero vector and wrong-dimension vector both all-zero
    assert(got(4L) == Seq(0L, 0L, 0L, 0L))
    assert(got(5L) == Seq(0L, 0L, 0L, 0L))
  }
}
