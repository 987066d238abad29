package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All four 32-bit SRP signature words of a float vector in ONE codegen'd
  * expression — the scale fix for the stacked formulation (128 separate
  * `graft_dot(vec, ±1-literal)` calls), which blows past whole-stage
  * codegen's field/method limits and falls back to interpreted eval: the
  * round-8 sf1 sweep measured ~20 s for a 50k-row signature scan that this
  * loop does in well under a second.
  *
  * Semantics are IDENTICAL to the stacked form, bit for bit: per plane j,
  * dot = sequential left-to-right double accumulation of
  * (double)vec[i] * (double)plane[j][i] (the [[FloatVecDot]] fold), bit j
  * set iff dot > 0. The ±1 plane matrix is the fixed deterministic
  * [[graft.similarity.Similarity.srpPlane]] family — the SAME constants the
  * DuckDB oracle interpolates, so signatures stay engine-exact.
  *
  * Null/shape contract matches `graft_dot`-under-`when`: a null vector is
  * null; a vector whose length differs from the plane dimension, or with
  * any null element, yields all-zero words (every per-plane dot would have
  * been null, and `when(null > 0, bit)` sets nothing).
  */
case class SrpSignatureWords(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_srp expects array<float>, got ${other.simpleString}")
    }

  override def nullable: Boolean = child.nullable

  @transient private lazy val nBits = planes.length
  @transient private lazy val dims = planes(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val words = new Array[Long](4)
    val n = vec.numElements()
    if (n == dims && !hasNullElement(vec, n)) {
      var j = 0
      while (j < nBits) {
        val p = planes(j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += vec.getFloat(i).toDouble * p(i).toDouble
          i += 1
        }
        if (acc > 0.0) words(j >> 5) |= 1L << (j & 31)
        j += 1
      }
    }
    new GenericArrayData(words)
  }

  private def hasNullElement(vec: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return true; i += 1 }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val words = ctx.freshName("words")
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $words = new long[4];
         |int $n = $v.numElements();
         |boolean $ok = ($n == $dims);
         |for (int $i = 0; $ok && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { $ok = false; }
         |}
         |if ($ok) {
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    float[] $p = $planesRef[$j];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $v.getFloat($i) * (double) $p[$i];
         |    }
         |    if ($acc > 0.0) { $words[$j >> 5] |= 1L << ($j & 31); }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
