package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd upper-triangle product array for the exact covariance matrix:
  * for a d-vector emit the d(d+1)/2 values `round12long(x_i · x_j)` (i ≤ j)
  * in flat row-major order `pos = i·d − i(i−1)/2 + (j − i)` — exactly the
  * element order of the nested-transform formulation it replaces:
  *
  *   flatten(transform(sequence(0, d-1), i ->
  *     transform(sequence(i, d-1), j ->
  *       graft_round12_long(CAST(x[i+1] AS DOUBLE) * CAST(x[j+1] AS DOUBLE)))))
  *
  * Why a custom Expression (the [[Round12Long]] / [[FloatVecDot]]
  * rationale): that formulation evaluates d(d+1)/2 interpreted lambda calls
  * per row plus per-level array allocations; this compiles to one primitive
  * double loop writing a long[] (wrapped in GenericArrayData), with the
  * identical widen-multiply-round12 per element — [[Round12Long]]'s proven
  * fast/exact-path branch inlined verbatim, so every emitted long is
  * bit-equal to the fold's (TriProducts12Spec pins the parity).
  *
  * Null semantics: null input array → null; a null ELEMENT → a LOUD
  * IllegalArgumentException naming the index. The nested-transform shape
  * this replaces produced a null CELL (leaving the row's other cells'
  * counts intact), so silently nulling the whole array here would have
  * shifted covariance counts if an embedding ever carried a null element
  * — an input the corpus contract forbids. Enforcing the invariant with
  * an error keeps the divergence impossible instead of latent (r16
  * advice item 2).
  */
case class TriProducts12(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_tri12 expects a float/double array, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) TriProducts12.nullElement(i)
      xs(i) = if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Long](n * (n + 1) / 2)
    var p = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(p) = TriProducts12.round12(xs(i) * xs(j))
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val get = if (isDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $xs = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { graft.expressions.TriProducts12.nullElement($i); }
         |  $xs[$i] = $get;
         |}
         |long[] $out = new long[$n * ($n + 1) / 2];
         |int $p = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  for (int $j = $i; $j < $n; $j++) {
         |    $out[$p++] = graft.expressions.TriProducts12.round12($xs[$i] * $xs[$j]);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TriProducts12 {

  /** Loud no-null-element invariant (see the class scaladoc). */
  def nullElement(i: Int): Nothing = throw new IllegalArgumentException(
    s"graft_tri12: null element at index $i — covariance input vectors " +
      "must be dense (the corpus contract); a null element would have " +
      "produced divergent per-cell counts in the replaced formulation")

  /** [[Round12Long]]'s eval, verbatim (fast `rint` path + exact BigDecimal
    * fallback under the identical guard) — shared so the loop and the
    * scalar expression can never drift.
    */
  def round12(v: Double): Long = {
    val f = v * 1.0e12
    val fl = Math.floor(f)
    if (!(Math.abs(f) < 2.0e12) || Math.abs(f - fl - 0.5) < 1.0e-3)
      java.math.BigDecimal.valueOf(v)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    else Math.rint(f).toLong
  }
}
