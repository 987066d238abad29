package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd squared L2 distance over two float- or double-array columns,
  * accumulating in double — the hot inner loop of PQ codebook training and
  * encoding (per-(vector, subspace) argmin over ksub codewords).
  *
  * Same rationale as [[FloatVecDot]] (SURVEY.md §7.3 preference order b):
  * the portable
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)`
  * fold allocates an intermediate array per evaluation and runs the lambda
  * interpreted — and in the PQ encode path it is evaluated ksub times per
  * (vector, subspace) row inside a `transform` lambda, which is exactly the
  * 45 µs/eval interpreted-HOF regime the round-10 sweep measured. This
  * compiles to a primitive loop over the two `ArrayData` buffers.
  *
  * Semantics are IDENTICAL to the fold: sequential left-to-right double
  * accumulation of (x − y)·(x − y) — each step is the same two IEEE ops in
  * the same order, so results stay bit-equal to the portable fold and the
  * DuckDB oracle (FloatVecL2sqSpec pins the parity). Null semantics match
  * the fold exactly: null if either array is null, if lengths differ
  * (zip_with null-pads, poisoning the fold), or if any element is null.
  */
case class FloatVecL2sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => isVec(e.dataType))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects float/double arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xd = isDouble(left); val yd = isDouble(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(v: String, dbl: Boolean) =
        if (dbl) s"$v.getDouble($i)" else s"(double) $v.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${get(a, isDouble(left))} - ${get(b, isDouble(right))};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
