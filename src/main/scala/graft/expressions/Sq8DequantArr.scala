package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd SQ8 symmetric dequantization of a vector: widen to double,
  * scale = max|x| / 127, each element round(x/scale)·scale with Spark's
  * round-half-up-on-double semantics, and the all-zero vector (scale 0)
  * dequantizing to itself — exactly the Column formulation in
  * `Similarity.sq8Dequant` / the q_ann_sq8 oracle:
  *
  *   scale = array_max(transform(v, abs)) / 127
  *   dq    = when(scale = 0, v).otherwise(transform(v, x -> round(x/scale)·scale))
  *
  * Why a custom Expression (the [[Round12Long]] rationale): Spark's `round`
  * on a double routes through `BigDecimal.valueOf` — a Double.toString +
  * parse PER ELEMENT, i.e. d of them per row per scan of the SQ8 audit
  * family. This compiles to one primitive loop with [[Round12Long]]'s
  * guarded fast path: `Math.rint` when the value is provably away from a
  * half (and small enough that the shortest-repr decimal cannot cross the
  * boundary — SQ8 quotients live in [−127, 127]), the exact BigDecimal
  * HALF_UP path otherwise. Sq8DequantArrSpec pins bit parity with the
  * Column formulation.
  *
  * Null semantics: null array → null; a null ELEMENT → null result (the
  * FloatVecDot any-null contract; embedding vectors carry no null
  * elements). Empty array → empty array (as the transform yields).
  */
case class Sq8DequantArr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sq8dq expects a float/double array, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val xs = new Array[Double](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble
      xs(i) = x
      val ax = Math.abs(x)
      // NaN must POISON the max (array_max treats NaN as largest), not be
      // skipped by the > comparison — else a NaN element would leave the
      // other elements quantized against a finite scale where the Column
      // formulation NaNs the whole vector (r16 advice item 1)
      if (ax > m || java.lang.Double.isNaN(x)) m = ax
      i += 1
    }
    val scale = m / 127.0
    if (scale == 0.0) return new GenericArrayData(xs)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = Sq8DequantArr.roundHalfUp(xs(i) / scale) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      val m = ctx.freshName("m")
      val ax = ctx.freshName("ax")
      val i = ctx.freshName("i")
      val sc = ctx.freshName("sc")
      val out = ctx.freshName("out")
      val get = if (isDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $xs = new double[$n];
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $xs[$i] = $get;
         |  double $ax = Math.abs($xs[$i]);
         |  if ($ax > $m || Double.isNaN($xs[$i])) { $m = $ax; }
         |}
         |if (!${ev.isNull}) {
         |  double $sc = $m / 127.0d;
         |  double[] $out = $xs;
         |  if ($sc != 0.0d) {
         |    $out = new double[$n];
         |    for (int $i = 0; $i < $n; $i++) {
         |      $out[$i] = graft.expressions.Sq8DequantArr.roundHalfUp($xs[$i] / $sc) * $sc;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8DequantArr {
  /** Spark's `round(y, 0)`-on-double semantics
    * (`BigDecimal.valueOf(y).setScale(0, HALF_UP).doubleValue()`) with
    * [[Round12Long]]'s guarded `rint` fast path — same guard constants,
    * same proof: for |y| < 2·10¹² the shortest-repr decimal of y sits
    * within ~10⁻³ of y·1, so when frac(y) is farther than 10⁻³ from 0.5
    * every nearest-integer rule agrees; otherwise (and for |y| ≥ 2·10¹²,
    * NaN, ±Inf) take the exact path.
    */
  def roundHalfUp(y: Double): Double = {
    // Spark's Round propagates NaN/±Inf unchanged; BigDecimal.valueOf
    // would THROW on them, which turned a non-finite element into a task
    // crash instead of the Column formulation's NaN result (r16 advice
    // item 1). Unlike [[Round12Long]] — whose inputs are provably finite
    // and which documents throw-on-non-finite — dequantization quotients
    // inherit whatever the stored vector carries.
    if (java.lang.Double.isNaN(y) || java.lang.Double.isInfinite(y)) return y
    val fl = Math.floor(y)
    if (!(Math.abs(y) < 2.0e12) || Math.abs(y - fl - 0.5) < 1.0e-3)
      java.math.BigDecimal.valueOf(y)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    else Math.rint(y)
  }
}
