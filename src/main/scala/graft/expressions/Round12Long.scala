package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd `round(v, 12)` that emits the UNSCALED long (v rounded
  * half-up at 12 decimal places, ×10¹²) — the hot-loop primitive behind
  * the exact-decimal aggregation family: summing these longs (as
  * decimal(38,0), overflow-free at any corpus size) then dividing the
  * double of the sum by 10¹² reproduces the decimal-routed sum contract
  * at a fraction of the cost.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): Spark's
  * `Round` on a double goes through `BigDecimal.valueOf` — a
  * `Double.toString` + parse per value. Measured on the covariance
  * workload (sf0.1, 4.16M products): the Round alone adds 2.1 s to a
  * 0.9 s explode+aggregate, and the decimal(38,12) cast+sum another
  * 1.7 s. This expression compiles to a multiply + `Math.rint` inside
  * WholeStageCodegen, falling back to the exact BigDecimal path only
  * when the fast path cannot be proven equal:
  *
  *  - SEMANTICS: the result equals
  *    `BigDecimal.valueOf(v).setScale(12, HALF_UP).unscaledValue()`
  *    (Spark's own round-on-double semantics — the SHORTEST-repr
  *    decimal of v, rounded half-up) for every finite v. Proof of the
  *    fast path: let f = v·10¹² (double multiply, correctly rounded)
  *    and D the shortest-repr decimal of v. |f − D·10¹²| ≤
  *    |f|·3·2⁻⁵³ + ulp(f)/2 < 10⁻³ whenever |f| < 2·10¹². So when
  *    frac(f) is farther than 10⁻³ from 0.5, every nearest-integer
  *    rule maps f and D·10¹² to the same integer and `rint` is exact;
  *    otherwise (≈0.2% of uniform inputs) take the BigDecimal path.
  *    |f| ≥ 2·10¹² (|v| ≥ 2) also takes the exact path.
  *  - DOMAIN: |v| < ~9.2·10⁶ (the unscaled value must fit a long) —
  *    beyond that, and for NaN/±Inf, the exact path throws
  *    ArithmeticException/NumberFormatException rather than silently
  *    wrapping (covariance products of unit-scale embeddings are far
  *    inside the domain).
  */
case class Round12Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_round12_long expects double, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    val f = v * 1.0e12
    val fl = Math.floor(f)
    if (!(Math.abs(f) < 2.0e12) || Math.abs(f - fl - 0.5) < 1.0e-3)
      java.math.BigDecimal.valueOf(v)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    else Math.rint(f).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val f = ctx.freshName("f")
      val fl = ctx.freshName("fl")
      // !(|f| < 2e12) routes NaN/Inf to the exact path too (comparisons
      // with NaN are false), which throws instead of emitting garbage
      s"""
         |double $f = $v * 1.0E12d;
         |double $fl = Math.floor($f);
         |if (!(Math.abs($f) < 2.0E12d) || Math.abs($f - $fl - 0.5d) < 1.0E-3d) {
         |  ${ev.value} = java.math.BigDecimal.valueOf($v)
         |    .setScale(12, java.math.RoundingMode.HALF_UP)
         |    .unscaledValue().longValueExact();
         |} else {
         |  ${ev.value} = (long) Math.rint($f);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
