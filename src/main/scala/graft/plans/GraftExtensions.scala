package graft.plans

import graft.expressions.FloatVecDot
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Optimizer rule: rewrite the portable higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  *             (acc, x) -> acc + x)
  *
  * over float arrays into the codegen'd [[FloatVecDot]] primitive. The two
  * are bit-identical by construction (sequential double accumulation — see
  * FloatVecDotSpec), so the rewrite is purely a physical win: no per-row
  * intermediate array, no interpreted lambda evaluation.
  *
  * The match is deliberately narrow — any deviation (different zero,
  * non-multiply zip, extra finish logic, non-float arrays) is left alone.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (x, y) -> cast(x as double) * cast(y as double) over the lambda args. */
  private def isCastMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(Cast(l: NamedLambdaVariable, DoubleType, _, _),
                                 Cast(r: NamedLambdaVariable, DoubleType, _, _), _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      l.exprId == a.exprId && r.exprId == b.exprId
    case _ => false
  }

  /** (acc, x) -> acc + x */
  private def isAddFold(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      l.exprId == a.exprId && r.exprId == b.exprId
    case _ => false
  }

  /** x -> x (the identity finish `functions.aggregate` appends). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(0.0d, DoubleType), merge, finish)
        if isFloatArray(zw.left) && isFloatArray(zw.right) &&
          isCastMultiply(zw.function) && isAddFold(merge) && isIdentity(finish) =>
      FloatVecDot(zw.left, zw.right)
  }
}

/** Session-extension entry point: `spark.sql.extensions=graft.plans.GraftExtensions`
  * or `builder.withExtensions(new GraftExtensions)`. Injects the optimizer
  * rule and registers `graft_dot` for SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
  }
}

/** Runtime installation on an existing session (extensions can only be set
  * at builder time; `experimental.extraOptimizations` is the live hook).
  */
object GraftOptimizations {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
}
