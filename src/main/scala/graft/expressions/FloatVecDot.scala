package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two float- or double-array columns,
  * accumulating in double — the hot inner loop of cosine similarity
  * search.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * `aggregate(zip_with(...))` higher-order-function formulation allocates an
  * intermediate product array per row and evaluates the lambda through
  * interpreted codegen; this compiles to a primitive loop over the two
  * `ArrayData` buffers with zero allocation, inside WholeStageCodegen.
  * Semantics are IDENTICAL (sequential left-to-right double accumulation),
  * so results stay bit-equal to the portable fold and the DuckDB oracle.
  *
  * Null semantics MATCH the fold exactly (required for the
  * [[graft.plans.RewriteDotProduct]] rewrite to be semantics-preserving):
  * null if either array is null, if the lengths differ (zip_with null-pads
  * the shorter side, poisoning the fold), or if any element is null.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Each side may independently be array<float> or array<double> (the
  // double form appears when one operand is a derived centroid/mean):
  // elements are widened to double before the multiply either way, so the
  // accumulation order and IEEE semantics are identical across the four
  // type combinations — and identical to the portable fold.
  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => isVec(e.dataType))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects float/double arrays, got " +
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
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
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
         |    $acc += ${get(a, isDouble(left))} * ${get(b, isDouble(right))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's custom expressions. Idempotent —
  * call before using `expr("graft_dot(a, b)")`.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => FloatVecDot(exprs.head, exprs(1)), "scala_udf")
    // squared L2 sibling — the PQ train/encode inner loop; see FloatVecL2sq
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => FloatVecL2sq(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp", exprs =>
        SrpSignatureWords(exprs.head, graft.similarity.Similarity.srpPlanes),
      "scala_udf")
    // Spark ships BloomFilterMightContain for its own runtime join filters
    // but never registers it as a SQL function; exposing it keeps bloom
    // probes inside codegen (vs a deserialize-per-executor UDF). The bloom
    // side must be a foldable binary (we pass a lit() of the
    // bloom_filter_agg result); the value side must be xxhash64-hashed,
    // matching what bloom_filter_agg inserted.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1)),
      "scala_udf")
    // Bulk unsigned-byte decode for fixed-width media payloads (PCM
    // samples, pixel rows) — see BytesToU8.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bytes_u8", exprs => BytesToU8(exprs.head), "scala_udf")
    // Packing inverse for the PQ store's byte-per-subquantizer codes —
    // see U8sToBytes.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_u8_bytes", exprs => U8sToBytes(exprs.head), "scala_udf")
    // round(v, 12) emitting the unscaled long — the fast path of the
    // exact-decimal sum contract; see Round12Long.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_round12_long", exprs => Round12Long(exprs.head), "scala_udf")
    // upper-triangle round12 product array — the covariance hot loop;
    // see TriProducts12.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tri12", exprs => TriProducts12(exprs.head), "scala_udf")
    // SQ8 symmetric dequantization — the sq8 audit family's hot loop;
    // see Sq8DequantArr.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sq8dq", exprs => Sq8DequantArr(exprs.head), "scala_udf")
    // fused assign argmax/argmin over a broadcast codeword array — the
    // IVF/k-means/PQ assign hot loops; see VecArgBest.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cos_best", exprs => CosArgmax(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_argmin", exprs => PqArgmin(exprs.head, exprs(1)), "scala_udf")
    // Sibling aggregate: builds the filter BloomFilterMightContain probes.
    // Registered in Spark's INTERNAL registry only (runtime-filter
    // machinery), so expose it under an engine name.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs =>
        org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1), exprs(2), 0, 0),
      "scala_udf")
  }
}
