package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}

/** Native as-of join — the engine's whole-operator Catalyst extension
  * (SURVEY.md §2.11 ladder step (c): custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`): for each left row, the LAST right row of the same key
  * with `rightTime <= leftTime`, as ONE per-partition merge sweep.
  *
  * Why a custom operator instead of composition: the window formulation
  * ([[graft.operators.Relational.asofJoin]]) must UNION both sides into
  * one relation and sort the combined stream, paying (|L|+|R|) through
  * one exchange+sort and carrying null-padded payload columns for every
  * left row through the shuffle. The native exec co-partitions the two
  * sides independently (each exchange moves only its own columns), has
  * Spark sort each side by (key, time) — both exchanges and sorts stay
  * whole-stage-codegen'd standard operators — and then streams BOTH
  * sorted iterators through a zero-allocation merge that keeps ONE
  * (key, payload) pair of state. Same I/O shape as a sort-merge join,
  * no union blow-up, no window buffering.
  *
  * Scope (enforced): key LongType, times Timestamp/TimestampNTZ/Long
  * (micros — read via `getLong` either way). The payload may be ANY
  * type: values are copied out of the shuffle/sort-reused UnsafeRow
  * buffer via `InternalRow.copyValue` (UTF8String/Decimal/array
  * payloads would otherwise be corrupted when the iterator advances —
  * primitives copy for free). Null-key or null-time left rows emit a
  * null payload; null-key / null-time right rows are skipped (matching
  * the window formulation's SQL null semantics, where `rt <= lt` is
  * never true against NULL). Ties inside (key, time) on the right are
  * the caller's to pre-dedup — exactly the q_asof_join input contract.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTime: Attribute,
                        rightKey: Attribute, rightTime: Attribute,
                        payload: Attribute, payloadOut: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, p, out) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, p, out) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, leftTime: Attribute,
                        rightKey: Attribute, rightTime: Attribute,
                        payload: Attribute, payloadOut: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  // EnsureRequirements inserts (codegen'd) hash exchanges that
  // co-partition the sides on their keys and sorts each by (key, time) —
  // the merge below then runs partition-local with O(1) state.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rpIdx = right.output.indexWhere(_.exprId == payload.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0 && rpIdx >= 0,
      "asof attributes lost from child outputs")
    val pType = payloadOut.dataType
    val outAttrs = output
    val leftAttrs = left.output
    val payloadOutRef = payloadOut

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, leftAttrs :+ payloadOutRef)
      val joined = new JoinedRow
      val pRow = new GenericInternalRow(1)

      // one-row lookahead over the right side, fields copied OUT of the
      // (shuffle-reused) row object immediately
      var rValid = false
      var rKey = 0L
      var rTime = 0L
      var rPayload: Any = null
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          if (!r.isNullAt(rkIdx) && !r.isNullAt(rtIdx)) {
            rKey = r.getLong(rkIdx)
            rTime = r.getLong(rtIdx)
            // copyValue: UTF8String/Decimal/arrays point into the reused
            // sort buffer — copy NOW, before the iterator advances
            rPayload = if (r.isNullAt(rpIdx)) null
                       else InternalRow.copyValue(r.get(rpIdx, pType))
            rValid = true
          }
        }
      }
      advanceRight()

      // the as-of state: last right row consumed, keyed
      var lastValid = false
      var lastKey = 0L
      var lastPayload: Any = null

      lIter.map { lRow =>
        if (lRow.isNullAt(lkIdx) || lRow.isNullAt(ltIdx)) {
          pRow.update(0, null)
        } else {
          val lk = lRow.getLong(lkIdx)
          val lt = lRow.getLong(ltIdx)
          while (rValid && (rKey < lk || (rKey == lk && rTime <= lt))) {
            lastValid = true; lastKey = rKey; lastPayload = rPayload
            advanceRight()
          }
          pRow.update(0, if (lastValid && lastKey == lk) lastPayload else null)
        }
        proj(joined(lRow, pRow))
      }
    }
  }
}

/** DataFrame-facing entry + strategy installation. */
object AsofNative {

  private val SupportedTime = Set[org.apache.spark.sql.types.DataType](
    LongType, TimestampType, TimestampNTZType)

  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** leftCols-projected left as-of joined to right's `payload`; same
    * semantics and output shape as `Relational.asofJoin(forward=false)`.
    */
  def join(left: DataFrame, right: DataFrame, key: String, time: String,
           leftCols: Seq[String], payload: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    install(spark)
    val l = left.select((Seq(key, time) ++ leftCols).distinct.map(col): _*)
    // fresh exprIds on the right (self-joins share lineage); null keys
    // and null times out — a null ts must never read as epoch 0
    val r = right.filter(col(key).isNotNull && col(time).isNotNull)
      .select(col(key).as("__rk"), col(time).as("__rt"),
        col(payload).as("__rp"))
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"asof: column $name missing"))
    val lk = attr(lPlan, key); val lt = attr(lPlan, time)
    val rk = attr(rPlan, "__rk"); val rt = attr(rPlan, "__rt")
    val rp = attr(rPlan, "__rp")
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"asof: key must be LongType, got ${lk.dataType}")
    require(SupportedTime(lt.dataType) && SupportedTime(rt.dataType),
      s"asof: time must be long-backed, got ${lt.dataType}")
    val pOut = AttributeReference(payload, rp.dataType, nullable = true)()
    GraftPlanBridge.ofRows(spark,
      AsofJoinPlan(lPlan, rPlan, lk, lt, rk, rt, rp, pOut))
  }
}
