package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Codegen'd array<int> → binary of unsigned byte values — the PACKING
  * inverse of [[BytesToU8]], built for the PQ store's code layout
  * ([[graft.similarity.PqStore]]): a vector's m sub-quantizer ordinals
  * become one m-byte value, so the ADC scan reads m bytes per vector
  * instead of m (vid, s, cid) rows — the scan-byte contract PQ exists
  * for (Jégou et al. 2011 store exactly this byte-per-subquantizer
  * layout). Values are truncated to their low 8 bits (callers enforce
  * ksub ≤ 256, so ordinals always fit); round-trips bit-exactly through
  * [[BytesToU8]].
  */
case class U8sToBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_u8_bytes expects array<int>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Byte](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = (arr.getInt(i) & 0xff).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) ($a.getInt($i) & 0xff);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
