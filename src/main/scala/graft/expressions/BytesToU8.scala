package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Codegen'd binary → array<int> of UNSIGNED byte values — the bulk-decode
  * primitive for fixed-width media payloads (8-bit PCM samples, grayscale
  * pixel rows): one pass over the byte buffer, one output array, no
  * per-byte `substr`/`hex`/`conv` expression chain.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): extracting
  * N samples with `transform(sequence(1, n), j -> conv(hex(substr(bin, j,
  * 1)), 16, 10))` costs a substring allocation, a hex string, and a base
  * conversion per byte — ~2 ms per 100-byte blob, which at 100 TB of audio
  * is the whole job. This compiles to a primitive loop inside
  * WholeStageCodegen. Values are 0–255 (unsigned view), matching what the
  * portable `conv(hex(...))` chain and the DuckDB oracle produce.
  */
case class BytesToU8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bytes_u8 expects binary, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |int[] $arr = new int[$b.length];
         |for (int $i = 0; $i < $b.length; $i++) { $arr[$i] = $b[$i] & 0xff; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
