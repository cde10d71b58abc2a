package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** 1-bit quantization of a float embedding: bit d is set iff element d is
  * positive (first 60 dims — stays clear of the sign bit so the value is
  * identical to the oracle's `1::BIGINT << d` arithmetic). Binary-quantized
  * vectors turn cosine-ish search into xor+popcount over one BIGINT —
  * 64 bytes → 8 bytes per vector, and Hamming distance is one CPU
  * instruction pair per comparison.
  */
case class VecSignBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sign_bits expects ARRAY<FLOAT>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "vec_sign_bits"

  override protected def nullSafeEval(input: Any): Any =
    VecSignBits.signBits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecSignBits.signBits($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecSignBits {
  /** Called from generated code. */
  def signBits(arr: ArrayData): Long = {
    val n = math.min(arr.numElements(), 60)
    var bits = 0L
    var i = 0
    while (i < n) {
      if (arr.getFloat(i) > 0f) bits |= (1L << i)
      i += 1
    }
    bits
  }
}
