package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Probe a Bloom filter held as an `ARRAY<BIGINT>` bit vector: true iff
  * all `k` Kirsch-Mitzenmacher probe positions `(h1 + i*h2) mod m`
  * (m = 64 * array length) are set. The hot path of Bloom-based join
  * pruning — one compiled loop of k word-index/bit-test probes per row,
  * inside whole-stage codegen; no false negatives by construction.
  *
  * `bits` is expected to be the same (broadcast) array for every row of a
  * probe; the expression itself is stateless and per-row.
  */
case class BloomMightContain(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == ArrayType(LongType, containsNull = false) ||
        first.dataType == ArrayType(LongType, containsNull = true)) {
      if (second.dataType == LongType && third.dataType == LongType &&
          fourth.dataType == IntegerType && fourth.foldable)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects (ARRAY<BIGINT>, BIGINT, BIGINT, foldable INT)")
    } else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain expects an ARRAY<BIGINT> bit vector")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bits: Any, h1: Any, h2: Any, k: Any): Any =
    BloomMightContain.contains(bits.asInstanceOf[ArrayData],
      h1.asInstanceOf[Long], h2.asInstanceOf[Long], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h1, h2, k) =>
      s"graft.functions.BloomMightContain.contains($b, $h1, $h2, $k)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object BloomMightContain {
  /** Row-level k-probe bit test; called from generated code. */
  def contains(bits: ArrayData, h1: Long, h2: Long, k: Int): Boolean = {
    val words = bits.numElements()
    val m = words * 64L
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      if (((bits.getLong((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }
}
