package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken '03) as ONE
  * compiled pass per document: hash every k-char gram (md5 60-bit prefix,
  * the engine's portable hash), slide a w-hash window, keep each window's
  * minimum, return the DISTINCT selected fingerprints.
  *
  * Bit-identical to the relational formulation
  * `explode(positions) → md5_long(substr(text,pos,k),15) → min over
  * (ROWS CURRENT..w-1 FOLLOWING) per doc → distinct` — asserted
  * element-for-element in OpsSpec — but without materializing a row per
  * character: the explode → per-doc window sort → distinct pipeline
  * (three wide operators over ~|text| rows per doc) collapses into a
  * per-row loop that never leaves whole-stage codegen. Documents shorter
  * than k + w − 1 chars (no full window) return an empty array.
  *
  * Selection ties: the minimum VALUE per window is unique even when the
  * position achieving it is not, and only the fingerprint set is emitted —
  * so no tie rule is needed (same argument as [[graft.ops.Dedup.winnowSelections]]).
  * Output order is first-selection order; consumers aggregate or explode,
  * so order never reaches a compare.
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects (STRING, k>=1, w>=1), got ${child.dataType.simpleString}, k=$k, w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.fps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  /** Called from generated code. `substringSQL` is the exact char
    * semantics of SQL `substr`, so each gram's md5 input is byte-identical
    * to the relational form's.
    */
  def fps(text: UTF8String, k: Int, w: Int): ArrayData = {
    val n = text.numChars()
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nPos = n - (k - 1)
    val fp = new Array[Long](nPos)
    var i = 0
    while (i < nPos) {
      fp(i) = Md5Long.hashLong(text.substringSQL(i + 1, k), 15)
      i += 1
    }
    // w is small (default 4): direct per-window min beats a deque
    val seen = new java.util.LinkedHashSet[java.lang.Long](nPos)
    var s = 0
    val lastStart = nPos - w
    while (s <= lastStart) {
      var m = fp(s)
      var j = 1
      while (j < w) {
        val v = fp(s + j)
        if (v < m) m = v
        j += 1
      }
      seen.add(m)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(out)
  }
}
