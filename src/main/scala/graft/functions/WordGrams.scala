package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional word-k-grams of a text column as RAW STRINGS, one per gram
  * start position — the collision-free sibling of [[WordGramHashes]]
  * (same single compiled pass, same byte-slice trick: a space-joined
  * gram of a single-space-tokenized text IS a byte range of the input,
  * so each gram is a zero-copy UTF8String slice). Equivalent to
  * {{{
  * transform(sequence(0, size(ws) - k), i -> array_join(slice(ws, i + 1, k), ' '))
  * }}}
  * and to DuckDB's `list_transform(range(0, len(ws)-k+1),
  * i -> array_to_string(ws[i+1:i+k], ' '))`. Fewer than k tokens →
  * empty array. Exact string keys shuffle ~k·tokenBytes per gram where
  * the hash form ships 8 bytes — the price of zero collisions
  * ([[graft.ops.Dedup.dedupSpansExact]] pays it; dedupSpans doesn't).
  */
case class WordGrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_grams expects (STRING, k>=1), got ${child.dataType.simpleString}, k=$k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_grams"

  override protected def nullSafeEval(input: Any): Any =
    WordGrams.grams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGrams.grams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {
  /** Called from generated code. */
  def grams(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val n = spaces + 1
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = len + 1
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val off = starts(i)
      val glen = starts(i + k) - 1 - off
      out(i) = UTF8String.fromBytes(bytes, off, glen)
      i += 1
    }
    new GenericArrayData(out)
  }
}
