package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column as a native expression.
  *
  * Equivalent to
  * `array_distinct(transform(sequence(1, n-k+1), i -> concat_ws(' ', w_i..w_{i+k-1})))`
  * over `split(text, ' ')`, but ~30× faster: the higher-order-function form
  * interprets three lambdas per shingle, while this runs one compiled loop
  * per row (codegen emits a static call — stays inside whole-stage codegen).
  * Distinct keeps first-occurrence order, matching `array_distinct` and
  * DuckDB's `list_distinct`. Fewer than k tokens → empty array.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (STRING, k>=1), got ${child.dataType.simpleString}, k=$k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Row-level shingle computation; called from generated code. */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    // match Spark's split(text, ' '): regex single space, trailing empties kept
    val ws = text.toString.split(" ", -1)
    if (ws.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](ws.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= ws.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }
}
