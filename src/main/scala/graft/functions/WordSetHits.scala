package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count whitespace tokens of `text` that appear in a fixed word set —
  * the hot inner loop of stopword-based quality scoring and language ID.
  *
  * Equivalent to `size(filter(split(text, ' '), t -> t IN (...)))` but
  * without interpreting two lambdas per token (~300ns/element — NOTES.md
  * fact 1): one compiled loop per row, inside whole-stage codegen via a
  * static call. The word set arrives as a comma-joined literal; the
  * parsed HashSet is memoized per distinct literal (a query uses one), so
  * per-row work is tokenize + O(1) set probes.
  */
case class WordSetHits(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "word_set_hits expects (STRING, foldable STRING csv word list)")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "word_set_hits"

  override protected def nullSafeEval(text: Any, csv: Any): Any =
    WordSetHits.count(text.asInstanceOf[UTF8String], csv.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) =>
      s"graft.functions.WordSetHits.count($t, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object WordSetHits {
  private val setCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()

  private def wordSet(csv: String): java.util.HashSet[String] =
    setCache.computeIfAbsent(csv, c => {
      val s = new java.util.HashSet[String]()
      c.split(",", -1).foreach(w => s.add(w))
      s
    })

  /** Row-level token-in-set count; called from generated code. */
  def count(text: UTF8String, csv: UTF8String): Int = {
    val set = wordSet(csv.toString)
    // match split(text, ' '): single-space regex, trailing empties kept
    val ws = text.toString.split(" ", -1)
    var hits = 0
    var i = 0
    while (i < ws.length) {
      if (set.contains(ws(i))) hits += 1
      i += 1
    }
    hits
  }
}
