package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a pinned BPE merge list to a text column in ONE compiled pass —
  * the tokenizer-apply hot loop (at corpus scale this touches every
  * character of every document).
  *
  * Byte-identical to the double-gap literal-replace chain in
  * [[graft.ops.Bpe.encode]] (which remains the DuckDB-oracle spelling):
  * each merge is one left-to-right non-overlapping pass over the word's
  * symbol list — exactly the semantics of a global literal `replace` of
  * `" l  r "` with `" lr "` on the double-gap wire string, where matches
  * can never span word boundaries and the merged token never re-matches
  * within its own pass (the replace search resumes after the
  * replacement). The replace chain allocates O(merges) full-corpus
  * intermediate strings per row; this does symbol-array splices with
  * zero intermediate row strings.
  *
  * Output format (same as the chain after its cleanup replaces): symbols
  * joined by single spaces within a word, words joined by U+001F, empty
  * for whitespace-only input. Word splitting mirrors `split(text, ' ')`
  * + drop empties; character split mirrors `split(w, '')` (JVM code-unit
  * split). Merge spec wire format: comma-joined "l r" pairs, parsed once
  * per distinct literal (memoized), applied in order.
  */
case class BpeApply(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bpe_apply expects (STRING, foldable STRING 'l r,l r,...' merge list)")

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(text: Any, spec: Any): Any =
    BpeApply.encode(text.asInstanceOf[UTF8String], spec.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.BpeApply.encode($t, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BpeApply {
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[String]]]()

  private def mergesFor(spec: String): Array[Array[String]] =
    mergeCache.computeIfAbsent(spec, s =>
      s.split(",", -1).filter(_.nonEmpty).map { pair =>
        val sp = pair.indexOf(' ')
        require(sp > 0 && pair.indexOf(' ', sp + 1) < 0,
          s"bpe_apply merge entry must be 'l r': '$pair'")
        Array(pair.substring(0, sp), pair.substring(sp + 1))
      })

  /** Row-level merge application; called from generated code. */
  def encode(text: UTF8String, spec: UTF8String): UTF8String = {
    val merges = mergesFor(spec.toString)
    val words = text.toString.split(" ", -1)
    val sb = new java.lang.StringBuilder(text.numBytes + 16)
    var firstWord = true
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (!w.isEmpty) {
        var syms = new java.util.ArrayList[String](w.length + 1)
        var i = 0
        while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
        syms.add("</w>")
        var mi = 0
        while (mi < merges.length) {
          val l = merges(mi)(0); val r = merges(mi)(1)
          val n = syms.size
          val out = new java.util.ArrayList[String](n)
          var j = 0
          while (j < n) {
            if (j + 1 < n && syms.get(j) == l && syms.get(j + 1) == r) {
              out.add(l + r); j += 2
            } else { out.add(syms.get(j)); j += 1 }
          }
          syms = out
          mi += 1
        }
        if (!firstWord) sb.append('\u001f')
        firstWord = false
        var k = 0
        while (k < syms.size) {
          if (k > 0) sb.append(' ')
          sb.append(syms.get(k)); k += 1
        }
      }
      wi += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
