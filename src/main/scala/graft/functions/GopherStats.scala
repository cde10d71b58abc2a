package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document token statistics for Gopher-style quality rules
  * (Rae et al. 2021 §A1.1): `STRUCT<n_tok, n_uniq, top_c, sum_len,
  * max_len>` over the whitespace tokens of `text`.
  *
  * Replaces an explode → groupBy(doc, word) → groupBy(doc) plan that
  * shuffled the full token stream twice to compute stats that are all
  * row-local: a single compiled pass with a per-row hash map (token →
  * count) gets the same five numbers with ZERO shuffle — at 100 TB the
  * difference between a map-only scan and re-shuffling the corpus ×2.
  *
  * Tokenization matches `split(text, ' ')` / DuckDB `string_split`:
  * single-space separator, empty tokens kept. Lengths are code-point
  * counts to match SQL `length()` on non-BMP input.
  */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("max_len", LongType, nullable = false)))

  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStatsExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherStatsExpr {

  /** Row-level one-pass stats; called from generated code. */
  def stats(text: UTF8String): InternalRow = {
    // match split(text, ' ') semantics: empty tokens kept
    val ws = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Integer](ws.length * 2)
    var sumLen = 0L
    var maxLen = 0L
    var topC = 0
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      val c = counts.merge(w, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > topC) topC = c
      val len = w.codePointCount(0, w.length).toLong
      sumLen += len
      if (len > maxLen) maxLen = len
      i += 1
    }
    new GenericInternalRow(Array[Any](
      ws.length.toLong, counts.size.toLong, topC.toLong, sumLen, maxLen))
  }
}
