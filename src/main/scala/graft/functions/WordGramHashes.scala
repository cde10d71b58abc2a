package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional word-k-gram md5-prefix hashes of a text column, one 60-bit
  * hash per gram start position, as a native expression.
  *
  * Equivalent to
  * {{{
  * transform(sequence(0, size(ws) - k),
  *           i -> md5_long(array_join(slice(ws, i + 1, k), ' '), nibbles))
  * }}}
  * over `ws = split(text, ' ')` (and to DuckDB's
  * `list_transform(range(0, len(ws)-k+1), i ->
  *   ('0x' || substr(md5(array_to_string(ws[i+1:i+k], ' ')), 1, nibbles))::BIGINT)`),
  * but in one compiled pass with ZERO string building: because the token
  * list is `split` on a single space, the space-joined gram
  * `tok_i .. tok_{i+k-1}` is exactly a byte range of the original text
  * (0x20 never occurs inside a UTF-8 multibyte sequence), so each hash is
  * md5 over a slice of the input bytes. The interpreted-lambda form costs
  * three higher-order evals plus O(k) string copies per gram — this was
  * the entire 11.7 s cost of `dedup_spans` at sf0.1.
  *
  * Fewer than k tokens → empty array. Used by
  * [[graft.ops.Dedup.dedupSpans]]; reference anchor: exact-substring
  * span dedup (Lee et al. 2022) at token granularity.
  */
case class WordGramHashes(child: Expression, k: Int, nibbles: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && nibbles >= 1 && nibbles <= 15)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes expects (STRING, k>=1, 1<=nibbles<=15), " +
        s"got ${child.dataType.simpleString}, k=$k, nibbles=$nibbles")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "word_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashes.gramHashes(input.asInstanceOf[UTF8String], k, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramHashes.gramHashes($c, $k, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramHashes {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Called from generated code. */
  def gramHashes(text: UTF8String, k: Int, nibbles: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token i spans [starts(i), starts(i+1) - 1); starts(n) = len + 1
    // sentinel so the formula holds for the last token too. split(' ', -1)
    // semantics: n = spaces + 1, trailing/empty tokens kept.
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
    val md = digests.get()
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val off = starts(i)
      val glen = starts(i + k) - 1 - off
      md.reset()
      md.update(bytes, off, glen)
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < nibbles) {
        val b = d(j / 2) & 0xff
        v = (v << 4) | (if (j % 2 == 0) b >>> 4 else b & 0xf)
        j += 1
      }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }
}
