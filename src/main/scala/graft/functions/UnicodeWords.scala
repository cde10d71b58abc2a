package graft.functions

import java.text.BreakIterator

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware word segmentation (`unicode_words`) as a native codegen
  * expression: `java.text.BreakIterator.getWordInstance` boundaries
  * (UAX #29 word rules as shipped by the JDK), keeping exactly the
  * segments that contain a letter or digit — the standard "words only"
  * filter. This is the multilingual upgrade of the engine's `split(' ')`
  * tokenizer contract: scripts written without spaces (Han runs stay
  * whole; Japanese splits at script boundaries — kanji|hiragana|katakana),
  * apostrophe/hyphen-joined Latin words ("it's", "meters-long"), and
  * numeric shapes ("3.14", "1,000") all segment the way a BreakIterator
  * corpus pipeline expects, for any language, with no dictionary.
  *
  * Composition: `array_join(unicode_words(text), ' ')` canonicalizes any
  * corpus into the single-space token contract every downstream op
  * (shingles, BM25, LM, span dedup) consumes — the tokenizer swaps in
  * without touching them (TextSpec pins BM25-over-CJK through exactly
  * this composition).
  *
  * Cost shape: per-row allocation of the Java string + iterator is
  * inherent to BreakIterator (thread-confined mutable state, one
  * instance per partition via a per-thread cache would still pay the
  * setText scan); the ASCII-heavy fast path is NOT taken because unlike
  * normalization, segmentation differs from a whitespace split even for
  * pure ASCII (punctuation stripping, joiners). Still a codegen
  * expression — one static call, no UDF serialization penalty.
  */
case class UnicodeWords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_words expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unicode_words"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeWords.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeWords.segment($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeWords {

  // BreakIterator instances are mutable and not thread-safe; one per
  // executor thread, reused across rows (getWordInstance construction
  // parses rule tables — measurable per-row)
  private val iter: ThreadLocal[BreakIterator] =
    ThreadLocal.withInitial(() => BreakIterator.getWordInstance(java.util.Locale.ROOT))

  /** Called from generated code. */
  def segment(s: UTF8String): ArrayData = {
    val str = s.toString
    val bi = iter.get()
    bi.setText(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      var hasWordChar = false
      var i = start
      while (i < end && !hasWordChar) {
        val cp = str.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) hasWordChar = true
        i += Character.charCount(cp)
      }
      if (hasWordChar) out += UTF8String.fromString(str.substring(start, end))
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray[Any])
  }
}
