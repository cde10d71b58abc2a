package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the standard first step of corpus text cleaning: the same
  * visible string can arrive precomposed ("é" U+00E9) or decomposed
  * ("e"+U+0301) depending on the crawler/OCR/source OS, and every
  * downstream exact-match op (exact dedup hashes, shingles, token ids,
  * blocklists) silently misses across the two encodings until text is
  * canonicalized. NFC is the interchange default; NFKC additionally folds
  * compatibility forms (ligatures, full-width Latin, superscripts) — the
  * aggressive variant tokenizer pipelines use.
  *
  * ASCII inputs take a byte-scan fast path (`numBytes == numChars` ⇒ no
  * multi-byte chars ⇒ already normalized in every form); non-ASCII pays
  * `Normalizer.isNormalized` (a cheap quick-check scan) before the
  * allocating normalize. Spark has no built-in for this; the DuckDB
  * oracle mirrors NFC via `nfc_normalize` (`text_nfc` hash-matches on
  * strings built from combining sequences).
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_norm expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form.name())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "${form.name()}")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_norm: unknown form '$other' (expected NFC/NFD/NFKC/NFKD)")
  }

  /** Called from generated code. */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    // ASCII fast path: one UTF-8 byte per char ⇒ no combining marks or
    // compatibility characters ⇒ normalized in every form already
    if (s.numBytes == s.numChars) return s
    val form = Normalizer.Form.valueOf(formName)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
