package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First `nibbles` hex digits of md5 as a BIGINT, computed straight from
  * the digest bytes — bit-identical to
  * `conv(substring(md5(x), 1, nibbles), 16, 10)` (and to DuckDB's
  * `('0x' || substr(md5(x), 1, nibbles))::BIGINT`) but without
  * materializing the 32-char hex string per call. `nibbles` ≤ 15 keeps the
  * value inside signed 64-bit.
  */
case class Md5Long(child: Expression, nibbles: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && nibbles >= 1 && nibbles <= 15)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long expects (STRING, 1<=nibbles<=15), got ${child.dataType.simpleString}, $nibbles")

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_long"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long.hashLong(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hashLong($c, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Called from generated code. */
  def hashLong(s: UTF8String, nibbles: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // value of the first `nibbles` hex digits = big-endian nibble prefix
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = d(i / 2) & 0xff
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}
