package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (the LBFS / rsync / FastCDC family —
  * Muthitacharoen et al. '01): cut after every position whose trailing
  * w-codepoint polynomial hash is ≡ 0 (mod 2^maskBits), final position
  * always a cut. Because a boundary depends ONLY on the w characters
  * behind it, an insertion or deletion re-chunks just its neighborhood
  * and every later chunk re-aligns — the property fixed-size chunking
  * lacks and the reason storage dedup and long-document near-dup use CDC
  * keys (expected chunk length = 2^maskBits chars).
  *
  * One compiled pass per document (O(|text|·w), w = 8 by default), inside
  * whole-stage codegen. The window hash is the plain positional
  * polynomial  H(p) = Σ_{j=0}^{w-1} cp(p−j)·31^j  mod 1 000 000 007  over
  * UNICODE CODE POINTS — deliberately re-derivable in ANSI SQL as a
  * list-comprehension sum (the modulus < 2^31 keeps cp·31^j products
  * inside 2^53, so the DuckDB oracle reproduces every boundary exactly;
  * same cross-engine discipline as [[RollingHash]]).
  *
  * Output: 1-based END positions of each chunk, ascending; empty string →
  * empty array. `substring(text, prev+1, cut−prev)` over consecutive
  * pairs reassembles the document byte-exactly.
  */
case class CdcChunks(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 1 && maskBits >= 1 && maskBits <= 30)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects (STRING, w>=1, 1<=maskBits<=30), got " +
        s"${child.dataType.simpleString}, w=$w, maskBits=$maskBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.boundaries(input.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunks.boundaries($c, $w, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  /** < 2^31 so cp·31^j (cp ≤ 0x10FFFF) stays inside 2^53 — the bound the
    * SQL mirror's BIGINT arithmetic needs.
    */
  val Mod = 1000000007L
  val Base = 31L

  /** Called from generated code. */
  def boundaries(text: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // code points, SQL character semantics (same iteration as RollingHash)
    var n = 0
    var i = 0
    while (i < s.length) { n += 1; i += Character.charCount(s.codePointAt(i)) }
    val cps = new Array[Long](n)
    i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    val pows = new Array[Long](w)
    pows(0) = 1L
    var j = 1
    while (j < w) { pows(j) = pows(j - 1) * Base % Mod; j += 1 }
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / (1 << maskBits) + 2)
    var p = w // 1-based end position of the window
    while (p <= n) {
      var h = 0L
      j = 0
      while (j < w) { h = (h + cps(p - 1 - j) * pows(j)) % Mod; j += 1 }
      if ((h & mask) == 0L) out += p
      p += 1
    }
    if (out.isEmpty || out.last.asInstanceOf[Int] != n) out += n
    new GenericArrayData(out.toArray)
  }
}
