package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Base for string→X expressions whose codegen is a static helper call —
  * stays inside whole-stage codegen with a compiled per-row body.
  */
abstract class StaticStringExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")
}

/** `normalize_label` as a native expression (SURVEY.md §2.6 F7 hot-path
  * upgrade): lowercase + NFD accent fold + punctuation→space + collapse.
  */
case class NormalizeLabelExpr(child: Expression) extends StaticStringExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_label"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalize.normalize(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Normalize.normalize($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `normalize_singular` — the reference's full normalization pipeline
  * (F7∘F8): singularize(normalize(x)).
  */
case class NormalizeSingularExpr(child: Expression) extends StaticStringExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_singular"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalize.normalizeSingular(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Normalize.normalizeSingular($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash over unicode code points:
  * `h_0 = c_0; h_i = (31·h_{i-1} + c_i) mod 999999999999989` (empty → 0).
  * The modulus < 2^50 keeps `31·h + c` inside signed 64-bit. Mirrorable in
  * the oracle as
  * `list_reduce([unicode(ch)::BIGINT ...], (a,b) -> (a*31+b) % M)`.
  */
case class RollingHash(child: Expression) extends StaticStringExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Mod = 999999999999989L

  /** Called from generated code. */
  def hash(text: UTF8String): Long = {
    val s = text.toString
    if (s.isEmpty) return 0L
    var h = 0L
    var first = true
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = if (first) cp.toLong else (h * 31L + cp) % Mod
      first = false
      i += Character.charCount(cp)
    }
    h
  }
}
