package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass N-Triples line parse: `<s> <p> (term) .` →
  * `STRUCT<subject, predicate, obj>`, NULL for malformed lines.
  *
  * Replaces three `regexp_extract` calls over the same pattern (each runs
  * its own regex match) with a single compiled match per line — the
  * "optional custom Expression for perf" upgrade from SURVEY.md §7.3.
  * Same grammar as [[graft.functions.Nt]]: IRIs in angle brackets, object
  * term captured raw (IRI or quoted literal with optional suffix).
  */
case class ParseNt(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_nt expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("subject", StringType),
    StructField("predicate", StringType),
    StructField("obj", StringType)))

  override def nullable: Boolean = true

  override def prettyName: String = "parse_nt"

  override protected def nullSafeEval(input: Any): Any =
    ParseNt.parseLine(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ParseNt.parseLine($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseNt {
  private val LineRe: Pattern =
    Pattern.compile("^\\s*<([^>]*)>\\s+<([^>]*)>\\s+(.+?)\\s*\\.\\s*$")

  /** Called from generated code. Returns null for malformed lines. */
  def parseLine(line: UTF8String): InternalRow = {
    val m = LineRe.matcher(line.toString)
    if (!m.matches()) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.group(1)),
      UTF8String.fromString(m.group(2)),
      UTF8String.fromString(m.group(3))))
  }
}
