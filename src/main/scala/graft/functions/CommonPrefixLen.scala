package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Length of the common prefix of two `ARRAY<STRING>` token sequences —
  * the LCP kernel of the suffix-array ops ([[graft.ops.SuffixArray]]):
  * one tight codegen'd loop per row instead of an interpreted
  * higher-order fold (the zip_with/aggregate form evaluates an
  * expression tree per element — the VecDot lesson). Null elements
  * never match (a null token ends the prefix).
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"common_prefix_len expects two ARRAY<STRING> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "common_prefix_len"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var go = true
    while (go && i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) go = false
      else if (x.getUTF8String(i).equals(y.getUTF8String(i))) i += 1
      else go = false
    }
    i
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val go = ctx.freshName("go")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0;
         |boolean $go = true;
         |while ($go && $i < $n) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $go = false; }
         |  else if ($a.getUTF8String($i).equals($b.getUTF8String($i))) { $i++; }
         |  else { $go = false; }
         |}
         |${ev.value} = $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
