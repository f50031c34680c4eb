package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SURT canonicalization as a NATIVE Catalyst expression (SURVEY §7 "nice":
 * the hottest projection in every build job —
 * /root/reference/src/main/java/org/archive/hadoop/mapreduce/CDXMapper.java:42-50).
 * Unlike a Scala UDF, this stays inside whole-stage codegen: `doGenCode`
 * emits a direct static call, so the projection pipeline around it is not
 * broken into an eval boundary and no Row ser/de happens per value.
 */
case class SurtExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"surt requires a STRING argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "surt"

  override def nullSafeEval(input: Any): Any =
    SurtCodegen.surt(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SurtCodegen.surt($c)")

  override protected def withNewChildInternal(newChild: Expression): SurtExpression =
    copy(child = newChild)
}

/**
 * Static entry point shared by interpreted eval and generated code.
 * Deliberately NOT the expression's companion object: a companion whose
 * class inherits any member named like the helper gets no static
 * forwarder, so Janino would only see `eval(InternalRow)` and whole-stage
 * codegen would silently fall back to interpreted mode.
 */
object SurtCodegen {
  def surt(u: UTF8String): UTF8String =
    if (u == null) null
    else UTF8String.fromString(Surt.surtLenient(u.toString))
}
