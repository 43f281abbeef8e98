package graft.functions.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.UrlNormalizer

/** Native Catalyst expressions for the URL scalar functions — the codegen
  * upgrade path from the engine's Scala UDFs (SURVEY.md §4.3.5): no
  * serialization round-trip, null handling inlined, and the call sits
  * inside the surrounding whole-stage-codegen'd Project instead of
  * breaking it the way a UDF does.
  *
  * Registered via [[GraftExtensions]] (`spark.sql.extensions=
  * graft.functions.expressions.GraftExtensions` on spark-submit) as
  * `graft_url_normalize` / `graft_surt_host`.
  */
object UrlExpressions {
  // static entry points referenced from generated code
  def normalizeOrNull(u: UTF8String): UTF8String =
    if (u == null) null
    else UrlNormalizer.normalize(u.toString) match {
      case Some(n) => UTF8String.fromString(n)
      case None => null
    }

  def surtHost(u: UTF8String): UTF8String =
    if (u == null) null
    else UTF8String.fromString(UrlNormalizer.surtHost(UrlNormalizer.hostOf(u.toString)))
}

/** RFC 3986 normalization (null ⇒ unfetchable), codegen'd. */
case class UrlNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_normalize"

  override def nullSafeEval(input: Any): Any =
    UrlExpressions.normalizeOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UrlExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $helper.normalizeOrNull($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlNormalizeExpr =
    copy(child = newChild)
}

/** SURT host reversal of a URL's host, codegen'd. */
case class SurtHostExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_surt_host"

  override def nullSafeEval(input: Any): Any =
    UrlExpressions.surtHost(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UrlExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.surtHost($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SurtHostExpr =
    copy(child = newChild)
}

/** `SparkSessionExtensions` hook registering the native URL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_url_normalize"),
      new ExpressionInfo(classOf[UrlNormalizeExpr].getName, "graft_url_normalize"),
      (children: Seq[Expression]) => UrlNormalizeExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_surt_host"),
      new ExpressionInfo(classOf[SurtHostExpr].getName, "graft_surt_host"),
      (children: Seq[Expression]) => SurtHostExpr(children.head)))
  }
}
