package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for `css_count(html, selector)` — parse the
  * document and count querySelectorAll matches without a ScalaUDF boundary,
  * keeping the whole projection inside one WholeStageCodegen span. The
  * per-row work (parse) dominates either way; what this buys is the codegen
  * pipeline staying fused around it (no ScalaUDF interpreted-eval island)
  * plus the executor-wide compiled-selector cache shared with the UDF
  * surface.
  *
  * Column usage: register via GraftExtensions, then
  * `call_function("css_count_native", htmlCol, lit(selector))`.
  */
case class HtmlCssCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "css_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"css_count requires (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(html: Any, sel: Any): Any =
    HtmlCssCount.count(html.asInstanceOf[UTF8String], sel.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, s) =>
      s"graft.functions.HtmlCssCount.count($h, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlCssCount =
    copy(left = newLeft, right = newRight)
}

object HtmlCssCount {
  /** Static entry point shared by interpreted eval and generated code. */
  def count(html: UTF8String, sel: UTF8String): Int =
    HtmlFunctions.cssCountKernel(html.toString, sel.toString)
}
