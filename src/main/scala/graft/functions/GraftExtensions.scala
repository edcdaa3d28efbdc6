package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the native Catalyst
  * expressions for the pure-SQL surface.
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (or call GraftExtensions.register(spark) on an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.htmlUnescapeDescriptor)
    ext.injectFunction(GraftExtensions.cssCountDescriptor)
  }
}

object GraftExtensions {
  private[functions] val htmlUnescapeDescriptor = (
    FunctionIdentifier("html_unescape_native"),
    new ExpressionInfo(classOf[HtmlUnescape].getCanonicalName, "html_unescape_native"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1,
        s"html_unescape_native expects exactly 1 argument, got ${children.length}")
      HtmlUnescape(children.head)
    })

  private[functions] val cssCountDescriptor = (
    FunctionIdentifier("css_count_native"),
    new ExpressionInfo(classOf[HtmlCssCount].getCanonicalName, "css_count_native"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2,
        s"css_count_native expects exactly 2 arguments, got ${children.length}")
      HtmlCssCount(children.head, children(1))
    })

  /** Runtime registration on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(htmlUnescapeDescriptor, cssCountDescriptor).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
