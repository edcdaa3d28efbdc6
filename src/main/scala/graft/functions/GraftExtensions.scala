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

  /** Runtime registration on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = htmlUnescapeDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
