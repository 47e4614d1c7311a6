package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.JsonCanonicalize

/** Engine extension point (SURVEY §7.4): registers custom expressions with
  * the session so SQL users get them natively.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   — or spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("json_canonicalize"),
      new ExpressionInfo(classOf[JsonCanonicalize].getName,
        "json_canonicalize"),
      (exprs: Seq[Expression]) => JsonCanonicalize(exprs.head)))
  }
}
