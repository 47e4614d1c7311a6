package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Engine extension point (SURVEY §7.4): registers every custom expression
  * with the session so SQL users get them natively.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   — or spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(e: SparkSessionExtensions, name: String, clazz: Class[_])(
      build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      build))

  override def apply(e: SparkSessionExtensions): Unit = {
    fn(e, "json_canonicalize", classOf[JsonCanonicalize])(
      exprs => JsonCanonicalize(exprs.head))
    fn(e, "float_vec_dot", classOf[FloatVecDot])(
      exprs => FloatVecDot(exprs(0), exprs(1)))
    fn(e, "float_vec_cosine", classOf[FloatVecCosine])(
      exprs => FloatVecCosine(exprs(0), exprs(1)))
    fn(e, "map_added_keys", classOf[MapKeyDiff])(
      exprs => MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeAdded))
    fn(e, "map_deleted_keys", classOf[MapKeyDiff])(
      exprs => MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeDeleted))
    fn(e, "map_changed_keys", classOf[MapKeyDiff])(
      exprs => MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeChanged))
    fn(e, "map_scrub", classOf[MapScrub])(
      exprs => MapScrub(exprs.head))
    fn(e, "relationship_diff", classOf[RelationshipDiff])(
      exprs => RelationshipDiff(exprs(0), exprs(1)))
  }
}
