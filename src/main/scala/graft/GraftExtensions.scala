package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Engine extension point (SURVEY §7.4): registers every custom expression
  * with the session so SQL users get them natively.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   — or spark.sql.extensions=graft.GraftExtensions
  *   — or GraftExtensions.install(spark) on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, clazz, build) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))
    }
}

object GraftExtensions {

  /** The single source of truth for (SQL name, class, builder) — shared by
    * builder-time injection and runtime [[install]]. */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("json_canonicalize", classOf[JsonCanonicalize],
      (exprs: Seq[Expression]) => JsonCanonicalize(exprs.head)),
    ("float_vec_dot", classOf[FloatVecDot],
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))),
    ("float_vec_cosine", classOf[FloatVecCosine],
      (exprs: Seq[Expression]) => FloatVecCosine(exprs(0), exprs(1))),
    ("map_added_keys", classOf[MapKeyDiff],
      (exprs: Seq[Expression]) =>
        MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeAdded)),
    ("map_deleted_keys", classOf[MapKeyDiff],
      (exprs: Seq[Expression]) =>
        MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeDeleted)),
    ("map_changed_keys", classOf[MapKeyDiff],
      (exprs: Seq[Expression]) =>
        MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeChanged)),
    ("map_scrub", classOf[MapScrub],
      (exprs: Seq[Expression]) => MapScrub(exprs.head)),
    ("relationship_diff", classOf[RelationshipDiff],
      (exprs: Seq[Expression]) => RelationshipDiff(exprs(0), exprs(1))))

  /** Runtime registration into an existing session (shared test sessions,
    * REPLs) — same function list as the builder-time extension point. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, clazz, build) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        new ExpressionInfo(clazz.getName, name), build)
    }
}
