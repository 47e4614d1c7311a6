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

  /** Builder wrapper: a wrong-arity SQL call must surface as an analysis
    * error naming the function, not an IndexOutOfBoundsException from
    * inside the builder. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }

  /** The single source of truth for (SQL name, class, builder) — shared by
    * builder-time injection and runtime [[install]]. */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("json_canonicalize", classOf[JsonCanonicalize],
      arity("json_canonicalize", 1)(exprs => JsonCanonicalize(exprs.head))),
    ("float_vec_dot", classOf[FloatVecDot],
      arity("float_vec_dot", 2)(exprs => FloatVecDot(exprs(0), exprs(1)))),
    ("float_vec_cosine", classOf[FloatVecCosine],
      arity("float_vec_cosine", 2)(exprs =>
        FloatVecCosine(exprs(0), exprs(1)))),
    ("map_added_keys", classOf[MapKeyDiff],
      arity("map_added_keys", 2)(exprs =>
        MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeAdded))),
    ("map_deleted_keys", classOf[MapKeyDiff],
      arity("map_deleted_keys", 2)(exprs =>
        MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeDeleted))),
    ("map_changed_keys", classOf[MapKeyDiff],
      arity("map_changed_keys", 2)(exprs =>
        MapKeyDiff(exprs(0), exprs(1), MapDiffKernel.ModeChanged))),
    ("map_scrub", classOf[MapScrub],
      arity("map_scrub", 1)(exprs => MapScrub(exprs.head))),
    ("relationship_diff", classOf[RelationshipDiff],
      arity("relationship_diff", 2)(exprs =>
        RelationshipDiff(exprs(0), exprs(1)))),
    ("char_entropy", classOf[CharEntropy],
      arity("char_entropy", 1)(exprs => CharEntropy(exprs.head))),
    ("bloom_might_contain", classOf[BloomMightContain],
      arity("bloom_might_contain", 4)(exprs => {
        // the bitset and geometry ride the plan as constants — SQL callers
        // pass them as literals (X'…' hex for the bits)
        def const(e: Expression, name: String, tpe: String): Any = {
          def fail() = throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`bloom_might_contain`",
              "paramName" -> s"`$name`",
              "paramType" -> s""""$tpe""""))
          if (!e.foldable) fail()
          e.eval(null) match {
            case b: Array[Byte] if tpe == "BINARY" => b
            case n: Number if tpe == "INT" => n
            case null if tpe == "BINARY" => null // geometry check names it
            case _ => fail() // a foldable wrong-typed literal, e.g. '3'
          }
        }
        BloomMightContain(exprs(0),
          const(exprs(1), "bits", "BINARY").asInstanceOf[Array[Byte]],
          const(exprs(2), "nh", "INT").asInstanceOf[Number].intValue(),
          const(exprs(3), "m", "INT").asInstanceOf[Number].intValue())
      })),
    ("unicode_normalize", classOf[UnicodeNormalize],
      arity("unicode_normalize", 2)(exprs => {
        // the form is a plan constant (NFC/NFD/NFKC/NFKD), not a per-row
        // value — extract the foldable literal; checkInputDataTypes
        // validates the name at analysis time
        val form = exprs(1) match {
          case e if e.foldable =>
            e.eval(null) match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case other => String.valueOf(other)
            }
          case _ =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "NON_FOLDABLE_ARGUMENT",
              messageParameters = Map(
                "funcName" -> "`unicode_normalize`",
                "paramName" -> "`form`",
                "paramType" -> "\"STRING\""))
        }
        UnicodeNormalize(exprs(0), form)
      })))

  /** Runtime registration into an existing session (shared test sessions,
    * REPLs) — same function list as the builder-time extension point. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, clazz, build) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        new ExpressionInfo(clazz.getName, name), build)
    }
}
