package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical-JSON normalization (SURVEY §4.2 / §7.3): the one custom
  * Catalyst expression the engine needs. Entity attribute values are stored
  * as JSON text; canonicalization (recursively sorted object keys, no
  * whitespace) makes value equality = string equality, which keeps the diff
  * algebra (A1–A3) a pure columnar map comparison.
  *
  * The reference sidesteps this with per-record pandas `json_normalize`
  * (`/root/reference/scripts/determine_change_job.py:67-83`) — row-at-a-time
  * Python. Here it is a scalar expression evaluated inside the JVM row
  * pipeline (CodegenFallback: one virtual call per row; the surrounding
  * operators stay in whole-stage codegen).
  *
  * Non-JSON input is passed through unchanged (attribute values may be bare
  * strings).
  */
case class JsonCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    JsonCanonicalize.canon(v.asInstanceOf[UTF8String])
  // real doGenCode (not CodegenFallback): the call compiles into the
  // whole-stage-codegen function body — no per-row InternalRow boxing, no
  // codegen barrier around the ingest projection. `canon` is reachable
  // from generated Java via the companion's static forwarder.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.JsonCanonicalize.canon($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "json_canonicalize"
}

object JsonCanonicalize {
  private[functions] val mapper = new ObjectMapper()

  /** Canonicalize one UTF8String value (static entry for codegen + eval).
    * Non-JSON and malformed input passes through unchanged. */
  def canon(v: UTF8String): UTF8String = {
    val t = v.toString.trim
    if (t.isEmpty || !(t.startsWith("{") || t.startsWith("["))) v
    else try UTF8String.fromString(write(mapper.readTree(t)))
    catch { case _: Exception => v }
  }

  /** Deterministic serialization: object keys sorted, arrays in order. */
  private[functions] def write(n: JsonNode): String = n match {
    case o: ObjectNode =>
      val names = scala.collection.mutable.ArrayBuffer[String]()
      o.fieldNames().forEachRemaining(f => names += f)
      names.sorted
        .map(f => s"${mapper.writeValueAsString(f)}:${write(o.get(f))}")
        .mkString("{", ",", "}")
    case a: ArrayNode =>
      (0 until a.size()).map(i => write(a.get(i))).mkString("[", ",", "]")
    case other => mapper.writeValueAsString(other)
  }

  /** Column API (classic-session bridge Column ↔ catalyst Expression). */
  def json_canonicalize(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(JsonCanonicalize(GraftBridge.expression(c)))
  }

  /** SQL registration: `SELECT json_canonicalize(col) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_canonicalize", exprs => JsonCanonicalize(exprs.head), "built-in")
}
