package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the text-cleanup
  * primitive a crawl-scale curation pipeline runs before tokenization and
  * dedup (C4-style corpora normalize so that visually identical strings
  * hash identically; decomposed "a" + U+0300 and precomposed "à" must be
  * ONE token, one shingle, one dedup key). Spark ships no normalizer;
  * this wraps `java.text.Normalizer` in whole-stage codegen with an
  * ASCII fast path, so on mostly-ASCII corpora the per-row cost is one
  * byte/char-count compare — no String materialization, no normalizer
  * call.
  *
  * The form (NFC/NFD/NFKC/NFKD) is a constructor constant, not a child
  * expression: it rides the plan, the codegen emits it as a literal, and
  * an invalid form fails at analysis time, not per row.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (!UnicodeNormalize.forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.forms.mkString(", ")}, got '$form'")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, but got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  // the Form enum is resolved ONCE per plan, not per row: eval caches
  // it here, codegen emits the enum constant itself (the form name was
  // validated at analysis time, so Form.<form> always exists)
  @transient private lazy val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.norm(v.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormalize.norm($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {

  val forms: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")

  /** Normalize one value (static entry for codegen + eval; the form
    * arrives pre-resolved — an enum constant in generated code). ASCII
    * fast path: a UTF8String whose byte count equals its char count is
    * pure ASCII, and every normalization form is the identity on ASCII —
    * return the input without materializing a java.lang.String. */
  def norm(v: UTF8String, form: java.text.Normalizer.Form): UTF8String =
    if (v.numBytes() == v.numChars()) v
    else UTF8String.fromString(java.text.Normalizer.normalize(v.toString, form))

  /** Column API (classic-session bridge Column ↔ catalyst Expression). */
  def unicode_normalize(c: Column, form: String): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), form))
  }
}
