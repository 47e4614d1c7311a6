package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy (bits per codepoint) as a native codegen
  * expression — the cheapest structural quality signal a crawl pipeline
  * runs: natural-language text sits in a narrow entropy band (~3.5–4.5
  * bits for English), while base64/hex blobs, minified code, and
  * binary-pasted-as-text score high and repeated-character spam scores
  * near zero. One pass over the string per row, ZERO shuffles corpus-wide
  * — where the relational formulation (explode to one row per char,
  * two aggregations) shuffles |corpus|·|chars| rows to compute a per-row
  * number.
  *
  * Determinism contract (what makes the value oracle-checkable): the
  * per-codepoint terms are folded in ASCENDING CODEPOINT order, so an
  * engine that replays the same fold (DuckDB: `list(term ORDER BY cp)`
  * — UTF-8 binary string order IS codepoint order for single-codepoint
  * strings) produces the same double up to per-term log2 ulps, orders of
  * magnitude inside a round(…, 6) margin. Empty string → 0.0; null → null.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, but got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    CharEntropy.entropy(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.entropy($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  private val InvLn2 = 1.0 / math.log(2.0)

  /** One-pass kernel (static entry for codegen + eval): count codepoints
    * into a sorted map, fold −p·log2(p) in ascending-codepoint order.
    * The map is bounded by the DISTINCT codepoints of one value (ASCII
    * text: ≤ 128 entries), not by string length. */
  def entropy(v: UTF8String): Double = {
    val s = v.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().doubleValue() / n
      acc += p * (math.log(p) * InvLn2)
    }
    -acc
  }

  /** Column API (classic-session bridge Column ↔ catalyst Expression). */
  def char_entropy(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CharEntropy(GraftBridge.expression(c)))
  }
}
