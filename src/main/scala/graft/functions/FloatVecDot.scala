package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Analysis-time input validation shared by the float-vector expressions.
  * `ExpectsInputTypes` is private[sql], but `checkInputDataTypes` is an
  * ordinary override — without it, binding to e.g. ARRAY<DOUBLE> would
  * call getFloat on 8-byte slots and silently return garbage (ADVICE r4). */
private[functions] object FloatVecChecks {
  def check(name: String, left: Expression, right: Expression)
      : TypeCheckResult =
    Seq(left, right).zipWithIndex.collectFirst {
      case (e, i) if (e.dataType match {
            case ArrayType(FloatType, _) => false
            case _ => true
          }) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires ARRAY<FLOAT> arguments, but argument ${i + 1} " +
            s"is ${e.dataType.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** Native dot product of two ARRAY<FLOAT> columns, accumulated in double —
  * the hot scalar of the similarity family (cosine top-k, k-NN join, ANN
  * scoring runs it once per candidate row).
  *
  * The `zip_with` + `aggregate` formulation evaluates its lambda INTERPRETED
  * per element (higher-order functions are CodegenFallback), allocating a
  * zipped array per row. This expression generates a tight primitive loop
  * inside whole-stage codegen: no allocation, no virtual calls, no codegen
  * barrier around the scoring projection.
  *
  * Semantics match the fold exactly, including the edge cases the lambda
  * form produces: accumulation is sequential in index order (bit-identical
  * to `list_reduce` in the DuckDB oracle), a length mismatch yields NULL
  * (zip_with pads with null, null poisons the fold), and any null element
  * yields NULL.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    FloatVecChecks.check(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_vec_dot"
}

object FloatVecDot {
  /** Column API. */
  def float_vec_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      FloatVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

/** Fused cosine similarity of two ARRAY<FLOAT> columns: ONE loop
  * accumulates the dot product and both squared norms, then evaluates
  * `dot / (sqrt(na) * sqrt(nb))` — the exact arithmetic of the composed
  * `dot(a,b) / (norm(a) * norm(b))` form (same accumulation order, same
  * operation order), at a third of the array passes. NULL semantics match
  * the composed form: length mismatch or any null element yields NULL.
  * One DELIBERATE divergence: a zero-norm vector yields IEEE NaN here,
  * where the composed form under ANSI mode (Spark 4 default) throws
  * DIVIDE_BY_ZERO — a degenerate embedding should not kill a 100 TB scan. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    FloatVecChecks.check(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_vec_cosine"
}

object FloatVecCosine {
  /** Column API. */
  def float_vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      FloatVecCosine(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
