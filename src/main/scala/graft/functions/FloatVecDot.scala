package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  // input contract: both children are ARRAY<FLOAT> (the callers in
  // graft.llm.Similarity only ever pass embedding columns; Spark's
  // AbstractDataType/ExpectsInputTypes machinery is private[sql])
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

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
