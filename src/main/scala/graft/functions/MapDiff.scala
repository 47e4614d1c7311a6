package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native map-diff kernels for the determine_change hot path (A1–A4 +
  * P8/P9 scrubbing). The higher-order-function formulations
  * (`filter(map_keys(m), k => …)`, `map_filter`) evaluate their lambda
  * INTERPRETED per key per row; these expressions make one static call per
  * row into a while-loop kernel over the raw MapData, inside whole-stage
  * codegen. Entity attribute maps are small (≲ tens of keys), so the
  * membership probe is a linear scan — allocation-free until the output.
  *
  * Semantics are pinned to the HOF forms by differential tests
  * (MapDiffSpec): same key sets, same binary-collation sort, same
  * null-safe value comparison, same scrub predicate. */
object MapDiffKernel {

  final val ModeAdded = 0   // keys in n, absent from o
  final val ModeDeleted = 1 // keys in o, absent from n
  final val ModeChanged = 2 // keys in both, values differ (null-safe)

  private val LBracket = UTF8String.fromString("[")

  private def indexOf(keys: ArrayData, n: Int, k: UTF8String): Int = {
    var i = 0
    while (i < n) {
      if (keys.getUTF8String(i).equals(k)) return i
      i += 1
    }
    -1
  }

  def diff(n: MapData, o: MapData, mode: Int): ArrayData = {
    val (src, other) = if (mode == ModeDeleted) (o, n) else (n, o)
    val srcKeys = src.keyArray()
    val otherKeys = other.keyArray()
    val out = new java.util.ArrayList[UTF8String](src.numElements())
    var i = 0
    while (i < src.numElements()) {
      val k = srcKeys.getUTF8String(i)
      val j = indexOf(otherKeys, other.numElements(), k)
      mode match {
        case ModeChanged =>
          if (j >= 0) {
            val nv = if (n.valueArray().isNullAt(i)) null
              else n.valueArray().getUTF8String(i)
            val ov = if (o.valueArray().isNullAt(j)) null
              else o.valueArray().getUTF8String(j)
            val equal = (nv == null && ov == null) ||
              (nv != null && ov != null && nv.equals(ov))
            if (!equal) out.add(k)
          }
        case _ => if (j < 0) out.add(k)
      }
      i += 1
    }
    // binary-collation ascending — identical to array_sort on StringType
    java.util.Collections.sort(out)
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** P8/P9 scrub: drop entries whose value is null or a canonical-JSON
    * array (prefix "["). Same predicate as the map_filter form. */
  def scrub(m: MapData): MapData = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    val n = m.numElements()
    val outK = new java.util.ArrayList[AnyRef](n)
    val outV = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!vals.isNullAt(i)) {
        val v = vals.getUTF8String(i)
        if (!v.startsWith(LBracket)) {
          outK.add(keys.getUTF8String(i))
          outV.add(v)
        }
      }
      i += 1
    }
    if (outK.size == n) m // nothing dropped: reuse the input as-is
    else new ArrayBasedMapData(
      new GenericArrayData(outK.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(outV.toArray.asInstanceOf[Array[Any]]))
  }

  private[functions] def checkStringMap(name: String, es: Seq[Expression])
      : TypeCheckResult =
    es.zipWithIndex.collectFirst {
      case (e, i) if (e.dataType match {
            case MapType(StringType, StringType, _) => false
            case _ => true
          }) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires MAP<STRING,STRING> arguments, but argument " +
            s"${i + 1} is ${e.dataType.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  /** Null-safe field-by-field equality of two all-string struct rows —
    * representation-independent (UnsafeRow vs GenericInternalRow binary
    * comparison is not). */
  private def rowEq(a: org.apache.spark.sql.catalyst.InternalRow,
      b: org.apache.spark.sql.catalyst.InternalRow, numFields: Int)
      : Boolean = {
    var j = 0
    while (j < numFields) {
      val an = a.isNullAt(j)
      if (an != b.isNullAt(j)) return false
      if (!an && !a.getUTF8String(j).equals(b.getUTF8String(j))) return false
      j += 1
    }
    true
  }

  /** A5/A6 kernel: per key of `n`, the elements of n[k] not present in
    * o[k] — `array_except` semantics (distinct, left order) — dropping
    * now-empty keys. One call per row replacing the interpreted
    * map_zip_with + array_except + map_filter chain. */
  def relDiff(n: MapData, o: MapData, numFields: Int): MapData = {
    import org.apache.spark.sql.catalyst.InternalRow
    val nKeys = n.keyArray()
    val nVals = n.valueArray()
    val outK = new java.util.ArrayList[AnyRef](n.numElements())
    val outV = new java.util.ArrayList[AnyRef](n.numElements())
    var i = 0
    while (i < n.numElements()) {
      val k = nKeys.getUTF8String(i)
      if (!nVals.isNullAt(i)) {
        val arr = nVals.getArray(i)
        val j = indexOf(o.keyArray(), o.numElements(), k)
        val oArr = if (j < 0 || o.valueArray().isNullAt(j)) null
          else o.valueArray().getArray(j)
        val kept = new java.util.ArrayList[InternalRow](arr.numElements())
        var a = 0
        while (a < arr.numElements()) {
          // null elements follow array_except semantics (the HOF reference
          // tolerates them): null equals only null, deduped like any value
          val row = if (arr.isNullAt(a)) null else arr.getStruct(a, numFields)
          var drop = false
          if (oArr != null) {
            var b = 0
            while (!drop && b < oArr.numElements()) {
              drop = if (row == null) oArr.isNullAt(b)
                else !oArr.isNullAt(b) &&
                  rowEq(row, oArr.getStruct(b, numFields), numFields)
              b += 1
            }
          }
          var dup = false
          if (!drop) {
            var c = 0
            while (!dup && c < kept.size) {
              dup = if (row == null) kept.get(c) == null
                else kept.get(c) != null &&
                  rowEq(row, kept.get(c), numFields)
              c += 1
            }
          }
          if (!drop && !dup) kept.add(if (row == null) null else row.copy())
          a += 1
        }
        if (kept.size > 0) {
          outK.add(k)
          outV.add(new GenericArrayData(kept.toArray.asInstanceOf[Array[Any]]))
        }
      }
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(outK.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(outV.toArray.asInstanceOf[Array[Any]]))
  }
}

/** Sorted key-diff of two MAP<STRING,STRING> columns; see [[MapDiffKernel]]. */
case class MapKeyDiff(left: Expression, right: Expression, mode: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    MapDiffKernel.checkStringMap(prettyName, Seq(left, right))

  override def nullSafeEval(n: Any, o: Any): Any =
    MapDiffKernel.diff(n.asInstanceOf[MapData], o.asInstanceOf[MapData], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, o) =>
      s"${ev.value} = graft.functions.MapDiffKernel.diff($n, $o, $mode);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "map_key_diff"
}

object MapKeyDiff {
  import org.apache.spark.sql.GraftBridge
  private def mk(n: Column, o: Column, mode: Int): Column =
    GraftBridge.column(MapKeyDiff(
      GraftBridge.expression(n), GraftBridge.expression(o), mode))
  def added_keys(n: Column, o: Column): Column =
    mk(n, o, MapDiffKernel.ModeAdded)
  def deleted_keys(n: Column, o: Column): Column =
    mk(n, o, MapDiffKernel.ModeDeleted)
  def changed_keys(n: Column, o: Column): Column =
    mk(n, o, MapDiffKernel.ModeChanged)
}

/** P8/P9 scrub of a MAP<STRING,STRING> column; see [[MapDiffKernel]]. */
case class MapScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    MapDiffKernel.checkStringMap(prettyName, Seq(child))

  override def nullSafeEval(m: Any): Any =
    MapDiffKernel.scrub(m.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m => s"graft.functions.MapDiffKernel.scrub($m)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "map_scrub"
}

object MapScrub {
  import org.apache.spark.sql.GraftBridge
  def map_scrub(m: Column): Column =
    GraftBridge.column(MapScrub(GraftBridge.expression(m)))
}

/** A5/A6: per-key array diff of relationship maps
  * (MAP<STRING, ARRAY<STRUCT<all-string>>>); see [[MapDiffKernel.relDiff]]. */
case class RelationshipDiff(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.StructType

  private def structArity(dt: DataType): Option[Int] = dt match {
    case MapType(StringType, ArrayType(st: StructType, _), _)
        if st.fields.forall(_.dataType == StringType) => Some(st.fields.length)
    case _ => None
  }

  override def dataType: DataType = left.dataType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (structArity(left.dataType), structArity(right.dataType)) match {
      case (Some(a), Some(b)) if a == b && DataType.equalsStructurally(
          left.dataType, right.dataType, ignoreNullability = true) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two identical MAP<STRING, ARRAY<STRUCT<" +
          s"all-string>>> arguments, got ${left.dataType.catalogString} " +
          s"and ${right.dataType.catalogString}")
    }

  private lazy val numFields: Int = structArity(left.dataType).get

  override def nullSafeEval(n: Any, o: Any): Any =
    MapDiffKernel.relDiff(n.asInstanceOf[MapData], o.asInstanceOf[MapData],
      numFields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, o) =>
      s"graft.functions.MapDiffKernel.relDiff($n, $o, $numFields)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "relationship_diff"
}

object RelationshipDiff {
  import org.apache.spark.sql.GraftBridge
  def relationship_diff(n: Column, o: Column): Column =
    GraftBridge.column(RelationshipDiff(
      GraftBridge.expression(n), GraftBridge.expression(o)))
}
