package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable Bloom filter for semi-join reduction: the 100 TB pattern is
  * "build a small bitset from the selective side, broadcast it, and drop
  * non-matching rows MAP-SIDE before the shuffle join". Spark's built-in
  * runtime filters use xxhash64 over an opaque sketch; this one derives
  * its `nh` positions from the same md5 `h60` hash the rest of the engine
  * uses (`Dedup.h60`), so the filter verdict is bit-reproducible in the
  * DuckDB oracle and across engines.
  *
  * Position j of value v is `h60(v || "#" || j) % m` — identical to the
  * relational `conv(substr(md5(..),1,15),16,10) % m`, proven by the
  * q_bloom_filter oracle row and the differential spec.
  */
object GraftBloom {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5, as a non-negative long — the byte-level twin
    * of the relational h60 (first 15 hex chars parsed base-16). */
  def h60(bytes: Array[Byte]): Long = {
    val d = md5.get().digest(bytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l >>> 4 // 64 big-endian bits -> the leading 15 hex chars' 60
  }

  def position(v: String, j: Int, m: Int): Long =
    h60((v + "#" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8)) % m

  /** Static probe entry point — generated code calls this directly (one
    * static call per row, loop compiled, no interpreter). */
  def mightContain(v: UTF8String, bits: Array[Byte], nh: Int, m: Int)
      : Boolean = {
    val s = v.toString
    var j = 0
    while (j < nh) {
      val p = position(s, j, m)
      if ((bits((p >> 3).toInt) & (1 << (p & 7).toInt)) == 0) return false
      j += 1
    }
    true
  }
}

/** `bloom_might_contain(v)` against a plan-embedded bitset: false means
  * DEFINITELY absent (safe to drop before a join), true means possibly
  * present (the exact join settles it). Null input yields null. */
case class BloomMightContain(child: Expression, bits: Array[Byte],
    nh: Int, m: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    // geometry is validated HERE so malformed-but-foldable SQL arguments
    // (1-byte bitset with m=8192, m=0, NULL bits) fail analysis with a
    // named error instead of crashing executors mid-scan
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
    else if (bits == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName bits must not be NULL")
    else if (nh < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName nh=$nh must be >= 1")
    else if (m < 8 || m % 8 != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName m=$m must be a positive multiple of 8")
    else if (bits.length != m / 8)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName bits has ${bits.length} bytes but m=$m needs ${m / 8}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    GraftBloom.mightContain(v.asInstanceOf[UTF8String], bits, nh, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the bitset rides the plan as a reference object — broadcast with the
    // codegen'd stage, no per-row materialization
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "byte[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.GraftBloom.mightContain($v, $bitsRef, $nh, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object Bloom {
  /** Build the m-bit bitset from the key frame. Driver traffic is the
    * DISTINCT POSITION set (≤ m rows ≡ the bitset's own size), never the
    * keys — the build stays bounded no matter how many keys feed it. */
  def buildBits(keys: DataFrame, keyCol: String, nh: Int = 3,
      m: Int = 8192): Array[Byte] = {
    require(m % 8 == 0, s"m=$m must be a multiple of 8")
    val positions = keys
      .select(col(keyCol).cast("string").as("v")).distinct()
      .select(col("v"), explode(sequence(lit(0), lit(nh - 1))).as("j"))
      .select((graft.llm.Dedup.h60(
        concat(col("v"), lit("#"), col("j").cast("string"))) % m).as("p"))
      .distinct().collect().map(_.getLong(0))
    val bits = new Array[Byte](m / 8)
    positions.foreach { p =>
      bits((p >> 3).toInt) = (bits((p >> 3).toInt) | (1 << (p & 7).toInt)).toByte
    }
    bits
  }

  /** Column API over a built bitset. */
  def mightContain(v: Column, bits: Array[Byte], nh: Int = 3,
      m: Int = 8192): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      BloomMightContain(GraftBridge.expression(v.cast("string")), bits, nh, m))
  }

  /** The composed scale pattern: map-side bloom prefilter, then the exact
    * semi-join over the (hopefully now much smaller) survivor set. Result
    * equals the plain semi-join — the bloom admits false positives only,
    * and the exact join removes them. */
  def bloomSemiJoin(big: DataFrame, bigKey: String, keys: DataFrame,
      keyCol: String, nh: Int = 3, m: Int = 8192): DataFrame = {
    val bits = buildBits(keys, keyCol, nh, m)
    big.filter(mightContain(col(bigKey), bits, nh, m))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** Oracle query: the bloom VERDICT itself, per probe key — (custkey,
    * might, member) for every ordering customer probed against a bloom of
    * the high-balance customers. `member && !might` rows are impossible
    * (no false negatives); `might && !member` rows are the false-positive
    * budget the m/nh choice buys. */
  def bloomQuery(spark: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    import graft.Tables.t
    val ks = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000).select(col("c_custkey").as("k"))
    val bits = buildBits(ks, "k")
    t(spark, dir, "orders")
      .select(col("o_custkey").as("custkey")).distinct()
      .withColumn("might", mightContain(col("custkey"), bits))
      .join(ks.withColumn("member", lit(true)),
        col("custkey") === col("k"), "left")
      .select(col("custkey"), col("might"),
        coalesce(col("member"), lit(false)).as("member"))
      .orderBy("custkey")
  }
}
