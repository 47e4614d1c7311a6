package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-layout operators: at 100 TB the scan you avoid beats the scan you
  * optimize. Z-ordering interleaves the bits of two clustering dimensions
  * into one Morton key; range-partitioning + sorting by that key gives
  * every file a tight bounding box in BOTH dimensions, so min/max
  * (parquet footer) pruning works for predicates on either one — a plain
  * sort gives that for the leading dimension only. */
object Layout {

  /** 2-D Morton key: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Unrolled into `bits` fixed shift-mask-add terms — a flat
    * codegen'd integer expression, no per-element lambda. Inputs must be
    * non-negative and < 2^bits for a faithful interleave (higher bits are
    * ignored, as documented). */
  def zkey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val la = a.cast("long")
    val lb = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(lb, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order the frame for writing: range-partition on the Morton key
    * (`numParts` target files), sort within partitions. Each output
    * partition covers one contiguous Z-curve segment ≈ a small rectangle
    * in (a, b) space — the property the ZorderSpec measures. */
  def zorderLayout(df: DataFrame, a: String, b: String, numParts: Int,
      bits: Int = 16): DataFrame = {
    // pick a scratch name the frame doesn't use — withColumn REPLACES an
    // existing column, and drop would then erase the caller's data
    val zc = Iterator.from(0).map(i => s"_zkey$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zc, zkey2(col(a), col(b), bits))
      .repartitionByRange(numParts, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Oracle query: the Morton key of every distinct (l_partkey,
    * l_suppkey) pair — pins the interleave bit-for-bit. */
  def zorderQuery(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
      .withColumn("zkey", zkey2(col("l_partkey"), col("l_suppkey")))
      .orderBy("zkey", "l_partkey", "l_suppkey")
}
