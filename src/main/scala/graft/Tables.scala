package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Table loading + shared numeric helpers.
  *
  * Oracle-determinism rule: any aggregated double goes through
  * `decimal(12,4)` so Spark and DuckDB both compute the EXACT same
  * value (decimal arithmetic is exact in both engines; the final
  * cast-to-double of identical decimals is identical bits). Raw
  * doubles read straight from parquet are already bit-identical.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** events.ts contract: Long NANOSECONDS since epoch, exact and
    * order-preserving. The driver's testdata has shipped the column both
    * as parquet TIMESTAMP(NANOS) — which `nanosAsLong` surfaces as Long
    * directly — and as TIMESTAMP(MICROS), which Spark reads as a
    * timestamp type. Normalize the latter here so every consumer keeps
    * the Long-nanos contract and the DuckDB oracle's `epoch_ns(ts)`
    * stays the mirror image. The NTZ→timestamp cast is wall-clock
    * identity under the UTC session timezone, exactly how DuckDB's
    * naive-timestamp epoch_ns treats it; micros·1000 is exact in Long
    * until year 2262. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      // a future testdata drop shipping ts as string/double must fail
      // LOUD at the contract boundary — a catch-all cast would silently
      // produce nulls in every downstream ts comparison (ADVICE r6)
      case other => throw new IllegalArgumentException(
        s"events.ts arrived as $other — expected Long nanos or a parquet " +
          "timestamp type; extend normalizeTs deliberately if the physical " +
          "type changed")
    }

  /** Exact decimal sum surfaced as double — matches DuckDB
    * `CAST(SUM(CAST(x AS DECIMAL(14,2))) AS DOUBLE)` bit-for-bit.
    * Testdata numerics are 2-decimal, so scale 2 is exact; keeping scales
    * low keeps every sum's scaled integer < 2^53, where decimal→double
    * conversion is exact in both engines (DuckDB's wider-scale int128→double
    * cast double-rounds, and its decimal downscale truncates — so neither
    * wide scales nor rescale-casts are portable). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact decimal value column (prices, quantities, values): scale 2. */
  def dec(c: Column): Column = c.cast("decimal(14,2)")

  /** Exact decimal rate column (discount, tax): scale 2, narrow. */
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** Exact average: exact decimal sum divided (in double) by count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
