package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Dataset profiling — the pre-flight checks a 100 TB pipeline runs
  * BEFORE choosing a physical plan: how skewed is this join key (do I
  * need salting / AQE skew handling?), and what does each column
  * actually contain (nulls, cardinality, range)? The reference runs
  * per-record with no planning layer; on Spark these reports are what
  * turns partitioning decisions from guesses into measurements.
  */
object Profiling {

  /** Join-key skew report: for each candidate key column, the row
    * count, key cardinality, hottest key's frequency and share, and
    * the p50/p99 of the per-key frequency distribution. `top_share`
    * near 1/n_keys means uniform; `max_freq ≫ p99_freq` is the
    * salting/AQE-skew-join signal.
    *
    * Shape: one groupBy per key column over ONLY that column (parquet
    * prunes the scan to the key), then a percentile aggregate over the
    * key-cardinality-bounded frequency table — the heavy pass is
    * map-side-combinable, the percentile pass is over n_keys rows, not
    * n_rows. Columns profile independently (no shared shuffle to
    * contend on). */
  def skewReportOf(tables: Seq[(String, DataFrame, String)]): DataFrame = {
    val perCol = tables.map { case (tname, df, c) =>
      df.groupBy(col(c).as("k")).agg(count(lit(1)).as("f"))
        .agg(
          sum("f").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max("f").as("max_freq"),
          expr("percentile(f, 0.5)").as("p50_freq"),
          expr("percentile(f, 0.99)").as("p99_freq"))
        .select(lit(s"$tname.$c").as("key_col"), col("n_rows"),
          col("n_keys"), col("max_freq"), col("p50_freq"), col("p99_freq"))
    }
    perCol.reduce(_ unionByName _)
      .withColumn("top_share",
        col("max_freq").cast("double") / col("n_rows").cast("double"))
      .orderBy("key_col")
  }

  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    skewReportOf(Seq(
      ("lineitem", li, "l_partkey"),
      ("lineitem", li, "l_suppkey"),
      ("orders", t(spark, dir, "orders"), "o_custkey")))
  }

  /** Per-column data profile over numeric columns: row count, null
    * count, exact distinct count, min and max (as double). One frame
    * per column so each scan reads EXACTLY one parquet column (column
    * pruning is the point — profiling a 400-column table must not read
    * 400 columns per metric); the per-column jobs are independent and
    * schedule concurrently. */
  def columnProfileOf(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c).as("v")).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col("v")).as("n_distinct"),
          min("v").cast("double").as("min_v"),
          max("v").cast("double").as("max_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _).orderBy("column")

  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    columnProfileOf(t(spark, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
}
