package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-function + remaining analytic surface (SURVEY §2.2 P11–P14,
  * §2.6 family 9 extras): string/date/regex functions, conditional
  * aggregation, pivot, ranking variants. All single-scan projections or
  * one-shuffle aggregates. */
object Scalar {

  /** String functions over the part dimension. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        lower(col("p_brand")).as("lower_brand"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_padded"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Date-part extraction from order timestamps. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"), // 1 = Sunday
        quarter(col("o_orderdate")).as("q"))
      .orderBy("o_orderkey")

  /** Regex extraction/replacement/count over document text. */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "(sc[a-z]+)", 1).as("first_sc_word"),
        regexp_count(col("text"), lit("an")).as("n_an"),
        regexp_replace(col("text"), "[aeiou]", "").as("devoweled"))
      .orderBy("doc_id")

  /** Conditional aggregation (FILTER-style) per customer segment. */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("c_acctbal") > 5000, true)).as("n_rich"),
        count(when(col("c_acctbal") < 0, true)).as("n_negative"),
        dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")

  /** Pivot: event counts per user across the 5 event types. */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** dense_rank + ntile quartiles of order value per customer. */
  def rankVariants(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        dense_rank().over(w).as("dr"),
        ntile(4).over(w).as("quartile"))
      .filter(col("dr") <= 5)
      .orderBy("o_custkey", "dr", "o_orderkey")
  }
}
