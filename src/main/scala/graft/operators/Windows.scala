package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** As-of / analytic-window surface (SURVEY §2.3 J3, §2.4 A8, §2.6 families
  * 3, 5, 9).
  *
  * The reference's as-of lookup is a per-record Elasticsearch query
  * (`determine_change_job.py:194-227`: guid match + updateTime < t, sort desc,
  * size=1). Re-expressed as `lag` over (partition by key, order by time) —
  * one shuffle on the key instead of one HTTP round-trip per record; at
  * 100 TB the partition count follows the key cardinality, no driver state.
  */
object Windows {

  private def byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** J3 as-of: previous event's value per user (strictly-before semantics via
    * total order (ts, event_id)). */
  def asofLag(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("prev_value", lag("value", 1).over(byUser))
      .withColumn("delta",
        (dec(col("value")) - dec(col("prev_value"))).cast("double"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("prev_value"), col("delta"))
      .orderBy("user_id", "event_id")

  /** A8 last-wins: latest event per user via max_by over a total order.
    * Single shuffle on user_id with map-side partial max_by — the scalable
    * form of the reference's dict-overwrite accumulate
    * (`synchronize_app_search.py:335,396,462,524,561`). */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        max_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("last_event_id"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("last_value"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** Top-1-per-key via row_number (the other J3 form). */
  def top1PerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts"), desc("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "value")
      .orderBy("user_id")
  }

  /** Ranking window: top-3 orders per customer by totalprice. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  /** Running (cumulative) sum per key, rowsBetween unbounded-preceding..current.
    * Exact decimal accumulation so the oracle matches bit-for-bit. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("running_value",
        sum(dec(col("value"))).over(w).cast("double"))
      .select("user_id", "event_id", "value", "running_value")
      .orderBy("user_id", "event_id")
  }
}
