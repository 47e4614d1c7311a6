package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Generic as-of join (SURVEY J3 generalized): for every left row, attach
  * the latest right row with the same key and time ≤ left time.
  *
  * Algorithm — the single-shuffle union form, not a join:
  *   1. tag both sides, union on (key, time, side, right-payload)
  *   2. one window over (partition by key, order by time, right-first):
  *      `last(right-payload, ignoreNulls)` carries the most recent right
  *      value forward
  *   3. keep left rows
  * Cost: ONE shuffle on the key and one sort — no per-key top-1 join, no
  * range-join explosion. This is the plan that survives 100 TB: both sides
  * stream through the same exchange, and skewed keys behave like any other
  * windowed sort.
  *
  * (The reference does this as one Elasticsearch query per record —
  * `/root/reference/scripts/determine_change_job.py:194-227`.)
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi-key column name present on both sides
    * @param leftTime   left event-time column (long-comparable)
    * @param rightTime  right event-time column (long-comparable)
    * @param rightCols  right payload columns to attach (null when no match)
    * @param strict     true → right.time < left.time; false → ≤ */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // truly-NULL structs (a struct() of null fields is NOT null — last()'s
    // ignoreNulls would keep it)
    val rpayNull = lit(null).cast(StructType(rightCols.map(c =>
      StructField(c, right.schema(c).dataType))))
    val lpayNull = lit(null).cast(StructType(left.columns.map(c =>
      StructField(c, left.schema(c).dataType))))
    // NULL keys never match in join semantics: route null-key left rows
    // straight to the no-match output instead of letting partitionBy group
    // them into one shared "null" partition that would cross-match
    val unioned = left.filter(col(key).isNotNull).select(
        col(key).as("_k"), col(leftTime).cast("long").as("_t"),
        lit(1).as("_side"), // left sorts after right at equal times (≤)
        rpayNull.as("_rpay"),
        struct(left.columns.map(col): _*).as("_lpay"))
      .unionByName(right.filter(col(key).isNotNull).select(
        col(key).as("_k"), col(rightTime).cast("long").as("_t"),
        lit(0).as("_side"),
        struct(rightCols.map(col): _*).as("_rpay"),
        lpayNull.as("_lpay")))
    // strict: left sorts BEFORE right at equal times, so an equal-time right
    // row is not visible to it
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    carried.select(
      left.columns.map(c => col(s"_lpay.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
      .unionByName(left.filter(col(key).isNull)
        .select(left.columns.map(col) ++
          rightCols.map(c => rpayNull(c).as(c)): _*))
  }

  /** Q-asof-join: each event attaches the user's most recent order at or
    * before the event time. Oracle = DuckDB's native ASOF JOIN. */
  def eventsAsofOrders(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000000").as("ts_ms"))
    // dedupe right time ties (same customer, same order timestamp) so the
    // as-of pick is well-defined on both engines
    val wTies = Window.partitionBy("user_id", "o_ms")
      .orderBy(desc("o_orderkey"))
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"),
        // NTZ → TZ under the UTC session, then epoch millis
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_ms"),
        col("o_orderkey"), col("o_totalprice"))
      .withColumn("_rn", row_number().over(wTies))
      .filter(col("_rn") === 1).drop("_rn")
    asofJoin(events, orders, "user_id", "ts_ms", "o_ms",
      Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("event_id")
  }
}
