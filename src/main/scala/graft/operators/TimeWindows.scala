package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time window aggregation (SURVEY §2.6 family 10 / §2.7). The batch
  * forms here share semantics with the streaming pipelines in
  * graft.streaming (same `window`/`session_window` functions under a
  * watermark); the driver's oracle checks the batch equivalence.
  *
  * events.ts arrives as Long nanoseconds (see Verify's nanosAsLong); the
  * window functions need TimestampType, so we view it at microsecond
  * precision — bucket boundaries ≫ precision, so truncation is lossless
  * for bucketing.
  */
object TimeWindows {

  // integer division (`/` on longs is double division and double-rounds at
  // 2^53 — enough to shift a microsecond at ns-epoch magnitudes)
  private def tsCol = timestamp_micros(expr("ts DIV 1000"))

  /** Tumbling 1-hour counts per event_type. Epoch-aligned buckets; emitted
    * as epoch-millis window start for oracle parity. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("tts", tsCol)
      .groupBy(window(col("tts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(unix_millis(col("w.start")).as("wstart_ms"), col("event_type"),
        col("n"), col("total"))
      .orderBy("wstart_ms", "event_type")

  /** Sliding 2-hour windows every 1 hour (each event lands in 2 windows). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("tts", tsCol)
      .groupBy(window(col("tts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("wstart_ms"), col("n"))
      .orderBy("wstart_ms")

  /** Session windows per user with a 30-minute gap: a new session starts
    * when the gap to the previous event is >= 30 min (Spark sessions merge
    * only on strict overlap). */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("tts", tsCol)
      .groupBy(session_window(col("tts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        col("n"))
      .orderBy("user_id", "session_start_ms")
}
