package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics
import graft.streaming.StreamingAnalytics

/** Stream/batch parity of the incremental session-stats and
  * Markov-transition maintenance jobs over time-ordered microbatches
  * of real events. */
class StreamingAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming session stats equal the batch query over concatenated batches") {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Long)].collect().toSeq
    val batches = ev.grouped((ev.size / 3) + 1).toSeq
    val input = MemoryStream[(Long, Long, Long)]
    val last = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    val q = StreamingAnalytics.sessionStatsStream(
        input.toDF().toDF("user_id", "event_id", "ts"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          last(r.getLong(0)) =
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        }; ()
      }.start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val batch = EventAnalytics.sessionStatsOf(
        ev.toDF("user_id", "event_id", "ts")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(last.toMap == batch)
  }

  test("a session spanning two triggers is one session, not two") {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val last = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    val q = StreamingAnalytics.sessionStatsStream(
        input.toDF().toDF("user_id", "event_id", "ts"), gapNs = 100L)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          last(r.getLong(0)) =
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        }; ()
      }.start()
    try {
      input.addData((1L, 1L, 0L), (1L, 2L, 50L)); q.processAllAvailable()
      // 99 < gap from 50 → SAME session continues across the trigger
      input.addData((1L, 3L, 149L), (1L, 4L, 400L)); q.processAllAvailable()
    } finally q.stop()
    // sessions: [0,149] (3 events), [400] → 2 sessions, 1 bounce, dur 149
    assert(last(1L) == (2L, 1L, 149L, 3L), last(1L))
  }

  test("streaming Markov pairs equal the batch adjacency, including cross-trigger pairs") {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val batches = ev.grouped((ev.size / 3) + 1).toSeq
    val input = MemoryStream[(Long, Long, Long, String)]
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = StreamingAnalytics.markovStream(
        input.toDF().toDF("user_id", "event_id", "ts", "event_type"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted ++= b.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))); ()
      }.start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // batch twin: per-user lead window over the same events
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batchPairs = ev.toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .select("user_id", "event_type", "dst").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def multiset(xs: Seq[(Long, String, String)]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    assert(multiset(emitted.toSeq) == multiset(batchPairs.toSeq))
    // sanity: the aggregated counts reproduce q_markov's count table
    val fromStream = multiset(emitted.toSeq).toSeq
      .groupBy { case ((_, a, b), _) => (a, b) }
      .view.mapValues(_.map(_._2).sum).toMap
    val batchCounts = EventAnalytics.markovTransitionsOf(
        ev.toDF("user_id", "event_id", "ts", "event_type")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    assert(fromStream == batchCounts)
  }
}
