package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics
import graft.streaming.StreamingFunnel

/** Stream/batch parity and ordering contract of the incremental funnel. */
class StreamingFunnelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def runStream(batches: Seq[Seq[(Long, String, Long)]])
      : Seq[StreamingFunnel.FunnelAdvance] = {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val collected =
      scala.collection.mutable.ArrayBuffer[StreamingFunnel.FunnelAdvance]()
    val q = StreamingFunnel.funnelAdvances(input.toDS()).writeStream
      .outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingFunnel.FunnelAdvance],
         _: Long) => collected ++= b.collect(); ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    collected.toSeq
  }

  test("in-order stream advances exactly like the batch rule, once per step") {
    val adv = runStream(Seq(
      Seq((1L, "view", 10L), (1L, "click", 20L)),
      Seq((1L, "view", 25L), (1L, "purchase", 30L),   // extra view ignored
          (2L, "click", 5L), (2L, "view", 10L)),      // click too early
      Seq((2L, "click", 15L))))                       // second click counts
    val real = adv.filter(!_.late).map(a => (a.user_id, a.step, a.ts)).toSet
    assert(real == Set((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
      (2L, 1, 10L), (2L, 2, 15L)), real)
  }

  test("cross-batch out-of-order event is DLQ data, not a state rewind") {
    val adv = runStream(Seq(
      Seq((1L, "view", 100L)),
      Seq((1L, "view", 50L),          // older than the high-water mark
          (1L, "click", 150L))))
    assert(adv.count(_.late) == 1 && adv.filter(_.late).head.ts == 50L)
    val real = adv.filter(!_.late).map(a => (a.step, a.ts)).toSet
    assert(real == Set((1, 100L), (2, 150L)), real) // t1 still 100
  }

  test("streaming funnel over microbatched real events equals the batch funnel") {
    val s = spark; import s.implicits._
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .orderBy("ts")
      .as[(Long, String, Long)].collect().toSeq
    val batches = ev.grouped((ev.size / 3) + 1).toSeq
    val adv = runStream(batches)
    val streamed = StreamingFunnel.funnelReport(
      adv.toDF("user_id", "step", "ts", "late")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val batch = EventAnalytics.funnel(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(adv.forall(!_.late)) // ts-ordered feed: nothing late
  }
}
