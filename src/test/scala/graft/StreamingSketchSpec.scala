package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSketch

/** Stream/batch parity for the Count-Min maintenance job. */
class StreamingSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming CMS counters equal the batch sketch over the same data") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingSketch.cmsStream(input.toDF().toDF("v"), "v",
      d = 4, w = 64)
    val q = out.writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      val batch1 = (1 to 200).map(i => s"k${i % 37}")
      val batch2 = (1 to 100).map(i => s"k${i % 11}")
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch twin over the concatenated data, via the SHARED bucketRows
      val all = (batch1 ++ batch2).toDF("v")
      val batch = graft.operators.Sketches.bucketRows(all, "v", 4, 64)
        .groupBy("j", "b").agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      // the state IS the sketch: never more than d*w counter rows
      assert(streamed.size <= 4 * 64)
    } finally q.stop()
  }

  test("streaming KMV equals the batch sketch over the same data; state bounded by k") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingSketch.kmvStream(
      input.toDF().toDF("g", "v"), "g", "v", k = 16)
    val q = out.writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    try {
      // "hot" exceeds k distinct values (estimate path, incl. re-arrivals
      // across batches); "cold" stays below k (exact path)
      val batch1 = (1 to 40).map(i => ("hot", s"v$i")) ++
        (1 to 5).map(i => ("cold", s"c$i"))
      val batch2 = (20 to 90).map(i => ("hot", s"v$i")) ++
        (3 to 7).map(i => ("cold", s"c$i"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // the final sketch per group, order-independently: n_kept is
      // nondecreasing over triggers, and once at k the estimate only
      // grows (h_k only shrinks) — so the final state is the max
      // (n_kept, est) pair regardless of sink row order
      val streamed = spark.table("kmv").collect()
        .map(r => (r.getString(0), (r.getInt(1), r.getDouble(2))))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).max }
      val batch = graft.operators.Sketches.kmvDistinct(
        (batch1 ++ batch2).toDF("g", "v"), "g", "v", k = 16)
        .collect()
        .map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      assert(streamed == batch)
      // exact below k, estimating at k
      assert(batch("cold")._1 == 7 && batch("cold")._2 == 7.0)
      assert(batch("hot")._1 == 16)
    } finally q.stop()
  }

  test("streaming HLL equals the batch sketch over concatenated batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val perTrigger = scala.collection.mutable
      .ArrayBuffer[Map[String, (Long, Long, Double)]]()
    val q = StreamingSketch.hllStream(
        input.toDF().toDF("g", "v"), "g", "v")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        perTrigger += b.collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
        ()
      }.start()
    // "hot" spans both batches with overlap (re-arrivals must not move
    // registers); "cold" arrives only in batch 1 — its batch-1 emit IS
    // its final state
    val batch1 = (1 to 300).map(i => ("hot", s"v$i")) ++
      (1 to 10).map(i => ("cold", s"c$i"))
    val batch2 = (200 to 700).map(i => ("hot", s"v$i"))
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val finalPerGroup = (perTrigger.head ++ perTrigger.last).keySet.map {
      g => g -> perTrigger.reverse.collectFirst {
        case m if m.contains(g) => m(g)
      }.get
    }.toMap
    val batch = graft.operators.Sketches.hllDistinct(
        (batch1 ++ batch2).toDF("g", "v"), "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(finalPerGroup == batch)
  }

  test("streaming bottom-k sample equals the batch sketch over concatenated batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toSeq
    val batches = ev.grouped((ev.size / 3) + 1).toSeq
    val input = MemoryStream[(Long, Double)]
    val perTrigger =
      scala.collection.mutable.ArrayBuffer[Set[(Long, Double, Long)]]()
    val q = StreamingSketch.bottomKStream(
        input.toDF().toDF("event_id", "value"), "event_id", "value", k = 64)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        perTrigger += b.collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
        ()
      }.start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = perTrigger.last
    val batch = graft.operators.Sketches.bottomKSample(
        ev.toDF("event_id", "value"), "event_id", "value", k = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(perTrigger.forall(_.size <= 64)) // state bounded every trigger
  }
}
