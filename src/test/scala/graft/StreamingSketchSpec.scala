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
}
