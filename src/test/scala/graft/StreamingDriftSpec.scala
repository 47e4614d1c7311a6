package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatTests
import graft.streaming.StreamingDrift

/** Stream/batch parity of the PSI drift monitor over real events. */
class StreamingDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming PSI monitor equals the batch test over the same windows") {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    val ev = Tables.t(spark, sfDir, "events")
      .select(expr("ts DIV 86400000000000").as("d"), col("value"))
    val dmin = ev.agg(min("d")).head().getLong(0)
    val ref = ev.filter(col("d") - dmin < 15).select("value")
      .localCheckpoint(true)
    val cur = ev.filter(col("d") - dmin >= 15)
      .as[(Long, Double)].collect().map(_._2).toSeq
    val Array(vmin, vmax) = ref.agg(min("value"), max("value"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    // reference histogram: the persisted artifact, binned by the SAME rule
    val refHist = ref
      .select(StatTests.bucketCol(col("value"), lit(vmin), lit(vmax), 10)
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_ref"))
      .localCheckpoint(true)
    // current window arrives as three microbatches
    val input = MemoryStream[Double]
    var last: Seq[(Int, Long)] = Nil
    val q = StreamingDrift.bucketCountStream(
        input.toDF().toDF("value"), vmin, vmax)
      .writeStream.outputMode("complete")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        last = b.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq; ()
      }.start()
    try {
      cur.grouped((cur.size / 3) + 1)
        .foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val curCounts = last.toDF("bucket", "c_cur")
    val streamed = StreamingDrift.psiReport(refHist, curCounts).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = StatTests.psi(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq == batch.toSeq)
    assert(last.size <= 10) // the monitor state IS the bucket table
  }
}
