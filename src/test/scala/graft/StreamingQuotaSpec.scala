package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingQuota

/** Per-source quota enforcement: admission counts persist across
  * microbatches, overflow is emitted (not swallowed), and independent
  * sources do not share budget. */
class StreamingQuotaSpec extends AnyFunSuite {
  import SparkTestSession._

  test("quota admits exactly N per source across batches; drops are data") {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingQuota.quotaStream(input.toDF()
        .toDF("doc_id", "source"), quota = 3)
      .writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "a"), (3L, "b"))
      q.processAllAvailable()
      // batch 2 pushes source a OVER quota; b stays under
      input.addData((4L, "a"), (5L, "a"), (6L, "b"))
      q.processAllAvailable()
      val rows = s.table("quota").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Int]("admitted"), r.getAs[Long]("seq")))
      assert(rows.length == 6) // every row emitted, drops included
      val admitted = rows.filter(_._3 == 1)
      assert(admitted.count(_._2 == "a") == 3) // state crossed the batch gap
      assert(admitted.count(_._2 == "b") == 2)
      // the over-quota doc carries its would-be index, not silence
      val dropped = rows.filter(_._3 == 0)
      assert(dropped.map(_._1).toSet == Set(5L))
      assert(dropped.head._4 == 4L)
      // admission indices are dense 1..n per source
      assert(rows.filter(_._2 == "a").map(_._4).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
