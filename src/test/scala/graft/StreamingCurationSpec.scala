package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{TextCuration, TextOps}

/** Stream/batch parity for the STATELESS curation gates: the Gopher rule
  * battery, the C4 heuristics, and char entropy are pure per-document
  * projections/per-doc aggregations, so applying them inside foreachBatch
  * must produce exactly the batch answer for the same rows — no
  * watermarks, no state, no cross-batch coupling. This pins the
  * deployment claim that the whole quality-gate family runs unchanged on
  * a live ingest. */
class StreamingCurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private val rows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog with the others"),
    (13L, "bullet magnet doc that the fabrication slice will decorate"),
    (17L, "ellipsis magnet doc that the fabrication slice will decorate"),
    (2L, "plain second doc with a few more of the usual words in it"))

  test("gopher + c4 + entropy gates are batch-equal under foreachBatch") {
    val s = spark; import s.implicits._
    implicit val sql = s.sqlContext
    def gates(df: org.apache.spark.sql.DataFrame) = {
      val g = TextCuration.gopherRulesOf(df)
        .select(col("doc_id"), col("keep").as("gopher_keep"))
      val c = TextCuration.c4RulesOf(df)
        .select(col("doc_id"), col("doc_keep").as("c4_keep"))
      val e = df.select(col("doc_id"),
        round(graft.functions.CharEntropy.char_entropy(col("text")), 6)
          .as("ent"))
      g.join(c, "doc_id").join(e, "doc_id")
    }
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= gates(batch).collect()
        ()
      }
      .start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = collected
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("gopher_keep"), r.getAs[Int]("c4_keep"),
          r.getAs[Double]("ent"))).toMap
    val batch = gates(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("gopher_keep"), r.getAs[Int]("c4_keep"),
          r.getAs[Double]("ent"))).toMap
    assert(streamed == batch)
    assert(streamed.size == rows.size)
  }
}
