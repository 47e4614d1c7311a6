package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.ModelStore
import graft.streaming.StreamingRelease

/** Incremental corpus-release contract (VERDICT r9 #4 / r10 #3): the
  * ledger-served release manifest equals the batch composition over the
  * union of the ingested microbatches, replay is idempotent, and the
  * release-time read touches only the score ledger (never raw text). */
class StreamingReleaseSpec extends AnyFunSuite {
  import SparkTestSession._

  private val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "text")

  private def withDirs[T](body: (ModelStore, String, String) => T): T = {
    val lmDir = Files.createTempDirectory("graft-rel-lm-")
    val hashDir = Files.createTempDirectory("graft-rel-hash-")
    val scoreDir = Files.createTempDirectory("graft-rel-score-")
    try body(new ModelStore(spark, lmDir.toString), hashDir.toString,
      scoreDir.toString)
    finally Seq(lmDir, hashDir, scoreDir)
      .foreach(ModelStore.deleteRecursively)
  }

  private def manifestRows(scorePath: String): Seq[String] =
    StreamingRelease.releaseManifest(spark, scorePath)
      .collect().map(_.toString).toSeq

  test("ledger-served manifest == batch corpusRelease over the ingested union; replay idempotent") {
    withDirs { (lmStore, hashPath, scorePath) =>
      llm.TextOps.lmSave(docs, lmStore)
      // three ascending-doc_id microbatches (the StreamingCuration
      // batch-order convention the keep-one parity needs)
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(3).over(w))
        .localCheckpoint(true)
      val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
        hashPath, scorePath) _
      (1 to 3).foreach(s =>
        ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L))
      val streamed = manifestRows(scorePath)
      // batch reference: same docs, same frozen LM, wholesale
      val survivors = docs
        .join(llm.Dedup.keepOneIds(docs), Seq("doc_id"))
        .select("doc_id", "lang", "text").localCheckpoint(true)
      val scored = llm.TextOps.lmScoreRowsPersisted(survivors, lmStore)
        .join(survivors.select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tok")),
          Seq("doc_id"))
      val batch = llm.TextOps.releaseManifestFrom(scored, 8)
        .collect().map(_.toString).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // replay: re-deliver the middle batch — identical partition
      // content, identical manifest (effectively-once)
      ingest(sliced.filter(col("__s") === 2).drop("__s"), 1L)
      assert(manifestRows(scorePath) === streamed)
    }
  }

  test("cross-batch exact duplicates collapse to the first batch's keeper; manifest never re-reads text") {
    withDirs { (lmStore, hashPath, scorePath) =>
      llm.TextOps.lmSave(docs, lmStore)
      val n = docs.count()
      val cut = n / 2
      val b0 = docs.filter(col("doc_id") < cut)
      // second batch re-sends some first-batch texts under new ids —
      // the hash store must drop them (keep-one keeps the earlier id)
      val dupes = b0.limit(20)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("lang"),
          col("text"))
      val b1 = docs.filter(col("doc_id") >= cut).unionByName(dupes)
      val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
        hashPath, scorePath) _
      ingest(b0, 0L)
      ingest(b1, 1L)
      // no re-sent id ever enters the score ledger
      val ledgerIds = spark.read.option("basePath", scorePath)
        .parquet(s"$scorePath/batch=0", s"$scorePath/batch=1")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ledgerIds.forall(_ < 1000000L))
      // and the manifest equals the batch release over the ORIGINAL
      // docs (the dupes are release-invisible)
      val streamed = manifestRows(scorePath)
      val survivors = docs
        .join(llm.Dedup.keepOneIds(docs), Seq("doc_id"))
        .select("doc_id", "lang", "text").localCheckpoint(true)
      val scored = llm.TextOps.lmScoreRowsPersisted(survivors, lmStore)
        .join(survivors.select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tok")),
          Seq("doc_id"))
      val batch = llm.TextOps.releaseManifestFrom(scored, 8)
        .collect().map(_.toString).toSeq
      assert(streamed === batch)
      // the ledger is five narrow columns — the release read carries no
      // text payload
      assert(spark.read.parquet(s"$scorePath/batch=0").columns.sorted
        === Array("doc_id", "lang", "n_bigrams", "n_tok", "xent"))
    }
  }

  test("MemoryStream wiring: triggered microbatches land as batch=0/1 and serve the same manifest") {
    val s = spark; import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withDirs { (lmStore, hashPath, scorePath) =>
      llm.TextOps.lmSave(docs, lmStore)
      val n = docs.count()
      val cut = n / 2
      val rows = docs.as[(Long, String, String)].collect().sortBy(_._1)
      val (r1, r2) = rows.partition(_._1 < cut)
      val ckpt = Files.createTempDirectory("graft-rel-ckpt-").toString
      val input = MemoryStream[(Long, String, String)]
      val q = StreamingRelease.incrementalRelease(
        input.toDF().toDF("doc_id", "lang", "text"), lmStore,
        hashPath, scorePath, ckpt).start()
      try {
        input.addData(r1.toSeq: _*); q.processAllAvailable()
        input.addData(r2.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = manifestRows(scorePath)
      // == the direct foreachBatch-body ingest of the same slices
      withDirs { (lm2, hash2, score2) =>
        llm.TextOps.lmSave(docs, lm2)
        val ingest = StreamingRelease.releaseIngestBatch(spark, lm2,
          hash2, score2) _
        ingest(docs.filter(col("doc_id") < cut), 0L)
        ingest(docs.filter(col("doc_id") >= cut), 1L)
        assert(manifestRows(score2) === streamed)
      }
    }
  }
}
