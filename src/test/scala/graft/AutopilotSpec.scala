package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.ModelStore
import graft.streaming.{StreamingAnn, StreamingRelease}

/** Bounded-storage soak (VERDICT r14 #4): the autopilot presets must
  * turn "runs for years" from an argument into a test. 50 microbatches
  * with deletes, re-inserts, and takedowns through [[StreamingAnn
  * .annAutopilot]] / [[StreamingRelease.releaseAutopilot]]; every
  * store's directory/version count stays bounded by its dial, serves
  * stay green throughout, and the final serve is bit-identical to a
  * never-retained twin fed the same batches. */
class AutopilotSpec extends AnyFunSuite {
  import SparkTestSession._

  private val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "text")

  private def batchDirs(path: String): Int = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (!Files.isDirectory(p)) 0
    else scala.util.Using.resource(Files.list(p))(
      _.iterator().asScala.count(
        _.getFileName.toString.startsWith("batch=")))
  }

  test("ANN autopilot 50-batch soak: versions <= keepLast, raw/tomb/monitor dirs bounded, serve == never-retained twin bit-identically throughout") {
    val names = Seq("store", "codes", "mon", "raw", "tomb", "drift",
      "basestore", "tstore", "tcodes", "ttomb")
    val dirs = names.map(n => Files.createTempDirectory(s"graft-ap-$n-"))
    val Seq(storeDir, codesDir, monDir, rawDir, tombDir, driftDir,
      baseDir, tStoreDir, tCodesDir, tTombDir) = dirs
    try {
      val idxStore = new ModelStore(spark, storeDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      val baseStore = new ModelStore(spark, baseDir.toString)
      llm.Similarity.saveQuantizers(emb, idxStore)
      StreamingAnn.saveDriftReference(
        emb.filter(pmod(col("vec_id"), lit(4)) === 0), idxStore,
        driftStore)
      // the never-retained twin: same deterministic quantizer training,
      // plain ingest/delete, nothing ever folded, GC'd, or purged
      val twinStore = new ModelStore(spark, tStoreDir.toString)
      llm.Similarity.saveQuantizers(emb, twinStore)
      // rebuild arm hard-off: a rebuild retrains quantizers (a
      // different-but-correct index) and the twin claim is about
      // RETENTION invisibility, which is orthogonal
      val auto = StreamingAnn.annAutopilot(spark, idxStore, driftStore,
        baseStore, codesDir.toString, monDir.toString, rawDir.toString,
        tombDir.toString, threshold = Double.MaxValue,
        minRebuildN = Long.MaxValue, compactRatio = 0.0,
        minCompactN = 120L, gcKeepVersions = 2, foldMonitorEvery = 8L,
        monitorKeepRecent = 4L, purgeKeepRecent = 4L) _
      val qv = llm.Similarity.queryVecOf(emb, 0L)
      def serveAuto(): Seq[String] =
        StreamingAnn.searchAuto(spark, idxStore, codesDir.toString, qv,
          qId = 0L, tombPath = Some(tombDir.toString))
          .collect().map(_.toString).toSeq
      def serveTwin(): Seq[String] =
        StreamingAnn.searchIncremental(spark, twinStore,
          tCodesDir.toString, qv, qId = 0L,
          tombPath = Some(tTombDir.toString))
          .collect().map(_.toString).toSeq

      (0 until 50).foreach { b =>
        // insert slice b%10; every 5th batch also DELETE slice
        // (b+3)%10 — slices come back around, so deletes are followed
        // by re-inserts (the resurrection path) and some deletes hit
        // never-inserted ids (harmless by the winners rule)
        val ins = emb
          .filter(pmod(col("vec_id"), lit(10)) === b % 10)
          .select(col("vec_id"), col("embedding"), lit("u").as("op"))
        val batch = if (b % 5 == 4)
          ins.unionByName(emb
            .filter(pmod(col("vec_id"), lit(10)) === (b + 3) % 10)
            .select(col("vec_id"), col("embedding"), lit("d").as("op")))
        else ins
        val pinned = batch.localCheckpoint(true)
        auto(pinned, b.toLong)
        // twin: identical effects, zero retention
        val dels = pinned.filter(col("op") === "d").select("vec_id")
          .distinct().localCheckpoint(true)
        StreamingAnn.annDeleteBatch(spark, tTombDir.toString)(dels,
          b.toLong)
        StreamingAnn.annIngestBatch(spark, twinStore,
          tCodesDir.toString)(
          pinned.filter(col("op") =!= "d")
            .join(broadcast(dels), Seq("vec_id"), "left_anti")
            .select("vec_id", "embedding"), b.toLong)
        // bounds hold after EVERY batch, not just at the end
        assert(idxStore.versions.size <= 2,
          s"batch $b: ${idxStore.versions.size} versions on disk")
        assert(batchDirs(rawDir.toString) <= 14,
          s"batch $b: raw dirs ${batchDirs(rawDir.toString)}")
        assert(batchDirs(tombDir.toString) <= 14,
          s"batch $b: tomb dirs ${batchDirs(tombDir.toString)}")
        assert(batchDirs(monDir.toString) <= 14,
          s"batch $b: monitor dirs ${batchDirs(monDir.toString)}")
        assert(baseStore.versions.size <= 1,
          s"batch $b: base store leaked versions")
        if (b % 10 == 9)
          assert(serveAuto() === serveTwin(),
            s"batch $b: retained serve diverged from the twin")
      }
      // storage actually reclaimed, not merely ignorable: a
      // never-retained loop would hold 50 raw dirs and 10 tomb dirs
      assert(batchDirs(rawDir.toString) < 20)
      assert(batchDirs(tCodesDir.toString) === 50) // the twin does
      // final serve bit-identical to the never-retained twin
      assert(serveAuto() === serveTwin())
      // the monitor series survived its folds end-to-end: one row per
      // batch, exact batch attribution
      val mon = StreamingRelease.readMonitor(spark, monDir.toString).get
      assert(mon.select("batch").distinct().count() === 50L)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("release autopilot 50-batch soak with takedowns: ledger/tomb dirs bounded by the fold dial, manifest == never-folded twin bit-identically throughout") {
    val names = Seq("hash", "score", "tomb", "thash", "tscore", "ttomb")
    val dirs = names.map(n => Files.createTempDirectory(s"graft-rap-$n-"))
    val Seq(hashDir, scoreDir, tombDir, tHashDir, tScoreDir,
      tTombDir) = dirs
    try {
      val lmStore = llm.TextOps.sharedLmFor(spark, sfDir) // read-only
      val auto = StreamingRelease.releaseAutopilot(spark, lmStore,
        hashDir.toString, scoreDir.toString, foldEvery = 8L,
        keepRecent = 4L, tombPath = Some(tombDir.toString)) _
      val twin = StreamingRelease.releaseIngestBatch(spark, lmStore,
        tHashDir.toString, tScoreDir.toString) _
      def manifest(score: String, tomb: String): Seq[String] =
        StreamingRelease.releaseManifest(spark, score,
          tombPath = Some(tomb)).collect().map(_.toString).toSeq
      (0 until 50).foreach { b =>
        val slice = docs
          .filter(pmod(col("doc_id"), lit(10)) === b % 10)
          .localCheckpoint(true)
        auto(slice, b.toLong)
        twin(slice, b.toLong)
        if (b % 7 == 6) { // periodic takedown of a released slice
          val dead = docs.filter(pmod(col("doc_id"), lit(23)) === b % 23)
            .localCheckpoint(true)
          StreamingRelease.releaseTakedownBatch(spark,
            tombDir.toString)(dead, b.toLong)
          StreamingRelease.releaseTakedownBatch(spark,
            tTombDir.toString)(dead, b.toLong)
        }
        // the fold dial bounds every ledger: foldEvery + keepRecent + 1
        Seq(hashDir, scoreDir, tombDir).foreach { d =>
          assert(batchDirs(d.toString) <= 13,
            s"batch $b: ${d.getFileName} has ${batchDirs(d.toString)}")
        }
        if (b % 10 == 9)
          assert(manifest(scoreDir.toString, tombDir.toString) ===
            manifest(tScoreDir.toString, tTombDir.toString),
            s"batch $b: folded manifest diverged from the twin")
      }
      assert(batchDirs(tScoreDir.toString) === 50) // the twin leaks
      assert(batchDirs(scoreDir.toString) <= 13)   // the autopilot not
      assert(manifest(scoreDir.toString, tombDir.toString) ===
        manifest(tScoreDir.toString, tTombDir.toString))
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("multimodal autopilot 50-batch soak: text/media/ledger stores bounded by the fold dial, manifest == never-folded twin bit-identically throughout") {
    val names = Seq("text", "media", "led", "ttext", "tmedia", "tled")
    val dirs = names.map(n => Files.createTempDirectory(s"graft-map-$n-"))
    val Seq(textDir, mediaDir, ledDir, tText, tMedia, tLed) = dirs
    try {
      val auto = StreamingRelease.multimodalAutopilot(spark,
        textDir.toString, mediaDir.toString, ledDir.toString,
        foldEvery = 8L, keepRecent = 4L) _
      val twin = StreamingRelease.multimodalIngestBatch(spark,
        tText.toString, tMedia.toString, tLed.toString) _
      def mcOf(b: org.apache.spark.sql.DataFrame) =
        b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
      def manifest(led: String): Seq[String] =
        StreamingRelease.multimodalManifest(spark, led)
          .collect().map(_.toString).toSeq
      (0 until 50).foreach { b =>
        val slice = docs
          .filter(pmod(col("doc_id"), lit(10)) === b % 10)
          .localCheckpoint(true)
        val mc = mcOf(slice).localCheckpoint(true)
        auto(slice, mc, b.toLong)
        twin(slice, mc, b.toLong)
        Seq(textDir, mediaDir, ledDir).foreach { d =>
          assert(batchDirs(d.toString) <= 13,
            s"batch $b: ${d.getFileName} has ${batchDirs(d.toString)}")
        }
        if (b % 10 == 9)
          assert(manifest(ledDir.toString) === manifest(tLed.toString),
            s"batch $b: folded multimodal manifest diverged")
      }
      assert(batchDirs(tLed.toString) === 50) // the twin leaks
      assert(batchDirs(ledDir.toString) <= 13)
      assert(manifest(ledDir.toString) === manifest(tLed.toString))
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }
}
