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

  test("takedown: manifest re-releases over survivors; the content cannot re-enter through a re-crawl; replay and no-op takedown behave") {
    withDirs { (lmStore, hashPath, scorePath) =>
      val tombDir = Files.createTempDirectory("graft-rel-tomb-")
      try {
        llm.TextOps.lmSave(docs, lmStore)
        val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
          hashPath, scorePath) _
        ingest(docs, 0L)
        val full = manifestRows(scorePath)
        def served(): Seq[String] =
          StreamingRelease.releaseManifest(spark, scorePath,
            tombPath = Some(tombDir.toString))
            .collect().map(_.toString).toSeq

        // tombstone a slice: the manifest equals the ledger-minus-dead
        // release (tertile boundaries move with the survivors)
        val dead = docs.filter(pmod(col("doc_id"), lit(11)) === 5)
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          dead, 1L)
        val after = served()
        assert(after !== full, "takedown left the manifest unchanged")
        val scoredSurvivors = graft.streaming.StreamingDedup
          .readHashes(spark, scorePath).get.drop("batch")
          .join(dead.select("doc_id"), Seq("doc_id"), "left_anti")
        val reference = llm.TextOps.releaseManifestFrom(
          scoredSurvivors, 8).collect().map(_.toString).toSeq
        assert(after === reference)

        // re-crawl of the SAME text under a new doc_id: the hash
        // ledger recorded the content at original ingest, so the
        // re-crawl is non-novel — the manifest stays at the survivor
        // release (content-level takedown, not id-level)
        ingest(dead.select((col("doc_id") + 1000000L).as("doc_id"),
          col("lang"), col("text")), 2L)
        assert(served() === after,
          "a re-crawled taken-down text re-entered the manifest")

        // takedown replay: identical partition, identical manifest
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          dead, 1L)
        assert(served() === after)

        // tombstoning an id that never reached the ledger is a no-op
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          spark.range(9999999L, 10000000L)
            .select(col("id").as("doc_id")), 3L)
        assert(served() === after)
      } finally ModelStore.deleteRecursively(tombDir)
    }
  }

  test("release diff: diffs the SHIPPED (tertile-gated) memberships — parity with the batch gate per snapshot; an in-window add+takedown cancels to nothing") {
    withDirs { (lmStore, hashPath, scorePath) =>
      val tombDir = Files.createTempDirectory("graft-rel-difftomb-")
      try {
        llm.TextOps.lmSave(docs, lmStore)
        // x: a keeper with a UNIQUE text hash (so batch 1 is novel and
        // keepers without x are exactly keepers-of-docs-minus-x)
        val x = docs.groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("n"), max("doc_id").as("m"))
          .filter(col("n") === 1).agg(max("m")).first().getLong(0)
        val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
          hashPath, scorePath) _
        ingest(docs.filter(col("doc_id") =!= x), 0L)
        ingest(docs.filter(col("doc_id") === x), 1L)
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          docs.filter(col("doc_id") === x), 2L)
        // the batch-composition membership over a survivor subset: the
        // SAME gate the manifest applies, recomputed per snapshot
        val keepers = docs
          .join(llm.Dedup.keepOneIds(docs), Seq("doc_id"))
          .select("doc_id", "lang", "text").localCheckpoint(true)
        def gateOf(sub: org.apache.spark.sql.DataFrame): Set[Long] = {
          val scored = llm.TextOps.lmScoreRowsPersisted(sub, lmStore)
            .join(sub.select(col("doc_id"),
              size(split(trim(col("text")), "\\s+")).as("n_tok")),
              Seq("doc_id"))
          llm.TextOps.releaseKeptIds(scored)
            .collect().map(_.getLong(0)).toSet
        }
        val mNoX = gateOf(keepers.filter(col("doc_id") =!= x))
        val mAll = gateOf(keepers)
        // membership parity: releaseMembers == the gated batch set
        assert(StreamingRelease.releaseMembers(spark, scorePath)
          .collect().map(_.getLong(0)).toSet === mAll)
        assert(StreamingRelease.releaseMembers(spark, scorePath,
          Some(tombDir.toString)).collect().map(_.getLong(0)).toSet
          === mNoX)
        def diff(from: Option[Long], to: Option[Long]) =
          StreamingRelease.releaseDiff(spark, scorePath,
            Some(tombDir.toString), from, to)
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        def expect(from: Set[Long], to: Set[Long]) =
          ((to -- from).toSeq.sorted.map(("added", _)) ++
            (from -- to).toSeq.sorted.map(("removed", _)))
        // window covering add AND takedown of x: both snapshots gate
        // the same survivor set — net change is empty
        assert(diff(Some(0L), None) === Seq.empty)
        // window ending before the takedown: x entered (if gated in)
        // PLUS any boundary churn its arrival caused — exactly the
        // batch gate's two memberships diffed
        assert(diff(Some(0L), Some(1L)) === expect(mNoX, mAll))
        assert(diff(Some(0L), Some(1L))
          .contains(("added", x)) === mAll.contains(x))
        // window starting after the add: the reverse diff
        assert(diff(Some(1L), None) === expect(mAll, mNoX))
      } finally ModelStore.deleteRecursively(tombDir)
    }
  }

  test("named snapshots: a tag pins an as-of manifest, retagging moves it explicitly, unknown tags fail loudly") {
    withDirs { (lmStore, hashPath, scorePath) =>
      val tagDir = Files.createTempDirectory("graft-rel-tags-")
      try {
        llm.TextOps.lmSave(docs, lmStore)
        val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        val sliced = docs.withColumn("__s", ntile(3).over(w))
          .localCheckpoint(true)
        val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
          hashPath, scorePath) _
        (1 to 3).foreach(s =>
          ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L))
        StreamingRelease.tagSnapshot(spark, tagDir.toString, "run-7", 1L)
        val tagged = StreamingRelease.releaseManifestAt(spark,
          scorePath, tagDir.toString, "run-7")
          .collect().map(_.toString).toSeq
        val asof = StreamingRelease.releaseManifest(spark, scorePath,
          asOf = Some(1L)).collect().map(_.toString).toSeq
        assert(tagged === asof)
        // retag: the tag moves explicitly and resolves to the new batch
        StreamingRelease.tagSnapshot(spark, tagDir.toString, "run-7", 2L)
        assert(StreamingRelease.resolveTag(spark, tagDir.toString,
          "run-7") === 2L)
        // the diff between two named snapshots rides the same resolution
        StreamingRelease.tagSnapshot(spark, tagDir.toString, "run-6", 1L)
        val diff = StreamingRelease.releaseDiffBetween(spark, scorePath,
          tagDir.toString, "run-6", "run-7")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val direct = StreamingRelease.releaseDiff(spark, scorePath,
          from = Some(1L), to = Some(2L))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(diff === direct && diff.nonEmpty)
        // a consumer pinning a tag that does not exist must not
        // silently read the present
        val e = intercept[IllegalArgumentException] {
          StreamingRelease.resolveTag(spark, tagDir.toString, "run-99")
        }
        assert(e.getMessage.contains("run-99"))
        // tag names interpolate into the partition path: '/', '=' and
        // '..' are fenced on write AND read (ADVICE r13)
        Seq("a/b", "a=b", "..", "a..b", "").foreach { bad =>
          assert(intercept[IllegalArgumentException] {
            StreamingRelease.tagSnapshot(spark, tagDir.toString, bad, 0L)
          }.getMessage.contains("tag"))
          assert(intercept[IllegalArgumentException] {
            StreamingRelease.resolveTag(spark, tagDir.toString, bad)
          }.getMessage.contains("tag"))
        }
      } finally ModelStore.deleteRecursively(tagDir)
    }
  }

  test("ledger compaction: batch dirs fold into one partition; manifest/members/diff bit-identical; hash dedup intact; as-of at/above the boundary unchanged, below refused") {
    withDirs { (lmStore, hashPath, scorePath) =>
      val tombDir = Files.createTempDirectory("graft-rel-cmp-tomb-")
      try {
        llm.TextOps.lmSave(docs, lmStore)
        val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        val sliced = docs.withColumn("__s", ntile(3).over(w))
          .localCheckpoint(true)
        val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
          hashPath, scorePath) _
        (1 to 3).foreach(s =>
          ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L))
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          docs.filter(pmod(col("doc_id"), lit(11)) === 5), 0L)
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          docs.filter(pmod(col("doc_id"), lit(13)) === 4), 1L)
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          docs.filter(pmod(col("doc_id"), lit(17)) === 3), 3L)
        def snap() = (
          StreamingRelease.releaseManifest(spark, scorePath,
            tombPath = Some(tombDir.toString))
            .collect().map(_.toString).toSeq,
          StreamingRelease.releaseMembers(spark, scorePath,
            Some(tombDir.toString)).orderBy("doc_id")
            .collect().map(_.getLong(0)).toSeq,
          StreamingRelease.releaseDiff(spark, scorePath,
            Some(tombDir.toString), from = Some(1L))
            .collect().map(_.toString).toSeq,
          StreamingRelease.releaseManifest(spark, scorePath,
            tombPath = Some(tombDir.toString), asOf = Some(1L))
            .collect().map(_.toString).toSeq)
        val before = snap()
        def dirsOf(p: String) = new java.io.File(p)
          .listFiles().count(_.getName.startsWith("batch="))
        assert(dirsOf(scorePath) === 3 && dirsOf(tombDir.toString) === 3)
        // fold ≤ 1: score{0,1}→1, hash{0,1}→1, tombs{0,1}→1
        val folded = StreamingRelease.compactReleaseLedgers(spark,
          scorePath, hashPath, 1L, Some(tombDir.toString))
        assert(folded.toSet ===
          Set(scorePath, hashPath, tombDir.toString))
        assert(dirsOf(scorePath) === 2 && dirsOf(hashPath) === 2 &&
          dirsOf(tombDir.toString) === 2,
          "the fold did not reclaim the batch dirs")
        // every read is bit-identical across the fold (as-of 1 == the
        // boundary itself: folded rows land AT it, the cut still sees
        // them)
        assert(snap() === before)
        // the hash ledger still dedups: a re-sent pre-fold doc is
        // non-novel, the score ledger gains nothing
        def ledgerN() = StreamingRelease.releaseMembers(spark,
          scorePath).count()
        val nScore = ledgerN()
        ingest(sliced.filter(col("__s") === 1).drop("__s"), 4L)
        assert(ledgerN() === nScore,
          "a folded hash ledger re-admitted a duplicate")
        // an as-of BELOW the boundary refuses loudly — the folded rows
        // cannot be cut finer than the fold
        assert(intercept[IllegalArgumentException] {
          StreamingRelease.releaseManifest(spark, scorePath,
            tombPath = Some(tombDir.toString), asOf = Some(0L)).collect()
        }.getMessage.contains("fold boundary"))
        assert(intercept[IllegalArgumentException] {
          StreamingRelease.releaseDiff(spark, scorePath,
            Some(tombDir.toString), from = Some(0L)).collect()
        }.getMessage.contains("fold boundary"))
        // a second fold advances the boundary over the merged store
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          docs.filter(pmod(col("doc_id"), lit(19)) === 2), 4L)
        assert(StreamingRelease.compactReleaseLedgers(spark, scorePath,
          hashPath, 2L, Some(tombDir.toString)).nonEmpty)
        assert(StreamingRelease.ledgerFoldBoundary(spark, scorePath)
          === Some(2L))
        assert(StreamingRelease.releaseManifest(spark, scorePath,
          tombPath = Some(tombDir.toString)).collect().nonEmpty)
      } finally ModelStore.deleteRecursively(tombDir)
    }
  }

  test("tag-pinned fold: the boundary floors at the lowest tagged batch, the tagged as-of serve survives the maintenance loop, moving the tag releases the floor") {
    withDirs { (lmStore, hashPath, scorePath) =>
      val tagDir = Files.createTempDirectory("graft-rel-tagpin-")
      try {
        llm.TextOps.lmSave(docs, lmStore)
        val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        val sliced = docs.withColumn("__s", ntile(6).over(w))
          .localCheckpoint(true)
        // pin batch 1 BEFORE any fold — the snapshot a training run
        // reads, which the store's own maintenance must never orphan
        StreamingRelease.tagSnapshot(spark, tagDir.toString,
          "train-1", 1L)
        val body = StreamingRelease.releaseMaintainBatch(spark, lmStore,
          hashPath, scorePath, foldEvery = 2L, keepRecent = 1L,
          tagPath = Some(tagDir.toString)) _
        (0 to 5).foreach(b =>
          body(sliced.filter(col("__s") === b + 1).drop("__s"),
            b.toLong))
        // dials alone would have folded to batch 3; the pin floors the
        // boundary at the tagged batch
        assert(StreamingRelease.ledgerFoldBoundary(spark, scorePath)
          === Some(1L),
          "the fold ignored the tag pin (or never fired)")
        // the tagged serve is NOT refused, and equals the never-folded
        // twin's cut at the same batch
        val atTag = StreamingRelease.releaseManifestAt(spark, scorePath,
          tagDir.toString, "train-1").collect().map(_.toString).toSeq
        val twin = withDirs { (_, h2, s2) =>
          val ingest = StreamingRelease.releaseIngestBatch(spark,
            lmStore, h2, s2) _
          (0 to 5).foreach(b =>
            ingest(sliced.filter(col("__s") === b + 1).drop("__s"),
              b.toLong))
          StreamingRelease.releaseManifest(spark, s2, asOf = Some(1L))
            .collect().map(_.toString).toSeq
        }
        assert(atTag === twin && atTag.nonEmpty)
        // the operator moves the tag forward: the next fold advances
        // past the old pin (pins are resolved at fold time)
        StreamingRelease.tagSnapshot(spark, tagDir.toString,
          "train-1", 5L)
        val full = manifestRows(scorePath)
        assert(StreamingRelease.compactReleaseLedgers(spark, scorePath,
          hashPath, 4L, tagPath = Some(tagDir.toString)).nonEmpty)
        assert(StreamingRelease.ledgerFoldBoundary(spark, scorePath)
          === Some(4L))
        assert(manifestRows(scorePath) === full,
          "the advanced fold changed the manifest")
      } finally ModelStore.deleteRecursively(tagDir)
    }
  }

  test("multimodal maintenance fold: all three stores fold tag-pin floored, manifest bit-identical, both novelty policies intact across the fold, as-of below the boundary refused, tagged serve survives, pre-fold replay non-novel") {
    val names = Seq("text", "media", "ledger", "tag", "t2", "m2", "l2")
    val dirs = names.map(n => Files.createTempDirectory(s"graft-mmf-$n-"))
    val Seq(textDir, mediaDir, ledgerDir, tagDir, t2, m2, l2) = dirs
    try {
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(6).over(w))
        .localCheckpoint(true)
      def mcOf(b: org.apache.spark.sql.DataFrame) =
        b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
      val body = StreamingRelease.multimodalMaintainBatch(spark,
        textDir.toString, mediaDir.toString, ledgerDir.toString,
        foldEvery = 2L, keepRecent = 1L,
        tagPath = Some(tagDir.toString)) _
      def slice(i: Int) = sliced.filter(col("__s") === i + 1).drop("__s")
      (0 to 1).foreach(i => body(slice(i), mcOf(slice(i)), i.toLong))
      StreamingRelease.tagSnapshot(spark, tagDir.toString, "mm-run", 1L)
      (2 to 5).foreach(i => body(slice(i), mcOf(slice(i)), i.toLong))
      // the dial alone would have folded to batch 3 (batch 4's fold);
      // the pin floors every store's boundary at the tagged batch
      Seq(textDir, mediaDir, ledgerDir).foreach { d =>
        assert(StreamingRelease.ledgerFoldBoundary(spark, d.toString)
          === Some(1L), s"boundary of $d ignored the tag pin")
      }
      // never-folded twin over the same slices
      (0 to 5).foreach(i =>
        StreamingRelease.multimodalIngestBatch(spark, t2.toString,
          m2.toString, l2.toString)(slice(i), mcOf(slice(i)), i.toLong))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).toSeq
      assert(rows(StreamingRelease.multimodalManifest(spark,
        ledgerDir.toString)) ===
        rows(StreamingRelease.multimodalManifest(spark, l2.toString)))
      // the tagged serve is not refused and equals the twin's cut
      assert(rows(StreamingRelease.multimodalManifestAt(spark,
        ledgerDir.toString, tagDir.toString, "mm-run")) ===
        rows(StreamingRelease.multimodalManifest(spark, l2.toString,
          asOf = Some(1L))))
      // an as-of below the boundary refuses loudly
      assert(intercept[IllegalArgumentException] {
        StreamingRelease.multimodalManifest(spark, ledgerDir.toString,
          asOf = Some(0L)).collect()
      }.getMessage.contains("fold boundary"))
      // a pre-fold slice replayed late is non-novel under BOTH
      // policies: every text hash and media fingerprint is in the
      // folded sets, so the ledger gains nothing
      body(slice(0), mcOf(slice(0)), 6L)
      assert(rows(StreamingRelease.multimodalManifest(spark,
        ledgerDir.toString)) ===
        rows(StreamingRelease.multimodalManifest(spark, l2.toString)),
        "a folded fingerprint store re-admitted a duplicate")
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("release maintenance loop: the fold fires at the dial (not below), manifest unchanged, recent batches stay replayable") {
    withDirs { (lmStore, hashPath, scorePath) =>
      llm.TextOps.lmSave(docs, lmStore)
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(6).over(w))
        .localCheckpoint(true)
      val body = StreamingRelease.releaseMaintainBatch(spark, lmStore,
        hashPath, scorePath, foldEvery = 4L, keepRecent = 2L) _
      def dirsOf(p: String) = new java.io.File(p)
        .listFiles().count(_.getName.startsWith("batch="))
      (0 to 3).foreach(b =>
        body(sliced.filter(col("__s") === b + 1).drop("__s"), b.toLong))
      // batch 3 < foldEvery boundary was batch... the dial fires at
      // batchId % 4 == 0, i.e. NOT on batches 1-3
      assert(dirsOf(scorePath) === 4, "the fold fired below the dial")
      val before = manifestRows(scorePath)
      body(sliced.filter(col("__s") === 5).drop("__s"), 4L)
      // batch 4: folds up to 4 − 2 = 2 → dirs {0,1,2} merge into 2
      assert(dirsOf(scorePath) === 3,
        "the fold did not fire at the dial")
      assert(StreamingRelease.ledgerFoldBoundary(spark, scorePath)
        === Some(2L))
      body(sliced.filter(col("__s") === 6).drop("__s"), 5L)
      val after = manifestRows(scorePath)
      // manifest == the never-folding twin over the same six batches
      val twin = withDirs { (lm2, h2, s2) =>
        // fresh dirs, same frozen LM store semantics: reuse lmStore
        val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
          h2, s2) _
        (0 to 5).foreach(b =>
          ingest(sliced.filter(col("__s") === b + 1).drop("__s"),
            b.toLong))
        manifestRows(s2)
      }
      assert(after === twin, "the fold changed the manifest")
      assert(before.nonEmpty && after.nonEmpty)
      // a batch inside the keepRecent window replays onto its own
      // intact partition — bit-identical manifest
      body(sliced.filter(col("__s") === 5).drop("__s"), 4L)
      assert(manifestRows(scorePath) === after)
    }
  }

  test("multimodal ledger compaction: manifest bit-identical across the fold; as-of guard applies") {
    val textDir = Files.createTempDirectory("graft-mmc-text-")
    val mediaDir = Files.createTempDirectory("graft-mmc-media-")
    val ledgerDir = Files.createTempDirectory("graft-mmc-ledger-")
    try {
      def mcOf(b: org.apache.spark.sql.DataFrame) =
        b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(3).over(w))
        .localCheckpoint(true)
      (1 to 3).foreach { s =>
        val b = sliced.filter(col("__s") === s).drop("__s")
        StreamingRelease.multimodalIngestBatch(spark, textDir.toString,
          mediaDir.toString, ledgerDir.toString)(b, mcOf(b), s - 1L)
      }
      val before = StreamingRelease.multimodalManifest(spark,
        ledgerDir.toString).collect().map(_.toString).toSeq
      // the same one-store fold body serves the multimodal stores
      Seq(textDir, mediaDir, ledgerDir).foreach { d =>
        assert(StreamingRelease.compactLedgerStore(spark, d.toString, 1L))
      }
      assert(StreamingRelease.multimodalManifest(spark,
        ledgerDir.toString).collect().map(_.toString).toSeq === before)
      // as-of AT the boundary still serves (folded rows land at it)
      assert(StreamingRelease.multimodalManifest(spark,
        ledgerDir.toString, asOf = Some(1L)).collect().nonEmpty)
      assert(intercept[IllegalArgumentException] {
        StreamingRelease.multimodalManifest(spark, ledgerDir.toString,
          asOf = Some(0L)).collect()
      }.getMessage.contains("fold boundary"))
    } finally Seq(textDir, mediaDir, ledgerDir)
      .foreach(ModelStore.deleteRecursively)
  }

  test("multimodal takedown: manifest drops dead docs; removed media cannot re-enter by re-upload") {
    val textDir = Files.createTempDirectory("graft-mmtd-text-")
    val mediaDir = Files.createTempDirectory("graft-mmtd-media-")
    val ledgerDir = Files.createTempDirectory("graft-mmtd-ledger-")
    val tombDir = Files.createTempDirectory("graft-mmtd-tomb-")
    try {
      def mcOf(b: org.apache.spark.sql.DataFrame) =
        b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
      StreamingRelease.multimodalIngestBatch(spark, textDir.toString,
        mediaDir.toString, ledgerDir.toString)(docs, mcOf(docs), 0L)
      val full = StreamingRelease.multimodalManifest(spark,
        ledgerDir.toString).collect().map(_.toString).toSeq
      def served(): Seq[String] =
        StreamingRelease.multimodalManifest(spark, ledgerDir.toString,
          tombPath = Some(tombDir.toString))
          .collect().map(_.toString).toSeq
      // takedown an even (media-bearing) doc that survived
      val victim = spark.read.parquet(s"$ledgerDir/batch=0")
        .filter(col("doc_id") % 2 === 0)
        .agg(min("doc_id")).first().getLong(0)
      StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
        docs.filter(col("doc_id") === victim), 1L)
      val after = served()
      assert(after !== full, "takedown left the media manifest unchanged")
      // re-upload: same text AND same media payload under a new doc_id
      // — both fingerprint stores remember the content, so the ledger
      // gains nothing and the manifest stays at the survivor accounting
      val re = docs.filter(col("doc_id") === victim)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          col("text"))
      StreamingRelease.multimodalIngestBatch(spark, textDir.toString,
        mediaDir.toString, ledgerDir.toString)(re,
        mcOf(docs.filter(col("doc_id") === victim))
          .select((col("doc_id") + 1000000L).as("doc_id"),
            col("cluster_id")), 2L)
      assert(served() === after,
        "re-uploaded taken-down media re-entered the manifest")
    } finally Seq(textDir, mediaDir, ledgerDir, tombDir)
      .foreach(ModelStore.deleteRecursively)
  }

  test("as-of manifest equals the release before the later batch; takedowns time-travel") {
    withDirs { (lmStore, hashPath, scorePath) =>
      val tombDir = Files.createTempDirectory("graft-rel-asoftomb-")
      try {
        llm.TextOps.lmSave(docs, lmStore)
        val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        val sliced = docs.withColumn("__s", ntile(3).over(w))
          .localCheckpoint(true)
        val ingest = StreamingRelease.releaseIngestBatch(spark, lmStore,
          hashPath, scorePath) _
        (1 to 3).foreach(s =>
          ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L))
        val asof1 = StreamingRelease.releaseManifest(spark, scorePath,
          asOf = Some(1L)).collect().map(_.toString).toSeq
        // == a parallel run that only ever ingested batches 0–1 (same
        // frozen LM, fresh ledgers)
        val hash2 = Files.createTempDirectory("graft-rel-asofh2-")
        val score2 = Files.createTempDirectory("graft-rel-asofs2-")
        try {
          val ingest2 = StreamingRelease.releaseIngestBatch(spark,
            lmStore, hash2.toString, score2.toString) _
          (1 to 2).foreach(s =>
            ingest2(sliced.filter(col("__s") === s).drop("__s"), s - 1L))
          assert(manifestRows(score2.toString) === asof1)
        } finally Seq(hash2, score2).foreach(ModelStore.deleteRecursively)
        // takedowns time-travel: tombstone a slice at batch 3 — the
        // as-of read BEFORE the takedown still ships the full manifest
        val full = manifestRows(scorePath)
        StreamingRelease.releaseTakedownBatch(spark, tombDir.toString)(
          docs.filter(pmod(col("doc_id"), lit(11)) === 5), 3L)
        val preTakedown = StreamingRelease.releaseManifest(spark,
          scorePath, tombPath = Some(tombDir.toString), asOf = Some(2L))
          .collect().map(_.toString).toSeq
        assert(preTakedown === full)
        val now = StreamingRelease.releaseManifest(spark, scorePath,
          tombPath = Some(tombDir.toString))
          .collect().map(_.toString).toSeq
        assert(now !== full)
      } finally ModelStore.deleteRecursively(tombDir)
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

  test("release quality gate: stationary batch quiet, degraded batch fires, monitor replay idempotent") {
    // LM trains on one slice, the xent reference snapshots a DISJOINT
    // calibration slice (the quantizer-drift calibration lesson:
    // in-sample scores are systematically low), a third disjoint slice
    // plays the honest future ingest and a scrambled copy of it plays
    // the spam wave (unseen words -> every bigram at the ln V ceiling)
    val train = docs.filter(col("doc_id") % 3 === 0)
    val calib = docs.filter(col("doc_id") % 3 === 1)
    val honest = docs.filter(col("doc_id") % 3 === 2)
    val degraded = honest.select(col("doc_id") + lit(5000000L) as "doc_id",
      col("lang"), regexp_replace(col("text"), "[a-zA-Z]", "z").as("text"))
    val dirs = Seq("graft-qg-lm-", "graft-qg-drift-", "graft-qg-hash-",
      "graft-qg-score-", "graft-qg-mon-").map(Files.createTempDirectory(_))
    try {
      val Seq(lmDir, driftDir, hashDir, scoreDir, monDir) = dirs
      val lmStore = new ModelStore(spark, lmDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      llm.TextOps.lmSave(train, lmStore)
      graft.streaming.StreamingRelease
        .saveXentReference(calib, lmStore, driftStore)
      val ingest = graft.streaming.StreamingRelease
        .releaseIngestWithQualityBatch(spark, lmStore, driftStore,
          hashDir.toString, scoreDir.toString, monDir.toString) _
      ingest(honest, 0L)
      ingest(degraded, 1L)
      def mon = spark.read.parquet(monDir.toString)
        .select("batch", "n_cur", "psi", "shifted").collect()
        .map(r => r.getInt(0) ->
          ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
      val m1 = mon
      assert(!m1(0)._3, s"honest ingest tripped the quality gate: $m1")
      assert(m1(1)._3, s"degraded ingest stayed quiet: $m1")
      assert(m1(0)._1 > 0 && m1(1)._1 > 0)
      // the standalone gate agrees with the composed monitor row
      val solo = graft.streaming.StreamingRelease
        .releaseQualityGate(lmStore, driftStore, degraded)
        .collect().head
      assert(solo.getBoolean(2), solo.toString)
      // replay of the degraded batch rewrites the identical row
      ingest(degraded, 1L)
      assert(mon === m1)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("quarantine arm: shifted batch held out of the manifest; replay, floor, and admit all behave") {
    // VERDICT r11 #3: the observe-only gate now ACTS — a shifted
    // batch's scored rows route to the quarantine the manifest never
    // reads, the way the ANN loop consumes its own drift row
    val train = docs.filter(col("doc_id") % 3 === 0)
    val calib = docs.filter(col("doc_id") % 3 === 1)
    val honest = docs.filter(col("doc_id") % 3 === 2)
    val degraded = honest.select(col("doc_id") + lit(5000000L) as "doc_id",
      col("lang"), regexp_replace(col("text"), "[a-zA-Z]", "z").as("text"))
    val dirs = Seq("graft-qa-lm-", "graft-qa-drift-", "graft-qa-hash-",
      "graft-qa-score-", "graft-qa-quar-", "graft-qa-mon-")
      .map(Files.createTempDirectory(_))
    try {
      val Seq(lmDir, driftDir, hashDir, scoreDir, quarDir, monDir) = dirs
      val lmStore = new ModelStore(spark, lmDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      llm.TextOps.lmSave(train, lmStore)
      StreamingRelease.saveXentReference(calib, lmStore, driftStore)
      val ingest = StreamingRelease.releaseIngestWithQuarantineBatch(
        spark, lmStore, driftStore, hashDir.toString, scoreDir.toString,
        quarDir.toString, monDir.toString) _
      ingest(honest, 0L) // clean: flows into the ledger
      val honestManifest = manifestRows(scoreDir.toString)
      assert(honestManifest.nonEmpty)
      ingest(degraded, 1L) // shifted: held
      assert(manifestRows(scoreDir.toString) === honestManifest,
        "quarantined docs leaked into the manifest")
      assert(!Files.exists(scoreDir.resolve("batch=1")),
        "shifted batch wrote a score-ledger partition")
      val held = spark.read.parquet(s"$quarDir/batch=1")
        .collect().map(_.toString).sorted.toSeq
      assert(held.nonEmpty)
      // monitor recorded both verdicts
      val mon = spark.read.parquet(monDir.toString)
        .select("batch", "shifted").collect()
        .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      assert(mon === Map(0 -> false, 1 -> true), mon)
      // replay of the shifted batch: same quarantine rows, manifest
      // still clean
      ingest(degraded, 1L)
      assert(spark.read.parquet(s"$quarDir/batch=1")
        .collect().map(_.toString).sorted.toSeq === held)
      assert(manifestRows(scoreDir.toString) === honestManifest)
      // floor: a drifted-but-tiny batch is admitted (observe-only) —
      // PSI over a handful of rows is noise, and holding it releases
      // nothing anyway
      val tiny = degraded.limit(8).select(
        (col("doc_id") + lit(1000L)).as("doc_id"), col("lang"),
        col("text"))
      ingest(tiny, 2L)
      assert(Files.exists(scoreDir.resolve("batch=2")),
        "sub-floor batch was quarantined instead of admitted")
      // operator clears the quarantine: the held rows enter the ledger
      // and the manifest equals the direct-admission composition of the
      // same batches — admission is deterministic, not a re-score
      StreamingRelease.admitQuarantined(spark, quarDir.toString,
        scoreDir.toString, 1L)
      val admitted = manifestRows(scoreDir.toString)
      val direct = {
        val d2 = Seq("graft-qa2-hash-", "graft-qa2-score-")
          .map(Files.createTempDirectory(_))
        try {
          val in2 = StreamingRelease.releaseIngestBatch(spark, lmStore,
            d2(0).toString, d2(1).toString) _
          in2(honest, 0L); in2(degraded, 1L); in2(tiny, 2L)
          manifestRows(d2(1).toString)
        } finally d2.foreach(ModelStore.deleteRecursively)
      }
      assert(admitted === direct)
      // admit replay idempotent; ingest replay after admit leaves the
      // admitted rows in place (the state machine moves forward only)
      StreamingRelease.admitQuarantined(spark, quarDir.toString,
        scoreDir.toString, 1L)
      assert(manifestRows(scoreDir.toString) === admitted)
      ingest(degraded, 1L)
      assert(manifestRows(scoreDir.toString) === admitted)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("per-language gate: a single-language scramble fires only that language; quarantine holds only its docs; admit restores parity") {
    // VERDICT r12 #4: the pooled gate can be diluted by the clean
    // majority (or masked by a mix shift) — the per-language gate
    // scores each language against ITS reference, and the composed
    // ingest quarantines only the shifted language's docs
    val train = docs.filter(col("doc_id") % 3 === 0)
    val calib = docs.filter(col("doc_id") % 3 === 1)
    val honest = docs.filter(col("doc_id") % 3 === 2)
    // scramble ONLY lang='de' texts: unseen bigrams pin every de doc at
    // the ln V ceiling; every other language stays exchangeable with
    // its calibration slice
    val mixed = honest.select(col("doc_id"), col("lang"),
      when(col("lang") === "de",
        regexp_replace(col("text"), "[a-zA-Z]", "z"))
        .otherwise(col("text")).as("text")).localCheckpoint(true)
    val dirs = Seq("graft-lq-lm-", "graft-lq-drift-", "graft-lq-hash-",
      "graft-lq-score-", "graft-lq-quar-", "graft-lq-mon-")
      .map(Files.createTempDirectory(_))
    try {
      val Seq(lmDir, driftDir, hashDir, scoreDir, quarDir, monDir) = dirs
      val lmStore = new ModelStore(spark, lmDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      llm.TextOps.lmSave(train, lmStore)
      // per-language groups are small at this SF (~25 docs/lang): a
      // 10-bucket histogram is noise-dominated (~2.5 docs/bucket — the
      // clean languages PSI'd 0.26-0.37 on exchangeable data), so the
      // reference uses 4 buckets, the floor follows the ~5-per-bucket
      // rule the ANN gate documents (minGateN = 5·buckets), and the
      // threshold sits at 0.3: with ~6 docs/bucket the exchangeable
      // languages PSI up to ~0.22 on pure sampling noise, while the
      // scrambled language scores 1.8 — an order of magnitude of
      // separation for the dial to land in
      StreamingRelease.saveXentReferenceByLang(calib, lmStore,
        driftStore, buckets = 4)
      val ingest = StreamingRelease.releaseIngestWithLangQuarantineBatch(
        spark, lmStore, driftStore, hashDir.toString, scoreDir.toString,
        quarDir.toString, monDir.toString, threshold = 0.3,
        buckets = 4, minGateN = 20L) _
      ingest(mixed, 0L)
      // one gate row per language; ONLY de fired
      val gate = spark.read.parquet(s"$monDir/batch=0")
        .select("lang", "n_cur", "psi", "shifted").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
      assert(gate.keySet === Set("en", "fr", "es", "zh", "de"), gate)
      assert(gate("de")._3, s"scrambled de stayed quiet: $gate")
      gate.filterNot(_._1 == "de").foreach { case (l, g) =>
        assert(!g._3, s"clean language $l fired: $gate")
      }
      assert(gate("de")._1 >= 20L, gate)
      // quarantine holds EXACTLY the de docs; the ledger the rest
      val heldLangs = spark.read.parquet(s"$quarDir/batch=0")
        .select("lang").distinct().collect().map(_.getString(0)).toSeq
      assert(heldLangs === Seq("de"), heldLangs)
      val ledgerLangs = spark.read.parquet(s"$scoreDir/batch=0")
        .select("lang").distinct().collect().map(_.getString(0)).toSet
      assert(ledgerLangs === Set("en", "fr", "es", "zh"), ledgerLangs)
      // manifest == direct ingest of the batch WITHOUT its de docs
      val withoutDe = manifestRows(scoreDir.toString)
      val directNoDe = {
        val d2 = Seq("graft-lq2-hash-", "graft-lq2-score-")
          .map(Files.createTempDirectory(_))
        try {
          StreamingRelease.releaseIngestBatch(spark, lmStore,
            d2(0).toString, d2(1).toString)(
            mixed.filter(col("lang") =!= "de"), 0L)
          manifestRows(d2(1).toString)
        } finally d2.foreach(ModelStore.deleteRecursively)
      }
      assert(withoutDe === directNoDe)
      // replay rewrites the same partitions — verdicts deterministic
      val heldRows = spark.read.parquet(s"$quarDir/batch=0")
        .collect().map(_.toString).sorted.toSeq
      ingest(mixed, 0L)
      assert(spark.read.parquet(s"$quarDir/batch=0")
        .collect().map(_.toString).sorted.toSeq === heldRows)
      assert(manifestRows(scoreDir.toString) === withoutDe)
      // operator clears de: MERGE admission restores the full-batch
      // composition (admitQuarantined would clobber the admitted rows)
      StreamingRelease.admitQuarantinedMerge(spark, quarDir.toString,
        scoreDir.toString, 0L)
      val admitted = manifestRows(scoreDir.toString)
      val directAll = {
        val d3 = Seq("graft-lq3-hash-", "graft-lq3-score-")
          .map(Files.createTempDirectory(_))
        try {
          StreamingRelease.releaseIngestBatch(spark, lmStore,
            d3(0).toString, d3(1).toString)(mixed, 0L)
          manifestRows(d3(1).toString)
        } finally d3.foreach(ModelStore.deleteRecursively)
      }
      assert(admitted === directAll)
      // merge-admit replay idempotent
      StreamingRelease.admitQuarantinedMerge(spark, quarDir.toString,
        scoreDir.toString, 0L)
      assert(manifestRows(scoreDir.toString) === admitted)
      // standalone grouped gate agrees with the composed monitor rows
      val solo = StreamingRelease.releaseQualityGateByLang(lmStore,
        driftStore, mixed, threshold = 0.3, buckets = 4).collect()
        .map(r => r.getString(0) -> r.getBoolean(3)).toMap
      assert(solo("de") && solo.filterNot(_._1 == "de").values
        .forall(!_), solo)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("unknown-language signal: a reference-absent language gets a count-only row (psi/shifted NULL), is admitted, and never perturbs the known-language rows") {
    // VERDICT r13 #6: a spam wave in a NEW language is exactly the
    // batch the pooled gate dilutes — the monitor must show the flood
    // even when it cannot score it
    val train = docs.filter(col("doc_id") % 3 === 0)
    // calibrate WITHOUT zh: zh becomes the reference-absent language
    val calib = docs.filter(col("doc_id") % 3 === 1 &&
      col("lang") =!= "zh")
    val batch = docs.filter(col("doc_id") % 3 === 2)
    val dirs = Seq("graft-ul-lm-", "graft-ul-drift-", "graft-ul-hash-",
      "graft-ul-score-", "graft-ul-quar-", "graft-ul-mon-")
      .map(Files.createTempDirectory(_))
    try {
      val Seq(lmDir, driftDir, hashDir, scoreDir, quarDir, monDir) = dirs
      val lmStore = new ModelStore(spark, lmDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      llm.TextOps.lmSave(train, lmStore)
      StreamingRelease.saveXentReferenceByLang(calib, lmStore,
        driftStore, buckets = 4)
      // the standalone grouped gate: zh gets the count-only row
      val gate = StreamingRelease.releaseQualityGateByLang(lmStore,
        driftStore, batch, threshold = 0.3, buckets = 4).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.isNullAt(2), r.isNullAt(3)))).toMap
      assert(gate.keySet === Set("en", "fr", "es", "zh", "de"), gate)
      assert(gate("zh")._1 > 0L && gate("zh")._2 && gate("zh")._3,
        s"reference-absent zh did not get the count-only row: $gate")
      gate.filterNot(_._1 == "zh").foreach { case (l, g) =>
        assert(!g._2 && !g._3, s"known language $l lost its score: $gate")
      }
      // known-language rows are bit-unchanged by zh's presence (the
      // gate is per-language independent)
      val noZh = StreamingRelease.releaseQualityGateByLang(lmStore,
        driftStore, batch.filter(col("lang") =!= "zh"),
        threshold = 0.3, buckets = 4).collect()
        .map(_.toString).toSet
      val withZhKnown = StreamingRelease.releaseQualityGateByLang(
        lmStore, driftStore, batch, threshold = 0.3, buckets = 4)
        .filter(col("lang") =!= "zh").collect().map(_.toString).toSet
      assert(withZhKnown === noZh)
      // the composed quarantining ingest ADMITS the unscorable
      // language (null shifted never routes to quarantine) and its
      // monitor row records the signal
      val ingest = StreamingRelease.releaseIngestWithLangQuarantineBatch(
        spark, lmStore, driftStore, hashDir.toString, scoreDir.toString,
        quarDir.toString, monDir.toString, threshold = 0.3,
        buckets = 4, minGateN = 1L) _
      ingest(batch, 0L)
      val mon = spark.read.parquet(s"$monDir/batch=0")
        .filter(col("lang") === "zh").collect()
      assert(mon.length === 1 && mon.head.isNullAt(2) &&
        mon.head.getLong(1) > 0L)
      assert(spark.read.parquet(s"$scoreDir/batch=0")
        .filter(col("lang") === "zh").count() > 0L,
        "the unscorable language was not admitted")
      assert(spark.read.parquet(s"$quarDir/batch=0")
        .filter(col("lang") === "zh").isEmpty)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("gate buckets thread through: a non-default reference width gates consistently (advice r11)") {
    // a reference saved at buckets=7 must be PSI'd against 7-bucket
    // current counts — the composed ingest once hard-coded 10, skewing
    // the statistic against any non-default reference
    val train = docs.filter(col("doc_id") % 3 === 0)
    val calib = docs.filter(col("doc_id") % 3 === 1)
    val honest = docs.filter(col("doc_id") % 3 === 2)
    val dirs = Seq("graft-qb-lm-", "graft-qb-drift-", "graft-qb-hash-",
      "graft-qb-score-", "graft-qb-mon-").map(Files.createTempDirectory(_))
    try {
      val Seq(lmDir, driftDir, hashDir, scoreDir, monDir) = dirs
      val lmStore = new ModelStore(spark, lmDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      llm.TextOps.lmSave(train, lmStore)
      StreamingRelease.saveXentReference(calib, lmStore, driftStore,
        buckets = 7)
      StreamingRelease.releaseIngestWithQualityBatch(spark, lmStore,
        driftStore, hashDir.toString, scoreDir.toString,
        monDir.toString, buckets = 7)(honest, 0L)
      val composed = spark.read.parquet(s"$monDir/batch=0")
        .collect().map(_.toString).toSeq
      assert(composed.length === 1)
      assert(!composed.head.contains("true"),
        s"honest ingest tripped the 7-bucket gate: $composed")
      // the composed row equals the standalone gate at the same width
      // (first batch: every doc is novel, so the populations coincide)
      val solo = StreamingRelease.releaseQualityGate(lmStore, driftStore,
        honest, buckets = 7).collect().map(_.toString).toSeq
      assert(composed === solo)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("incremental multimodal release: cross-batch media dup drops, replay idempotent, batch parity") {
    val s = spark; import s.implicits._
    def fp = sha2(substring(col("text"), 1, 16).cast("binary"), 256)
    def mcOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), fp.as("cluster_id"))
    // batch 1's doc 6 re-posts doc 2's media (same 16-char prefix ⇒
    // same fingerprint) under NOVEL text — only the media policy can
    // drop it; doc 7 has no media but duplicates doc 4's text — only
    // the text policy can drop it
    val b0 = Seq(
      (2L, "en", "shared media prefix AAAA original tail"),
      (3L, "en", "text only survivor one"),
      (4L, "de", "a german document body")).toDF("doc_id", "lang", "text")
    val b1 = Seq(
      (6L, "en", "shared media prefix AAAA different tail entirely"),
      (7L, "de", "a german document body"),
      (8L, "en", "a fresh image doc with its own pixels"))
      .toDF("doc_id", "lang", "text")
    val all = b0.unionByName(b1)
    val dirs = Seq("graft-mmt-", "graft-mmm-", "graft-mml-")
      .map(Files.createTempDirectory(_))
    try {
      val Seq(t, m, l) = dirs.map(_.toString)
      val ingest = graft.streaming.StreamingRelease
        .multimodalIngestBatch(spark, t, m, l) _
      ingest(b0, mcOf(b0), 0L)
      ingest(b1, mcOf(b1), 1L)
      val streamed = graft.streaming.StreamingRelease
        .multimodalManifest(spark, l).collect().map(_.toString).toSeq
      // == the batch composition over the union with the same clusters
      val batch = llm.Multimodal.multimodalRelease(all, mcOf(all))
        .collect().map(_.toString).toSeq
      assert(streamed === batch)
      // the planted drops really happened: survivors are 2, 3, 4, 8
      val ledgerIds = spark.read.option("basePath", l)
        .parquet(s"$l/batch=0", s"$l/batch=1")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ledgerIds === Set(2L, 3L, 4L, 8L), ledgerIds)
      // replay of batch 1: identical partitions, identical manifest
      ingest(b1, mcOf(b1), 1L)
      assert(graft.streaming.StreamingRelease
        .multimodalManifest(spark, l).collect().map(_.toString).toSeq
        === streamed)
    } finally dirs.foreach(ModelStore.deleteRecursively)
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

  test("quarantine MemoryStream wiring: a degraded microbatch is held, the honest one flows") {
    val s = spark; import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = docs.filter(col("doc_id") % 3 === 0)
    val calib = docs.filter(col("doc_id") % 3 === 1)
    val honest = docs.filter(col("doc_id") % 3 === 2)
    val degraded = honest.select(col("doc_id") + lit(5000000L) as "doc_id",
      col("lang"), regexp_replace(col("text"), "[a-zA-Z]", "z").as("text"))
    val dirs = Seq("graft-qw-lm-", "graft-qw-drift-", "graft-qw-hash-",
      "graft-qw-score-", "graft-qw-quar-", "graft-qw-mon-",
      "graft-qw-ck-").map(Files.createTempDirectory(_))
    try {
      val Seq(lmDir, driftDir, hashDir, scoreDir, quarDir, monDir, ck) =
        dirs
      val lmStore = new ModelStore(spark, lmDir.toString)
      val driftStore = new ModelStore(spark, driftDir.toString)
      llm.TextOps.lmSave(train, lmStore)
      StreamingRelease.saveXentReference(calib, lmStore, driftStore)
      val hv = honest.as[(Long, String, String)].collect().toSeq
      val dv = degraded.as[(Long, String, String)].collect().toSeq
      val input = MemoryStream[(Long, String, String)]
      val q = StreamingRelease.incrementalReleaseWithQuarantine(
        input.toDF().toDF("doc_id", "lang", "text"), lmStore, driftStore,
        hashDir.toString, scoreDir.toString, quarDir.toString,
        monDir.toString, ck.toString).start()
      try {
        input.addData(hv: _*); q.processAllAvailable()
        input.addData(dv: _*); q.processAllAvailable()
      } finally q.stop()
      // honest batch released; degraded batch held in the quarantine
      assert(Files.exists(scoreDir.resolve("batch=0")))
      assert(!Files.exists(scoreDir.resolve("batch=1")))
      assert(Files.exists(quarDir.resolve("batch=1")))
      assert(manifestRows(scoreDir.toString).nonEmpty)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }

  test("multimodal MemoryStream wiring: the writeStream wrapper serves the same manifest as direct ingest") {
    // VERDICT r11 #7: the corpus release had a writeStream wrapper but
    // the multimodal twin exposed only the foreachBatch body
    val s = spark; import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def mcOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"),
          sha2(substring(col("text"), 1, 16).cast("binary"), 256)
            .as("cluster_id"))
    val n = docs.count()
    val cut = n / 2
    val rows = docs.as[(Long, String, String)].collect().sortBy(_._1)
    val (r1, r2) = rows.partition(_._1 < cut)
    val dirs = Seq("graft-mmw-t-", "graft-mmw-m-", "graft-mmw-l-",
      "graft-mmw-ck-").map(Files.createTempDirectory(_))
    try {
      val Seq(t, m, l, ck) = dirs.map(_.toString)
      val input = MemoryStream[(Long, String, String)]
      val q = StreamingRelease.incrementalMultimodalRelease(
        input.toDF().toDF("doc_id", "lang", "text"), mcOf, t, m, l, ck)
        .start()
      try {
        input.addData(r1.toSeq: _*); q.processAllAvailable()
        input.addData(r2.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = StreamingRelease.multimodalManifest(spark, l)
        .collect().map(_.toString).toSeq
      assert(streamed.nonEmpty)
      val d2 = Seq("graft-mmw2-t-", "graft-mmw2-m-", "graft-mmw2-l-")
        .map(Files.createTempDirectory(_))
      try {
        val Seq(t2, m2, l2) = d2.map(_.toString)
        val ingest = StreamingRelease
          .multimodalIngestBatch(spark, t2, m2, l2) _
        val b0 = docs.filter(col("doc_id") < cut)
        val b1 = docs.filter(col("doc_id") >= cut)
        ingest(b0, mcOf(b0), 0L)
        ingest(b1, mcOf(b1), 1L)
        assert(StreamingRelease.multimodalManifest(spark, l2)
          .collect().map(_.toString).toSeq === streamed)
      } finally d2.foreach(ModelStore.deleteRecursively)
    } finally dirs.foreach(ModelStore.deleteRecursively)
  }
}
