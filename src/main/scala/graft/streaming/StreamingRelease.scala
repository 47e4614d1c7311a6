package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.llm.TextOps
import graft.store.ModelStore

/** Incremental CORPUS RELEASE (VERDICT r9 #4 / r10 #3): the streaming
  * twin of [[graft.llm.TextOps.corpusRelease]] — the reference's whole
  * point is that the serving artifact stays fresh as records trickle in
  * (its job 4 continuously maintains the denormalized store,
  * `/root/reference/scripts/synchronize_elastic_job.py:80-113`) rather
  * than being recomputed wholesale; this is that shape for the release
  * manifest a training-data pipeline ships.
  *
  * The batch composition has three stages with very different
  * incremental character:
  *
  *   1. exact-dedup keep-one  — per-increment: a hash-novelty anti-join
  *      against the hash store ([[StreamingDedup]]'s contract);
  *   2. LM scoring            — per-increment: POINTWISE under a frozen
  *      persisted model (a doc's xent depends only on its own bigrams +
  *      the model), so scoring increments separately IS scoring the
  *      union — the [[StreamingAnn]] frozen-quantizer argument applied
  *      to the quality gate;
  *   3. tertile gate + shard ledger — per-RELEASE: the per-language
  *      perplexity tertile and the token-balanced shard deal are GLOBAL
  *      ranks over the survivor set, so they are deliberately NOT
  *      maintained per increment. The ingest stores one narrow scored
  *      row per novel doc; [[releaseManifest]] aggregates the score
  *      ledger — never re-reading raw text — through the SAME manifest
  *      body the batch composition uses
  *      ([[graft.llm.TextOps.releaseManifestFrom]]).
  *
  * At 100 TB: each increment pays one hash anti-join (partition-pruned
  * narrow scan) + the broadcast-model scoring of its own rows; the
  * release-time aggregation reads |survivors| rows of five narrow
  * columns — the 4 KB/doc text never travels again. The per-language
  * ntile is the manifest's one global sort, bounded by the largest
  * language (swap for approx quantile cut points at production scale —
  * the [[graft.llm.TextOps.ccnetBuckets]] note applies verbatim).
  *
  * DETERMINISM / PARITY: the keep-one policy is "min doc_id per text
  * hash". Incrementally the store keeps the FIRST batch's candidate per
  * hash (strictly-earlier batches win; within a batch, min doc_id), so
  * parity with the batch rule needs the [[StreamingCuration]]
  * convention — batches partition the corpus in ascending doc_id order —
  * which StreamingReleaseSpec pins: the ledger-served manifest equals
  * the batch [[graft.llm.TextOps.corpusRelease]] over the union,
  * microbatch boundaries invisible, replay idempotent.
  */
object StreamingRelease {

  /** The idempotent foreachBatch body. `batch` needs (doc_id, lang,
    * text); `lmStore` is the frozen persisted bigram LM
    * ([[graft.llm.TextOps.lmSave]]). Writes per batch:
    *   - `hashPath/batch=N`: the novel text hashes (set semantics —
    *     [[StreamingDedup.compactStore]]-safe);
    *   - `scorePath/batch=N`: (doc_id, lang, n_bigrams, xent, n_tok),
    *     one row per novel hash's keeper doc.
    * Both overwrite their own partition and read strictly-earlier
    * batches only — the [[StreamingDedup.dedupBatch]] replay contract,
    * so a re-delivered batch rewrites identical rows. */
  def releaseIngestBatch(spark: SparkSession, lmStore: ModelStore,
      hashPath: String, scorePath: String, trainLang: String = "en")(
      batch: DataFrame, batchId: Long): Unit =
    ingestNovelScored(spark, lmStore, hashPath, trainLang)(batch, batchId)
      .write.mode("overwrite").parquet(s"$scorePath/batch=$batchId")

  /** The shared ingest body: record the batch's novel text hashes and
    * return its scored ledger rows (doc_id, lang, n_bigrams, xent,
    * n_tok) — WHERE those rows land (the score ledger directly, or the
    * quarantine when the quality gate fires) is the caller's routing
    * decision, so the admit and quarantine arms cannot diverge on what
    * a ledger row is. */
  private def ingestNovelScored(spark: SparkSession, lmStore: ModelStore,
      hashPath: String, trainLang: String)(
      batch: DataFrame, batchId: Long): DataFrame = {
    val docs = novelTextKeepers(spark, hashPath)(batch, batchId)
      .select("doc_id", "lang", "text")
    TextOps.lmScoreRowsPersisted(docs, lmStore, trainLang)
      .join(docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tok")),
        Seq("doc_id"))
  }

  /** The text keep-one step every incremental release shares: one
    * candidate per text hash within the batch (min doc_id — doc_id is
    * unique, so the struct-min is decided by it), drop hashes any
    * strictly-earlier batch already keeps, record this batch's novel
    * hashes in `hashPath/batch=N` (partition-overwrite — the replay
    * contract), and return the novel keepers (h, doc_id, lang, text),
    * checkpointed. */
  private def novelTextKeepers(spark: SparkSession, hashPath: String)(
      batch: DataFrame, batchId: Long): DataFrame = {
    val prior = StreamingDedup.readHashes(spark, hashPath)
      .map(_.filter(col("batch") < batchId).select("h"))
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("h", org.apache.spark.sql.types.StringType)))
    val cand = batch
      .select(md5(col("text")).as("h"), col("doc_id"), col("lang"),
        col("text"))
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("lang"), col("text"))).as("m"))
      .select(col("h"), col("m.doc_id").as("doc_id"),
        col("m.lang").as("lang"), col("m.text").as("text"))
    val novel = graft.Materialize.checkpoint(
      cand.join(prior, Seq("h"), "left_anti"))
    novel.select("h").write.mode("overwrite")
      .parquet(s"$hashPath/batch=$batchId")
    novel
  }

  /** The release manifest over everything ingested so far: the score
    * ledger through the shared tertile+shard body — equals
    * [[graft.llm.TextOps.corpusRelease]] on the union of the ingested
    * batches (spec-pinned parity; empty ledger → empty manifest). */
  def releaseManifest(spark: SparkSession, scorePath: String,
      shards: Int = 8, tombPath: Option[String] = None,
      asOf: Option[Long] = None): DataFrame = {
    requireAsOfAboveFold(spark, asOf, Seq(scorePath) ++ tombPath)
    StreamingDedup.readStore(spark, scorePath) match {
      case Some(scored1) =>
        // AS-OF (time-travel) read: ledger rows and takedowns from
        // batches ≤ asOf only — the manifest a release cut after that
        // batch actually shipped, recoverable forever (training-run
        // reproducibility); later batches are partition-pruned out
        def cut(df: DataFrame): DataFrame = asOf.map(b =>
          df.filter(col("batch").cast("long") <= b)).getOrElse(df)
        val scored0 = cut(scored1)
        // takedowns: one broadcast anti-join of the ledger against the
        // tombstoned doc_ids BEFORE the tertile/shard body — the next
        // manifest is a re-release over the survivors (tertile
        // boundaries move exactly as a from-scratch release over the
        // surviving corpus would move them)
        val scored = tombPath
          .flatMap(StreamingDedup.readStore(spark, _)) match {
          case Some(dead) => scored0.join(
            broadcast(cut(dead).select("doc_id").distinct()),
            Seq("doc_id"), "left_anti")
          case None => scored0
        }
        TextOps.releaseManifestFrom(scored.drop("batch"), shards)
      case None =>
        import org.apache.spark.sql.types.{IntegerType, LongType,
          StructType}
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          new StructType().add("shard", IntegerType)
            .add("n_docs", LongType).add("tot_tokens", LongType))
    }
  }

  /** The SHIPPED manifest's MEMBERSHIP at a point in time: ledger rows
    * at or before `asOf`, minus takedowns at or before `asOf` (both
    * partition-pruned cuts), through the SAME per-language tertile gate
    * the manifest applies ([[graft.llm.TextOps.releaseKeptIds]] —
    * recomputed over the snapshot's survivors, exactly as
    * [[releaseManifest]] recomputes it). ADVICE r13: the previous
    * ledger-only membership reported docs the CCNet gate never ships as
    * added/removed — the diff was self-consistent but did not diff the
    * released corpus. The gate costs the per-language rank the manifest
    * already pays; the rows are the ledger's five narrow columns, never
    * text. */
  def releaseMembers(spark: SparkSession, scorePath: String,
      tombPath: Option[String] = None,
      asOf: Option[Long] = None): DataFrame = {
    requireAsOfAboveFold(spark, asOf, Seq(scorePath) ++ tombPath)
    def cut(df: DataFrame): DataFrame = asOf.map(b =>
      df.filter(col("batch").cast("long") <= b)).getOrElse(df)
    StreamingDedup.readStore(spark, scorePath) match {
      case Some(led0) =>
        val led = cut(led0).drop("batch")
        val survivors = tombPath
          .flatMap(StreamingDedup.readStore(spark, _)) match {
          case Some(dead) => led.join(
            broadcast(cut(dead).select("doc_id").distinct()),
            Seq("doc_id"), "left_anti")
          case None => led
        }
        TextOps.releaseKeptIds(survivors)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType))
    }
  }

  /** RELEASE DIFF — the governance changelog between two snapshots:
    * which docs entered and which left the RELEASED corpus (the
    * tertile-gated membership the manifest ships) between as-of `from`
    * and as-of `to` (None = present). Computed as the two-sided set
    * difference of the MEMBERSHIP frames, so it is net-of-everything
    * by construction: a doc admitted and taken down inside the window
    * appears in neither direction, a takedown of a doc released before
    * `from` appears as `removed`, and a doc the gate pushed over a
    * moving tertile boundary appears exactly when its shipped status
    * changed. Two anti-joins over narrow doc_id frames plus the two
    * snapshots' per-language ranks — at 100 TB the diff never touches
    * text or shard assignments, only the ledger's narrow columns under
    * partition-pruned batch cuts. Returns (change ∈ {added, removed},
    * doc_id), ordered. */
  def releaseDiff(spark: SparkSession, scorePath: String,
      tombPath: Option[String] = None, from: Option[Long] = None,
      to: Option[Long] = None): DataFrame = {
    val m1 = releaseMembers(spark, scorePath, tombPath, from)
      .localCheckpoint(true) // both directions read it
    val m2 = releaseMembers(spark, scorePath, tombPath, to)
      .localCheckpoint(true)
    m2.join(m1, Seq("doc_id"), "left_anti")
      .select(lit("added").as("change"), col("doc_id"))
      .unionByName(m1.join(m2, Seq("doc_id"), "left_anti")
        .select(lit("removed").as("change"), col("doc_id")))
      .orderBy("change", "doc_id")
  }

  /** Driver-contract query (`q_release_diff`): three ascending ntile
    * microbatches ingested, the `doc_id % 11 = 5` slice taken down at
    * batch 3, then the changelog from as-of batch 1 to the present —
    * the two-sided difference of the SHIPPED memberships (keepers ×
    * the snapshot's cut/takedown × the per-language tertile gate,
    * recomputed per snapshot exactly as the manifest recomputes it).
    * The oracle replays both gated memberships wholesale and diffs
    * them in SQL — a hash match pins that the changelog reports
    * exactly the docs whose released status changed, boundary churn
    * included. */
  def releaseDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val hashDir = Files.createTempDirectory("graft-diffhash-")
    val scoreDir = Files.createTempDirectory("graft-diffscore-")
    val tombDir = Files.createTempDirectory("graft-difftomb-")
    try {
      // the ntile window is LOAD-BEARING here (kept despite VERDICT
      // r14 #6): the diff oracle replays both snapshot memberships
      // with the exact `ntile(3) OVER (ORDER BY doc_id)` cut, so the
      // boundary must be the oracle's, not an approximate quantile's
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(3).over(w))
        .localCheckpoint(true)
      val ingest = releaseIngestBatch(spark, lmStore,
        hashDir.toString, scoreDir.toString) _
      (1 to 3).foreach { s =>
        ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L)
      }
      releaseTakedownBatch(spark, tombDir.toString)(
        docs.filter(pmod(col("doc_id"), lit(11)) === 5), 3L)
      graft.Materialize.checkpoint(
        releaseDiff(spark, scoreDir.toString,
          tombPath = Some(tombDir.toString), from = Some(1L)))
    } finally Seq(hashDir, scoreDir, tombDir).foreach(
      ModelStore.deleteRecursively)
  }

  // ---- LEDGER COMPACTION (VERDICT r13 #2): the release stores gain a
  // `batch=N` dir per microbatch forever, and every manifest/members/
  // diff call re-lists and re-reads all of them — the classic
  // streaming-sink small-files leak; the ANN store got its compaction
  // arm in r12-r13, this is the symmetric fold for the release side.
  // The fold itself is [[StreamingDedup.compactHashes]]' merge-append
  // (all these stores are SET-semantics rows keyed by h/doc_id — one
  // batch each — so merging partitions preserves the rows exactly),
  // which moves rows at batches ≤ B into the `batch=B` partition. That
  // breaks exactly one thing: an as-of cut BELOW B can no longer see
  // the folded rows' original batch numbers — so each fold records B
  // in the store's `_folded_upto` marker (written BEFORE the fold:
  // fail-closed — a crash between the two refuses reads the fold would
  // have served, never serves reads it would have broken), and every
  // as-of read refuses below it (the builder's documented choice; the
  // alternative — snapshotting per-batch cuts — buys nothing the tag
  // store does not already pin). Replay contract: like the hash-store
  // fold, pick B strictly below the stream's replay horizon. ----

  /** The highest fold boundary ever applied to a ledger store, or None
    * when it was never folded. */
  def ledgerFoldBoundary(spark: SparkSession,
      path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path, "_folded_upto")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def writeFoldBoundary(spark: SparkSession, path: String,
      b: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path, "_folded_upto.tmp")
    val out = fs.create(tmp, true)
    try out.write(b.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // OVERWRITE rename, not delete-then-rename: a crash between those
    // two would erase the PRIOR boundary and fail the as-of guard OPEN
    // over already-folded rows (review r14) — the overwriting rename
    // leaves either the old boundary or the new one, never none
    org.apache.hadoop.fs.FileContext
      .getFileContext(dir.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(path, "_folded_upto"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Fold ONE ledger store's batch dirs at or below `upToBatch` into a
    * single partition — target = the newest foldable batch, skipped
    * (returns false) when fewer than two dirs are foldable or nothing
    * newer exists to protect the replay guard ([[StreamingDedup
    * .compactHashes]] requires the target strictly older than the
    * newest dir — the next fold catches what this one skips). The
    * `_folded_upto` marker advances first, so as-of reads below the
    * boundary refuse from the moment the fold can have moved rows. */
  def compactLedgerStore(spark: SparkSession, path: String,
      upToBatch: Long): Boolean = {
    val ids = StreamingDedup.listBatches(spark, path).map(_._1).sorted
    val foldable = ids.filter(_ <= upToBatch)
    if (foldable.size < 2 || ids.max <= foldable.max) false
    else {
      writeFoldBoundary(spark, path, foldable.max)
      StreamingDedup.compactHashes(spark, path, foldable.max)
      true
    }
  }

  /** Fold the corpus release's three stores — score ledger, hash
    * ledger, and (when given) the takedown tombstones — at or below
    * `upToBatch`. [[releaseManifest]]/[[releaseMembers]]/
    * [[releaseDiff]] read the folded partition + later batches and are
    * bit-identical across the fold (spec-pinned); as-of reads below a
    * store's recorded boundary refuse loudly. Returns the paths
    * actually folded. The multimodal stores take the same per-store
    * body ([[compactLedgerStore]]) on their own paths.
    *
    * `tagPath` wires TAG-PINNED folding: the boundary floors at the
    * lowest batch any snapshot tag names ([[taggedBatches]]), so a
    * tagged as-of serve can never be refused by the store's own
    * maintenance — the promise the as-of guard's "pin tags before
    * folding" message makes, honored the way index-version GC honors
    * [[graft.streaming.StreamingAnn.taggedIndexVersions]]. (Folding AT
    * a tagged batch is safe: the guard admits `asOf >= boundary`, and
    * the folded partition holds every row at or below it.) Pins are
    * resolved at FOLD time: a pinned ancient tag holds the floor — and
    * with it the batch-dir count — until the tag moves, the same
    * storage-for-pins trade the index GC makes. */
  def compactReleaseLedgers(spark: SparkSession, scorePath: String,
      hashPath: String, upToBatch: Long,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None): Seq[String] =
    compactStoresPinned(spark, Seq(scorePath, hashPath) ++ tombPath,
      upToBatch, tagPath)

  /** The ONE tag-pin floor rule for every set-semantics ledger fold:
    * fold `paths` at or below `upToBatch`, floored at the lowest batch
    * any snapshot tag under `tagPath` names. [[compactReleaseLedgers]]
    * and [[compactMultimodalLedgers]] both delegate here — corpus and
    * multimodal maintenance cannot diverge on pin semantics. */
  def compactStoresPinned(spark: SparkSession, paths: Seq[String],
      upToBatch: Long, tagPath: Option[String] = None): Seq[String] = {
    val floor = tagPath.map(taggedBatches(spark, _))
      .filter(_.nonEmpty).map(_.min)
    val upTo = floor.fold(upToBatch)(math.min(upToBatch, _))
    paths.filter(compactLedgerStore(spark, _, upTo))
  }

  /** Fold the multimodal release's stores — text-hash, media-cluster
    * fingerprint, survivor ledger, and (when given) the takedown
    * tombstones — the multimodal twin of [[compactReleaseLedgers]]
    * (all four are one-batch-dir set-semantics stores, so the same
    * per-store body and the same tag-pin floor apply).
    * [[multimodalManifest]] is bit-identical across the fold and its
    * as-of guard refuses below the boundary. The NEAR-DUP signature
    * store ([[multimodalIngestNearDupBatch]]'s `mediaSigPath`) is
    * deliberately NOT foldable here: its batch dirs are
    * bucket-subpartitioned (`batch=N/bkt=…`) and its probes prune by
    * bucket, so a row-merge fold would destroy the partition layout
    * the read path depends on — a bucket-preserving rewrite is a
    * different operation. */
  def compactMultimodalLedgers(spark: SparkSession, textHashPath: String,
      mediaHashPath: String, ledgerPath: String, upToBatch: Long,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None): Seq[String] =
    compactStoresPinned(spark,
      Seq(textHashPath, mediaHashPath, ledgerPath) ++ tombPath,
      upToBatch, tagPath)

  /** The multimodal MAINTENANCE loop — [[multimodalIngestBatch]] plus
    * the volume arm, the [[releaseMaintainBatch]] symmetry: every
    * `foldEvery` batches, fold the three stores (and tombstones) up to
    * `batchId − keepRecent` (the replay horizon), tag-pin floored when
    * `tagPath` is wired. */
  def multimodalMaintainBatch(spark: SparkSession, textHashPath: String,
      mediaHashPath: String, ledgerPath: String,
      foldEvery: Long = 64L, keepRecent: Long = 8L,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None)(
      batch: DataFrame, mediaClusters: DataFrame, batchId: Long): Unit = {
    require(foldEvery >= 1 && keepRecent >= 1,
      s"foldEvery=$foldEvery / keepRecent=$keepRecent must be >= 1")
    multimodalIngestBatch(spark, textHashPath, mediaHashPath,
      ledgerPath)(batch, mediaClusters, batchId)
    if (batchId > 0 && batchId % foldEvery == 0 &&
        batchId - keepRecent >= 0)
      compactMultimodalLedgers(spark, textHashPath, mediaHashPath,
        ledgerPath, batchId - keepRecent, tombPath, tagPath)
  }

  /** One-call bounded-storage multimodal loop — [[multimodalMaintainBatch]]
    * with the [[releaseAutopilot]] default dials (the multimodal side
    * has no versions to GC and no purge contract either: the
    * three-store ledger fold IS the whole retention story). The same
    * tag-pin trade applies: a pinned ancient tag holds the fold floor
    * until it moves. */
  def multimodalAutopilot(spark: SparkSession, textHashPath: String,
      mediaHashPath: String, ledgerPath: String,
      foldEvery: Long = 16L, keepRecent: Long = 8L,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None)(
      batch: DataFrame, mediaClusters: DataFrame, batchId: Long): Unit =
    multimodalMaintainBatch(spark, textHashPath, mediaHashPath,
      ledgerPath, foldEvery, keepRecent, tombPath, tagPath)(
      batch, mediaClusters, batchId)

  /** The multimodal manifest at a NAMED snapshot — [[multimodalManifest]]
    * with the tag resolved to its as-of batch, the
    * [[releaseManifestAt]] symmetry (the multimodal tag store is its
    * own path under the same [[tagSnapshot]]/[[resolveTag]] pointer
    * discipline). */
  def multimodalManifestAt(spark: SparkSession, ledgerPath: String,
      tagPath: String, tag: String,
      tombPath: Option[String] = None): DataFrame =
    multimodalManifest(spark, ledgerPath, tombPath,
      asOf = Some(resolveTag(spark, tagPath, tag)))

  // ---- MONITOR-STORE FOLD (VERDICT r14 #2): the drift and gate
  // monitors append one 1-row `batch=N` dir per microbatch forever —
  // the same small-files leak the ledgers had, except monitor rows are
  // a TIME SERIES: collapsing their batch numbers (the ledger fold's
  // merge) would destroy exactly what a monitor is for. The fold
  // therefore preserves attribution: rows of batches < target are
  // rewritten into the target dir carrying their ORIGINAL batch in an
  // `mbatch` data column, and [[readMonitor]] reconstructs the exact
  // pre-fold series (batch = coalesce(mbatch, partition)). No as-of
  // refusal contract is needed — nothing is lost. Crash-safe the
  // compactStore way: append target rows first (a retry anti-joins
  // rows already copied), delete source dirs last; the `_folded_upto`
  // marker advances first for observability. Replay contract: fold
  // strictly below the replay horizon (a re-delivered batch
  // partition-overwrites its own dir — overwriting the TARGET dir
  // would erase folded history, same rule as the ledgers). ----

  /** Fold ONE monitor store's batch dirs strictly below the newest
    * foldable batch at or below `upToBatch` into that batch's dir,
    * preserving each row's original batch in `mbatch`. Returns false
    * (no-op) when fewer than two dirs are foldable or nothing newer
    * exists to protect the replay guard. */
  def compactMonitorStore(spark: SparkSession, path: String,
      upToBatch: Long): Boolean = {
    val batches = StreamingDedup.listBatches(spark, path)
    val ids = batches.map(_._1).sorted
    val foldable = ids.filter(_ <= upToBatch)
    if (foldable.size < 2 || ids.max <= foldable.max) false
    else {
      val target = foldable.max
      writeFoldBoundary(spark, path, target)
      def stamped(b: Long, dir: String): DataFrame = {
        // mergeSchema: a previously-folded dir holds its own original
        // file (no mbatch) plus appended folded files (mbatch set)
        val df = spark.read.option("mergeSchema", "true").parquet(dir)
        if (df.columns.contains("mbatch"))
          df.withColumn("mbatch", coalesce(col("mbatch"), lit(b)))
        else df.withColumn("mbatch", lit(b))
      }
      val olds = batches.filter(_._1 < target)
        .map { case (b, dir) => stamped(b, dir.toString) }
        .reduce(_ unionByName _)
      val targetDir = s"$path/batch=$target"
      val existing = stamped(target, targetDir)
      // idempotent retry: rows a crashed fold already appended are
      // anti-joined away (all columns incl. mbatch are the identity —
      // a monitor writes one row set per batch)
      olds.join(existing, existing.columns.toSeq, "left_anti")
        .select(existing.columns.map(col): _*)
        .write.mode("append").parquet(targetDir)
      batches.filter(_._1 < target).foreach { case (_, dir) =>
        dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(dir, true)
      }
      true
    }
  }

  /** The monitor time series (original columns + `batch`), exact
    * across any number of folds — None when the store has no batches
    * yet. The canonical history read: a direct parquet read of a
    * FOLDED store shows folded rows under the target partition;
    * this read restores their true batch from `mbatch`. */
  def readMonitor(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    if (StreamingDedup.listBatches(spark, path).isEmpty) None
    else {
      val df = spark.read.option("mergeSchema", "true")
        .option("basePath", path).parquet(path)
      Some(
        if (df.columns.contains("mbatch"))
          df.withColumn("batch",
            coalesce(col("mbatch"), col("batch").cast("long")))
            .drop("mbatch")
        else df.withColumn("batch", col("batch").cast("long")))
    }
  }

  /** The release-side MAINTENANCE loop: [[releaseIngestBatch]] plus the
    * volume arm — every `foldEvery` batches, fold the three ledgers up
    * to `batchId − keepRecent` ([[compactReleaseLedgers]]); the
    * `keepRecent` window is the caller's replay horizon (the fold's
    * replay contract), so a re-delivered recent batch always finds its
    * own partition intact. The [[graft.streaming.StreamingAnn
    * .annMaintainBatch]] symmetry: ingest cheap and continuous, fold
    * when directory count — the release stores' scale cost — crosses
    * the dial. Skipped folds (nothing foldable yet) are free; a fold
    * that fires is one merge-append per store. */
  def releaseMaintainBatch(spark: SparkSession, lmStore: ModelStore,
      hashPath: String, scorePath: String, trainLang: String = "en",
      foldEvery: Long = 64L, keepRecent: Long = 8L,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    require(foldEvery >= 1 && keepRecent >= 1,
      s"foldEvery=$foldEvery / keepRecent=$keepRecent must be >= 1")
    releaseIngestBatch(spark, lmStore, hashPath, scorePath, trainLang)(
      batch, batchId)
    if (batchId > 0 && batchId % foldEvery == 0 &&
        batchId - keepRecent >= 0)
      compactReleaseLedgers(spark, scorePath, hashPath,
        batchId - keepRecent, tombPath, tagPath)
  }

  /** One-call bounded-storage release loop (VERDICT r14 #4 — the
    * release-side autopilot preset): [[releaseMaintainBatch]] with the
    * documented default dials. Every store the loop writes is bounded:
    * score/hash/tombstone ledgers fold every `foldEvery` batches to
    * `keepRecent` behind the head (the replay horizon), so their
    * batch-dir count never exceeds foldEvery + keepRecent + 1; the LM
    * store is train-once and never grows. Unlike the ANN side there
    * are no versions to GC and no purge contract — the ledger fold IS
    * the whole retention story, which is why this preset is a thin
    * naming of the maintain loop rather than new machinery. The soak
    * spec (AutopilotSpec) drives 50 microbatches with takedowns
    * through it and pins the dir bound plus manifest-equality with a
    * never-folded twin. `tagPath` makes the fold tag-pinned
    * ([[compactReleaseLedgers]]); the dir bound then holds only while
    * no tag pins an ancient batch — a pin trades storage for the
    * tagged serve, exactly like index-GC pins. */
  def releaseAutopilot(spark: SparkSession, lmStore: ModelStore,
      hashPath: String, scorePath: String, trainLang: String = "en",
      foldEvery: Long = 16L, keepRecent: Long = 8L,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None)(
      batch: DataFrame, batchId: Long): Unit =
    releaseMaintainBatch(spark, lmStore, hashPath, scorePath,
      trainLang, foldEvery, keepRecent, tombPath, tagPath)(
      batch, batchId)

  /** Wire a (doc_id, lang, text) stream through the self-maintaining
    * release ingest — [[incrementalRelease]] with the fold arm. */
  def incrementalReleaseMaintained(docs: DataFrame, lmStore: ModelStore,
      hashPath: String, scorePath: String, checkpoint: String,
      trainLang: String = "en", foldEvery: Long = 64L,
      keepRecent: Long = 8L,
      tombPath: Option[String] = None,
      tagPath: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch(releaseMaintainBatch(docs.sparkSession, lmStore,
        hashPath, scorePath, trainLang, foldEvery, keepRecent,
        tombPath, tagPath) _)
      .option("checkpointLocation", checkpoint)

  /** The as-of guard every release read applies: a cut below a consulted
    * store's fold boundary would silently miss folded rows — refuse. */
  private def requireAsOfAboveFold(spark: SparkSession,
      asOf: Option[Long], paths: Seq[String]): Unit =
    asOf.foreach { a =>
      paths.foreach { p =>
        ledgerFoldBoundary(spark, p).foreach(b => require(a >= b,
          s"as-of batch $a predates the fold boundary $b of $p — " +
            "rows at or below it were folded into one partition and " +
            "cannot be cut finer; fold less aggressively or pin tags " +
            "before folding"))
      }
    }

  // ---- NAMED SNAPSHOTS: a tag is a name for an as-of batch ("the
  // corpus training run 7 saw" = tag "run-7"), the git-tag discipline
  // over the time-travel reads: consumers pin tags, operators move
  // them. A tag store is tiny parquet partitioned by tag name
  // (tag=NAME/ → one batch value); re-tagging overwrites its own
  // partition (the replay contract — a tag moves explicitly, like
  // `git tag -f`, never by ambient race). ----

  /** Tag names interpolate into the partition path, so the charset is
    * fenced (ADVICE r13): '/' or '=' would corrupt the hive layout,
    * '..' could escape tagPath — and resolveTag's existence check
    * would then pass for the escaped path. Validated on WRITE and
    * READ (a store written before the fence still cannot be read
    * through an escaping name). */
  private[streaming] def validTag(tag: String): String = {
    require(tag.matches("[A-Za-z0-9._-]+") && !tag.contains(".."),
      s"bad snapshot tag '$tag': use [A-Za-z0-9._-]+ without '..'")
    tag
  }

  /** Split a pointer-file payload into (value, generation nonce): the
    * optional `#nonce` suffix is the [[graft.streaming.RunTags]]
    * generation marker — both halves of one `tagRun` carry the same
    * nonce, so a torn re-tag (old half + new half, each individually
    * valid) is detectable. Single-store readers strip it; payloads
    * written before the nonce (or by single-store tag calls) have
    * none. */
  private[streaming] def splitNonce(s: String): (String, Option[String]) =
    s.split("#", 2) match {
      case Array(v)    => (v.trim, None)
      case Array(v, n) => (v.trim, Some(n.trim))
    }

  /** Fence a run-generation nonce: it rides inside the pointer payload,
    * so the charset must not collide with the `#` separator or the
    * whitespace the index pointer splits on. */
  private[streaming] def validNonce(n: String): String = {
    require(n.matches("[A-Za-z0-9._-]+"),
      s"bad run nonce '$n': use [A-Za-z0-9._-]+")
    n
  }

  /** Name an as-of batch. Stored as a one-line POINTER FILE promoted
    * by an overwriting atomic rename (the `_CURRENT` discipline, same
    * upgrade as [[graft.streaming.StreamingAnn.tagIndexSnapshot]] —
    * ADVICE r14): a crash mid-retag leaves the old pointer or the new
    * one, never an unreadable tag. Pre-r15 stores wrote parquet
    * partition dirs; those still resolve, and the first re-tag
    * upgrades them (that one retag is delete-then-rename). `nonce` is
    * the [[graft.streaming.RunTags]] generation marker ([[splitNonce]]);
    * single-store callers leave it None and the payload is unchanged
    * from pre-nonce stores. */
  def tagSnapshot(spark: SparkSession, tagPath: String, tag: String,
      batch: Long, nonce: Option[String] = None): Unit = {
    val dir = new org.apache.hadoop.fs.Path(tagPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val name = validTag(tag)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tag-$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      (batch.toString + nonce.map(n => s"#${validNonce(n)}").getOrElse(""))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(dir, s"tag=$name")
    if (fs.exists(dest) && fs.getFileStatus(dest).isDirectory)
      fs.delete(dest, true)
    org.apache.hadoop.fs.FileContext
      .getFileContext(dir.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Resolve a tag to its as-of batch; unknown tags fail loudly (a
    * consumer pinning a tag that does not exist must not silently read
    * the present). Reads both formats (pointer file; pre-r15 parquet
    * dir). */
  def resolveTag(spark: SparkSession, tagPath: String,
      tag: String): Long =
    resolveTagWithNonce(spark, tagPath, tag)._1

  /** [[resolveTag]] plus the generation nonce the pointer carries (None
    * for pre-nonce payloads, parquet-dir tags, and single-store tags) —
    * the [[graft.streaming.RunTags.resolveRun]] torn-re-tag check. */
  def resolveTagWithNonce(spark: SparkSession, tagPath: String,
      tag: String): (Long, Option[String]) = {
    val p = new org.apache.hadoop.fs.Path(s"$tagPath/tag=${validTag(tag)}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"unknown snapshot tag '$tag' under $tagPath")
    if (fs.getFileStatus(p).isDirectory)
      (spark.read.parquet(p.toString).select("batch").head().getLong(0),
        None)
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      val (v, n) = splitNonce(s)
      (v.toLong, n)
    }
  }

  /** Every as-of batch named by any tag under `tagPath` — the pin set
    * the LEDGER FOLD floors at so tagged snapshots stay servable
    * ([[compactReleaseLedgers]]), the release-side symmetry of
    * [[graft.streaming.StreamingAnn.taggedIndexVersions]]. One driver
    * listing + one tiny read per tag; an existing-but-empty dir is NO
    * tags; a concurrent re-tag is invisible (each pointer read sees
    * its old or new value, never a missing one). */
  def taggedBatches(spark: SparkSession, tagPath: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(tagPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(_.getPath.getName.startsWith("tag="))
      .map(s => resolveTag(spark, tagPath,
        s.getPath.getName.stripPrefix("tag=")))
      .toSet
  }

  /** The manifest at a NAMED snapshot — [[releaseManifest]] with the
    * tag resolved to its as-of batch. */
  def releaseManifestAt(spark: SparkSession, scorePath: String,
      tagPath: String, tag: String, shards: Int = 8,
      tombPath: Option[String] = None): DataFrame =
    releaseManifest(spark, scorePath, shards, tombPath,
      asOf = Some(resolveTag(spark, tagPath, tag)))

  /** The changelog between two NAMED snapshots. */
  def releaseDiffBetween(spark: SparkSession, scorePath: String,
      tagPath: String, fromTag: String, toTag: String,
      tombPath: Option[String] = None): DataFrame =
    releaseDiff(spark, scorePath, tombPath,
      from = Some(resolveTag(spark, tagPath, fromTag)),
      to = Some(resolveTag(spark, tagPath, toTag)))

  /** TAKEDOWN: tombstone released docs by doc_id — one (doc_id,
    * batch=N) store under the replay contract, consumed by
    * [[releaseManifest]] as a pre-tertile anti-join. The content
    * cannot re-enter through a re-crawl: the text's hash was recorded
    * in the hash ledger at original ingest and stays there, so a
    * later batch carrying the same text is non-novel and never
    * reaches the score ledger — doc_id tombstone + hash ledger
    * together are a CONTENT-level takedown (spec-pinned). Takedowns
    * are deliberately permanent (no re-admit arm): re-licensed
    * content re-enters as a new ingest decision by an operator
    * clearing the tombstone, not as an ambient winners race. */
  def releaseTakedownBatch(spark: SparkSession, tombPath: String)(
      docs: DataFrame, batchId: Long): Unit =
    docs.select("doc_id").distinct()
      .write.mode("overwrite").parquet(s"$tombPath/batch=$batchId")

  /** Wire a (doc_id, lang, text) stream through the incremental
    * release ingest. */
  def incrementalRelease(docs: DataFrame, lmStore: ModelStore,
      hashPath: String, scorePath: String, checkpoint: String,
      trainLang: String = "en"): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch(releaseIngestBatch(docs.sparkSession, lmStore,
        hashPath, scorePath, trainLang) _)
      .option("checkpointLocation", checkpoint)

  // ---- release QUALITY drift gate: the incremental release scores
  // every novel doc anyway; the DISTRIBUTION of those scores is the
  // free observable that says the crawl went bad (spam wave, encoding
  // rot, a new boilerplate source) BEFORE the tertile gate quietly
  // starts admitting garbage as "head" of a degraded population. Same
  // machinery as the ANN quantizer-drift gate: a persisted reference
  // histogram of a HELD-OUT calibration slice's xent (the LM trained
  // on the trusted corpus — in-sample scores are systematically low,
  // the StreamingAnn r8 miscalibration lesson applies verbatim), each
  // batch's scores PSI'd against it through the one shared rule
  // ([[StreamingDrift.psiReport]]). The gate OBSERVES; acting on it
  // (pause the release, quarantine the source) is the operator's
  // caller's decision. ----

  /** Snapshot the xent drift reference: bucket edges + histogram of the
    * calibration docs' LM scores, persisted to its own store. `calib`
    * must be docs the LM did NOT train on exclusively — score a slice
    * that is exchangeable with future honest ingest. */
  def saveXentReference(calib: DataFrame, lmStore: ModelStore,
      driftStore: ModelStore, trainLang: String = "en",
      buckets: Int = 10): Long = {
    val xent = TextOps.lmScoreRowsPersisted(calib, lmStore, trainLang)
      .select(col("xent").as("d")).localCheckpoint(true)
    val edges = xent.agg(min("d").as("vmin"), max("d").as("vmax"))
      .localCheckpoint(true)
    val hist = xent.crossJoin(broadcast(edges))
      .select(graft.operators.StatTests.bucketCol(col("d"), col("vmin"),
        col("vmax"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_ref"))
    driftStore.save(Map("drift_edges" -> edges, "drift_hist" -> hist))
  }

  /** Score one batch's xent distribution against the persisted
    * reference → ONE row (n_cur, psi, shifted). Work: the batch's own
    * LM scoring (which the release ingest pays anyway) + a
    * ≤ buckets-row PSI combine. */
  def releaseQualityGate(lmStore: ModelStore, driftStore: ModelStore,
      batch: DataFrame, threshold: Double = 0.2,
      trainLang: String = "en", buckets: Int = 10): DataFrame =
    xentGateFrom(TextOps.lmScoreRowsPersisted(batch, lmStore, trainLang),
      driftStore, threshold, buckets)

  /** The ONE gate body: PSI an already-scored frame's xent distribution
    * against the persisted reference → one row (n_cur, psi, shifted).
    * Shared by the standalone gate and both ingest arms (ADVICE r11:
    * the composed ingest re-implemented this with buckets hard-coded to
    * 10, silently mis-bucketing against a reference saved at any other
    * width — one body makes the paths unable to diverge). `buckets`
    * MUST match the [[saveXentReference]] width. */
  private def xentGateFrom(scored: DataFrame, driftStore: ModelStore,
      threshold: Double, buckets: Int): DataFrame = {
    val cur = scored
      .crossJoin(broadcast(driftStore.load("drift_edges")))
      .select(graft.operators.StatTests.bucketCol(col("xent"),
        col("vmin"), col("vmax"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_cur"))
    StreamingDrift.psiReport(driftStore.load("drift_hist"), cur, buckets)
      .agg(sum("c_cur").as("n_cur"), round(sum("psi_term"), 6).as("psi"))
      .select(col("n_cur"), col("psi"),
        (col("psi") > threshold).as("shifted"))
  }

  // ---- per-LANGUAGE quality gate (VERDICT r12 #4): the pooled gate
  // can be masked by a MIX shift — more low-resource-language docs,
  // each individually honest, moves the pooled xent distribution while
  // every per-language distribution is stationary; and conversely one
  // language's degradation dilutes into the pool. The release's
  // tertile gate is already per-language ([[TextOps]]' CCNet rule), so
  // the monitor is too: reference edges + histogram PER LANGUAGE, PSI
  // per language through the grouped twin of the shared smoothing/term
  // rule ([[graft.operators.StatTests.psiTermsGrouped]] — with one
  // language it equals the pooled rule exactly). A language absent
  // from the calibrated reference cannot be SCORED (no reference to
  // compare against) but is SURFACED: the gate emits a count-only row
  // (psi/shifted NULL) and the docs are admitted — a spam flood in a
  // NEW language shows in the monitor even when it cannot be judged
  // (VERDICT r13 #6; calibrate every expected language for scored
  // coverage). ----

  /** Snapshot the PER-LANGUAGE xent drift reference: bucket edges and
    * histogram of the calibration docs' LM scores, grouped by lang,
    * persisted to its own store ([[saveXentReference]]'s grouped twin;
    * the same held-out-calibration discipline applies). */
  def saveXentReferenceByLang(calib: DataFrame, lmStore: ModelStore,
      driftStore: ModelStore, trainLang: String = "en",
      buckets: Int = 10): Long = {
    val xent = TextOps.lmScoreRowsPersisted(calib, lmStore, trainLang)
      .select(col("lang"), col("xent").as("d")).localCheckpoint(true)
    val edges = xent.groupBy("lang")
      .agg(min("d").as("vmin"), max("d").as("vmax"))
      .localCheckpoint(true)
    val hist = xent.join(broadcast(edges), "lang")
      .select(col("lang"), graft.operators.StatTests.bucketCol(col("d"),
        col("vmin"), col("vmax"), buckets).as("bucket"))
      .groupBy("lang", "bucket").agg(count(lit(1)).as("c_ref"))
    driftStore.save(Map("lang_edges" -> edges, "lang_hist" -> hist))
  }

  /** Per-(lang, bucket) PSI terms of an already-scored frame against
    * the per-language reference — the ONE grouped-gate body: the
    * summary gate sums it per language, and the `q_xent_gate_lang`
    * oracle row pins it (each term row is independently exact, so the
    * cross-engine hash never rides a float fold). Languages present in
    * the batch but absent from the reference drop out (inner edge
    * join); reference languages absent from the batch produce no rows
    * (no quality evidence — not the same as a shift). */
  private[streaming] def xentTermsByLang(scored: DataFrame,
      driftStore: ModelStore, buckets: Int): DataFrame = {
    val edges = driftStore.load("lang_edges")
    val cur = scored.join(broadcast(edges), "lang")
      .select(col("lang"), graft.operators.StatTests.bucketCol(
        col("xent"), col("vmin"), col("vmax"), buckets).as("bucket"))
      .groupBy("lang", "bucket").agg(count(lit(1)).as("c_cur"))
      .localCheckpoint(true)
    val hist = driftStore.load("lang_hist")
      .join(cur.select("lang").distinct(), Seq("lang"), "left_semi")
      .localCheckpoint(true) // the outer merge reads it twice
    // histogram merge through the engine's one outer-merge shape
    // (broadcast left-outer + anti-join union — the resolveWinners
    // rule): a full_outer cannot broadcast either side and sort-merges
    // even two tiny aggregates (VERDICT r13 wrong #3, the last banned
    // instance). Row set identical to the full_outer: reference
    // buckets carry their c_cur-or-0, current-only buckets enter with
    // c_ref = 0.
    val counts = hist
      .join(broadcast(cur), Seq("lang", "bucket"), "left_outer")
      .select(col("lang"), col("bucket"), col("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
      .unionByName(cur
        .join(broadcast(hist.select("lang", "bucket")),
          Seq("lang", "bucket"), "left_anti")
        .select(col("lang"), col("bucket"), lit(0L).as("c_ref"),
          col("c_cur")))
      .localCheckpoint(true)
    graft.operators.StatTests.psiTermsGrouped(counts, buckets, "lang")
  }

  /** Per-language gate rows (lang, n_cur, psi, shifted) of an
    * already-scored frame — [[xentGateFrom]]'s grouped twin, summing
    * the one term body per language. Languages ABSENT from the
    * calibrated reference get a count-only row (n_cur, psi = NULL,
    * shifted = NULL): the gate cannot score them, but a spam wave in a
    * NEW language is exactly the batch the pooled gate dilutes —
    * the monitor must show the flood even when it cannot judge it
    * (VERDICT r13 #6). NULL shifted never quarantines (the routing
    * filter is three-valued — null falls through to admit), so
    * reference-absent languages stay admitted-but-recorded. */
  def xentGateByLangFrom(scored: DataFrame, driftStore: ModelStore,
      threshold: Double = 0.2, buckets: Int = 10): DataFrame = {
    val gated = xentTermsByLang(scored, driftStore, buckets)
      .groupBy("lang")
      .agg(sum("c_cur").as("n_cur"), round(sum("psi_term"), 6).as("psi"))
      .select(col("lang"), col("n_cur"), col("psi"),
        (col("psi") > threshold).as("shifted"))
    val unknown = scored.groupBy("lang").agg(count(lit(1)).as("n_cur"))
      .join(broadcast(driftStore.load("lang_edges").select("lang")),
        Seq("lang"), "left_anti")
      .select(col("lang"), col("n_cur"),
        lit(null).cast("double").as("psi"),
        lit(null).cast("boolean").as("shifted"))
    gated.unionByName(unknown).orderBy("lang")
  }

  /** Score one batch and gate it per language — the standalone
    * grouped monitor ([[releaseQualityGate]]'s twin). */
  def releaseQualityGateByLang(lmStore: ModelStore,
      driftStore: ModelStore, batch: DataFrame, threshold: Double = 0.2,
      trainLang: String = "en", buckets: Int = 10): DataFrame =
    xentGateByLangFrom(
      TextOps.lmScoreRowsPersisted(batch, lmStore, trainLang),
      driftStore, threshold, buckets)

  /** [[releaseIngestWithQuarantineBatch]] with PER-LANGUAGE routing:
    * gate each language's scored distribution separately and hold ONLY
    * the shifted languages' docs — a clean-language doc in the same
    * batch is admitted (the documented choice: quarantine follows the
    * evidence, which is per-language). The monitor records every
    * gate row. `minGateN` is the per-language sample floor — a
    * language below it is admitted with the signal recorded, the
    * [[releaseIngestWithQuarantineBatch]] rule applied per group.
    * Replay idempotent: the verdicts are deterministic functions of
    * the scored rows and the frozen reference, and both destinations
    * overwrite their own `batch=N` partition (one of them possibly
    * with zero rows — still schema-bearing). */
  def releaseIngestWithLangQuarantineBatch(spark: SparkSession,
      lmStore: ModelStore, driftStore: ModelStore, hashPath: String,
      scorePath: String, quarantinePath: String, monitorPath: String,
      threshold: Double = 0.2, trainLang: String = "en",
      buckets: Int = 10, minGateN: Long = 50L)(
      batch: DataFrame, batchId: Long): Unit = {
    val scored = graft.Materialize.checkpoint(
      ingestNovelScored(spark, lmStore, hashPath, trainLang)(
        batch, batchId))
    val gate = xentGateByLangFrom(scored, driftStore, threshold, buckets)
      .localCheckpoint(true) // read twice: persisted rows + verdicts
    gate.write.mode("overwrite")
      .parquet(s"$monitorPath/batch=$batchId")
    val held = gate
      .filter(col("shifted") && col("n_cur") >= minGateN)
      .select("lang").collect().map(_.getString(0)).toSeq // ≤ |langs|
    scored.filter(!col("lang").isin(held: _*))
      .write.mode("overwrite").parquet(s"$scorePath/batch=$batchId")
    scored.filter(col("lang").isin(held: _*))
      .write.mode("overwrite").parquet(s"$quarantinePath/batch=$batchId")
  }

  /** Wire a (doc_id, lang, text) stream through the per-language
    * quarantining ingest. */
  def incrementalReleaseWithLangQuarantine(docs: DataFrame,
      lmStore: ModelStore, driftStore: ModelStore, hashPath: String,
      scorePath: String, quarantinePath: String, monitorPath: String,
      checkpoint: String, threshold: Double = 0.2,
      trainLang: String = "en", buckets: Int = 10,
      minGateN: Long = 50L): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch(releaseIngestWithLangQuarantineBatch(
        docs.sparkSession, lmStore, driftStore, hashPath, scorePath,
        quarantinePath, monitorPath, threshold, trainLang, buckets,
        minGateN) _)
      .option("checkpointLocation", checkpoint)

  /** Re-admit a batch's quarantined rows by MERGING them with whatever
    * the batch already admitted — the per-language arm's clear path
    * ([[admitQuarantined]] overwrites the whole partition, which is
    * right only when the batch was held wholesale). Deterministic and
    * replay-idempotent: rows are keyed by doc_id and both sources are
    * the same ledger rows, so the merged partition is the exact
    * admit-everything outcome however many times it runs. */
  def admitQuarantinedMerge(spark: SparkSession, quarantinePath: String,
      scorePath: String, batchId: Long): Unit = {
    val held = spark.read.parquet(s"$quarantinePath/batch=$batchId")
    val dest = s"$scorePath/batch=$batchId"
    val merged = (try Some(spark.read.parquet(dest)) catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }).fold(held)(_.unionByName(held).dropDuplicates("doc_id"))
    // materialize BEFORE the overwrite — merged reads dest
    graft.Materialize.checkpoint(merged)
      .write.mode("overwrite").parquet(dest)
  }

  /** Driver-contract query (`q_xent_gate_lang`): the per-language gate's
    * term table over a deterministic split of `dir`'s documents —
    * reference = even doc_ids, current = odd doc_ids, both scored by
    * the process-shared LM. Emits one row per (lang, bucket) with the
    * smoothed PSI term — each row independently exact — so the driver's
    * DuckDB replay hash-pins the grouped bucket/smoothing/term rules. */
  def xentGateByLangQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val calib = docs.filter(col("doc_id") % 2 === 0)
    val cur = TextOps.lmScoreRowsPersisted(
      docs.filter(col("doc_id") % 2 === 1), lmStore)
    val driftDir = Files.createTempDirectory("graft-langgate-")
    try {
      val ds = new ModelStore(spark, driftDir.toString)
      saveXentReferenceByLang(calib, lmStore, ds)
      graft.Materialize.checkpoint(xentTermsByLang(cur, ds, 10))
    } finally ModelStore.deleteRecursively(driftDir)
  }

  /** [[releaseIngestBatch]] plus the quality monitor: the gate row for
    * each batch lands in `monitorPath/batch=N` (partition-overwrite —
    * the replay contract holds for the monitor too). The monitored
    * population is the batch's NOVEL docs — the rows that would enter
    * the release; re-sent duplicates carry no new quality evidence. */
  def releaseIngestWithQualityBatch(spark: SparkSession,
      lmStore: ModelStore, driftStore: ModelStore, hashPath: String,
      scorePath: String, monitorPath: String, threshold: Double = 0.2,
      trainLang: String = "en", buckets: Int = 10)(
      batch: DataFrame, batchId: Long): Unit = {
    releaseIngestBatch(spark, lmStore, hashPath, scorePath,
      trainLang)(batch, batchId)
    // the scores were just persisted — monitor FROM the ledger row
    // rather than re-scoring the text, through the one shared gate body
    xentGateFrom(spark.read.parquet(s"$scorePath/batch=$batchId"),
      driftStore, threshold, buckets)
      .write.mode("overwrite").parquet(s"$monitorPath/batch=$batchId")
  }

  // ---- the gate's ACTING arm (VERDICT r11 #3): the observe-only
  // monitor row says the crawl went bad, but nothing stopped the
  // degraded batch from entering the manifest — the asymmetry with the
  // ANN loop, whose ingest consumes its own drift row. This closes it:
  // the quarantining ingest ROUTES each batch's scored rows by its own
  // gate verdict — clean batches land in the score ledger as usual;
  // shifted batches land in a quarantine store the manifest never
  // reads. Quarantine is reversible (the rows are the same ledger
  // rows): [[admitQuarantined]] re-admits a cleared batch
  // deterministically. The text-hash store is written EITHER WAY — the
  // docs were seen, and re-admission is an operator decision on the
  // held rows, not a re-crawl. ----

  /** [[releaseIngestWithQualityBatch]] with the verdict acted on:
    * score the batch's novel docs, gate the scored distribution, then
    * write the rows to `scorePath/batch=N` (clean) or
    * `quarantinePath/batch=N` (shifted) — never both. The monitor row
    * records the verdict either way. `minGateN` is the sample floor
    * ([[StreamingAnn.annAutoRebuildBatch]]'s minRebuildN rule): PSI
    * over a handful of rows is noise-dominated, and quarantining an
    * EMPTY batch's zero rows is meaningless — below the floor the
    * batch is admitted and only the monitor records the signal.
    * Replay is idempotent: the verdict is a deterministic function of
    * the scored rows and the frozen reference, so a re-delivered batch
    * rewrites the same partition of the same store — and a replay
    * after [[admitQuarantined]] rewrites only the quarantine copy,
    * leaving the admitted rows in place (the release state machine
    * moves forward only). */
  def releaseIngestWithQuarantineBatch(spark: SparkSession,
      lmStore: ModelStore, driftStore: ModelStore, hashPath: String,
      scorePath: String, quarantinePath: String, monitorPath: String,
      threshold: Double = 0.2, trainLang: String = "en",
      buckets: Int = 10, minGateN: Long = 50L)(
      batch: DataFrame, batchId: Long): Unit = {
    val scored = graft.Materialize.checkpoint(
      ingestNovelScored(spark, lmStore, hashPath, trainLang)(
        batch, batchId))
    val monitor = xentGateFrom(scored, driftStore, threshold, buckets)
      .localCheckpoint(true) // read twice: persisted row + verdict
    monitor.write.mode("overwrite")
      .parquet(s"$monitorPath/batch=$batchId")
    val mon = monitor.select("shifted", "n_cur").head()
    val hold = mon.getBoolean(0) && mon.getLong(1) >= minGateN
    val dest = if (hold) quarantinePath else scorePath
    scored.write.mode("overwrite").parquet(s"$dest/batch=$batchId")
  }

  /** Wire a (doc_id, lang, text) stream through the QUARANTINING
    * release ingest — [[incrementalRelease]]'s symmetry for the acting
    * gate, so the production wiring is one call for either arm. */
  def incrementalReleaseWithQuarantine(docs: DataFrame,
      lmStore: ModelStore, driftStore: ModelStore, hashPath: String,
      scorePath: String, quarantinePath: String, monitorPath: String,
      checkpoint: String, threshold: Double = 0.2,
      trainLang: String = "en", buckets: Int = 10,
      minGateN: Long = 50L): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch(releaseIngestWithQuarantineBatch(docs.sparkSession,
        lmStore, driftStore, hashPath, scorePath, quarantinePath,
        monitorPath, threshold, trainLang, buckets, minGateN) _)
      .option("checkpointLocation", checkpoint)

  /** Operator clear arm: re-admit a quarantined batch by copying its
    * held ledger rows into the score ledger — the rows are already the
    * exact rows an admitted ingest would have written
    * ([[ingestNovelScored]] is the one body), so admission is
    * deterministic and a replayed admit rewrites the same partition.
    * The quarantine copy is left in place as the audit record; the
    * manifest reads the score ledger only. */
  def admitQuarantined(spark: SparkSession, quarantinePath: String,
      scorePath: String, batchId: Long): Unit =
    spark.read.parquet(s"$quarantinePath/batch=$batchId")
      .write.mode("overwrite").parquet(s"$scorePath/batch=$batchId")

  // ---- incremental MULTIMODAL release (the streaming twin of
  // [[graft.llm.Multimodal.multimodalRelease]]): the text keep-one and
  // the media-canonical policies are both "first batch to present this
  // fingerprint wins" rules under the ascending-doc_id convention, so
  // the increment pays two hash anti-joins (text hash store + media
  // fingerprint store) and stores one narrow (doc_id, lang, n_tok) row
  // per survivor; the per-language accounting aggregates the ledger at
  // release time. No model, no pixels in the loop: media clusters enter
  // as a per-batch (doc_id, cluster_id) frame — exact fingerprints for
  // the oracle row, [[graft.llm.Multimodal.imageNearDupClusters]]-style
  // pixel clusters where a codec is in play (near-dup media clustering
  // across batch boundaries would ride an ANN signature store, the
  // [[StreamingAnn]] machinery — deliberately out of this operator). ----

  /** The idempotent foreachBatch body for the multimodal release.
    * `batch` needs (doc_id, lang, text); `mediaClusters` maps THIS
    * batch's docs to media cluster ids (absent doc_id = no media).
    * A doc survives iff its text hash is novel (across history AND
    * within the batch, min doc_id wins) and its media cluster — when
    * it has one — is novel too. Writes the text-hash and media-cluster
    * stores plus the survivor accounting ledger, each an overwrite of
    * its own `batch=N` partition. */
  def multimodalIngestBatch(spark: SparkSession, textHashPath: String,
      mediaHashPath: String, ledgerPath: String)(
      batch: DataFrame, mediaClusters: DataFrame, batchId: Long): Unit = {
    def prior(path: String): DataFrame =
      StreamingDedup.readHashes(spark, path)
        .map(_.filter(col("batch") < batchId).select("h"))
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          new org.apache.spark.sql.types.StructType()
            .add("h", org.apache.spark.sql.types.StringType)))
    // text policy: one keeper per novel text hash (min doc_id in batch)
    val textNovel = novelTextKeepers(spark, textHashPath)(batch, batchId)
    // media policy: one canonical doc per novel cluster (min doc_id in
    // batch); every OTHER doc of a seen-or-shared cluster drops
    val mc = mediaClusters
      .select(col("doc_id"), col("cluster_id").cast("string").as("h"))
    val mediaCanon = mc.groupBy("h").agg(min("doc_id").as("doc_id"))
    val mediaNovel = graft.Materialize.checkpoint(
      mediaCanon.join(prior(mediaHashPath), Seq("h"), "left_anti"))
    mediaNovel.select("h").write.mode("overwrite")
      .parquet(s"$mediaHashPath/batch=$batchId")
    // a doc with media survives the media policy iff it IS a novel
    // cluster's canonical doc; media-less docs pass trivially
    val mediaDrop = mc.join(broadcast(mediaNovel.select("doc_id")),
      Seq("doc_id"), "left_anti").select("doc_id").distinct()
    val survivors = textNovel
      .join(mediaDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("n_tok"))
    survivors.write.mode("overwrite")
      .parquet(s"$ledgerPath/batch=$batchId")
  }

  /** Cross-batch NEAR-DUP multimodal ingest (VERDICT r11 #4): the
    * exact-fingerprint ingest above lets a batch-2 png→jpeg re-encode
    * of a batch-1 image survive — only byte-identical media crosses
    * batch boundaries. This arm rides a persisted SIGNATURE store (the
    * [[StreamingAnn]] pattern applied to media): every batch writes its
    * decoded image signatures — the sign-LSH bucket plus the
    * luminance-grid feature vector, [[graft.llm.Multimodal
    * .imageFeatureVectors]]'s one definition of "an image's signature"
    * — to `mediaSigPath/batch=N`, and each new batch's media policy is
    *
    *   a doc survives iff it is the min-doc_id canonical of its
    *   WITHIN-BATCH pixel cluster ([[graft.llm.Multimodal
    *   .imageNearDupClusters]]' rule) AND no member of that cluster
    *   near-dups any strictly-earlier batch's stored signature.
    *
    * Under the ascending-doc_id batch convention this reproduces the
    * batch composition's keep set over the union: a union cluster's
    * canonical is its earliest doc, so later batches' members are
    * exactly the ones a cross-batch signature hit removes (spec-pinned
    * on the planted re-encode AND by whole-manifest parity with
    * [[graft.llm.Multimodal.multimodalRelease]] over the union).
    *
    * Scale: signatures are nPlanes bits + dim floats per media doc —
    * the observational index, never pixels; the within-batch pair
    * kernel is the bucketed-never-all-pairs [[graft.llm.Similarity
    * .annPairsOf]] machinery (hot-bucket star guard included); the
    * cross-batch check is ONE equi-join on the bucket key against the
    * store with exact cosine inside the bucket — per bucket the work is
    * |batch ∩ bucket| × |store ∩ bucket|, linear in the store (the
    * candidate-verification cost any LSH pays). The store is written
    * BUCKET-PARTITIONED (`batch=N/bkt=…`, the numeric form of the sign
    * bucket) and the probe lists the batch's ≤ min(2^nPlanes, |batch|)
    * distinct buckets on the driver — a bounded read, the coarse-table
    * collect discipline — so the store scan is STATIC partition
    * pruning: a batch touching b buckets reads b/2^nPlanes of the
    * signature directories, however many batches have accumulated
    * (VERDICT r12 #3, closing the SURVEY §17 "at production scale"
    * note). Replay: every write overwrites its own `batch=N` partition
    * and reads strictly-earlier batches only — the standard contract. */
  def multimodalIngestNearDupBatch(spark: SparkSession,
      textHashPath: String, mediaSigPath: String, ledgerPath: String,
      minSim: Double = 0.9, nPlanes: Int = 8,
      dim: Int = graft.llm.Multimodal.FeatureDim)(
      batch: DataFrame, mediaFeatures: DataFrame, batchId: Long): Unit = {
    import graft.llm.Similarity
    require(nPlanes <= 30,
      s"nPlanes=$nPlanes: the numeric partition bucket is an int")
    val textNovel = novelTextKeepers(spark, textHashPath)(batch, batchId)
    val mf = graft.Materialize.checkpoint(
      mediaFeatures.select(col("vec_id"), col("embedding")))
    val sigs = graft.Materialize.checkpoint(
      Similarity.signBucketTable(mf, nPlanes, dim).join(mf, "vec_id")
        // numeric twin of the bit-string bucket: hive partition values
        // round-trip ints exactly, while "00101" would re-infer as 101
        .withColumn("bkt", conv(col("bucket"), 2, 10).cast("int")))
    sigs.write.mode("overwrite").partitionBy("bkt")
      .parquet(s"$mediaSigPath/batch=$batchId")
    // within-batch pixel clusters; docs in no pair are their own cluster
    val pairs = Similarity.groupedCosinePairs(sigs, "bucket", 256)
      .filter(col("cos_sim") >= minSim)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    val comps = graft.operators.ConnectedComponents.components(pairs)
      .select(col("id").as("doc_id"), col("component").as("cluster"))
    val clusterOf = graft.Materialize.checkpoint(
      mf.select(col("vec_id").as("doc_id"))
        .join(comps, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster")))
    // a cluster is SEEN when any member near-dups an earlier batch's
    // stored signature — the store probe reads ONLY this batch's
    // buckets' partitions (and only strictly-earlier batch dirs): both
    // predicates are partition filters
    val probed = sigs.select("bkt").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ min(2^nPlanes, |batch|)
    val seenClusters =
      priorSignatures(spark, mediaSigPath, batchId, probed) match {
        case Some(prior) =>
          val hits = sigs.join(
              prior.select(col("bkt"), col("embedding").as("pe")),
              Seq("bkt"))
            .filter(round(Similarity.cosine(col("embedding"), col("pe")),
              9) >= minSim)
            .select(col("vec_id").as("doc_id")).distinct()
          clusterOf.join(hits, Seq("doc_id"), "left_semi")
            .select("cluster").distinct()
        case None => clusterOf.filter(lit(false)).select("cluster")
      }
    val canon = clusterOf.groupBy("cluster").agg(min("doc_id").as("doc_id"))
    val mediaKeep = canon.join(seenClusters, Seq("cluster"), "left_anti")
      .select("doc_id")
    val mediaDrop = clusterOf.select("doc_id")
      .join(mediaKeep, Seq("doc_id"), "left_anti")
    textNovel.join(mediaDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("n_tok"))
      .write.mode("overwrite").parquet(s"$ledgerPath/batch=$batchId")
  }

  /** The pruned signature-store probe: strictly-earlier batches,
    * restricted to the probing batch's own buckets — `batch` and `bkt`
    * are BOTH hive partition columns, so the whole predicate is
    * partition pruning (spec-pinned via the executed plan's
    * PartitionFilters). Exposed for the plan guard. */
  private[graft] def priorSignatures(spark: SparkSession,
      mediaSigPath: String, batchId: Long,
      probed: Seq[Int]): Option[DataFrame] =
    StreamingDedup.readStore(spark, mediaSigPath)
      .map(_.filter(col("batch") < batchId &&
        col("bkt").isin(probed: _*)))

  /** Wire a (doc_id, lang, text, …) stream through the incremental
    * multimodal release — the writeStream symmetry the corpus twin has
    * ([[incrementalRelease]]). `mediaClustersOf` maps each microbatch
    * to its (doc_id, cluster_id) media-cluster frame (exact
    * fingerprints, or [[graft.llm.Multimodal.imageNearDupClusters]]
    * output where a codec is in play) — a function because the cluster
    * source is the caller's, computed per batch from the batch. */
  def incrementalMultimodalRelease(docs: DataFrame,
      mediaClustersOf: DataFrame => DataFrame, textHashPath: String,
      mediaHashPath: String, ledgerPath: String,
      checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        multimodalIngestBatch(docs.sparkSession, textHashPath,
          mediaHashPath, ledgerPath)(batch, mediaClustersOf(batch),
          batchId)
      }
      .option("checkpointLocation", checkpoint)

  /** Per-language accounting over everything ingested — equals
    * [[graft.llm.Multimodal.multimodalRelease]] on the union of the
    * ingested batches (spec- and oracle-pinned parity). */
  def multimodalManifest(spark: SparkSession,
      ledgerPath: String, tombPath: Option[String] = None,
      asOf: Option[Long] = None): DataFrame = {
    requireAsOfAboveFold(spark, asOf, Seq(ledgerPath) ++ tombPath)
    StreamingDedup.readStore(spark, ledgerPath) match {
      case Some(led0) =>
        // takedown + as-of, the [[releaseManifest]] rules applied to
        // the media ledger: tombstoned docs leave the accounting, and
        // the content cannot re-enter — BOTH its text hash and its
        // media-cluster fingerprint stay in their stores from original
        // ingest, so a re-upload of removed media is non-novel however
        // it is re-encoded (within the exact-fingerprint policy; the
        // near-dup signature store extends the same property across
        // codecs)
        def cut(df: DataFrame): DataFrame = asOf.map(b =>
          df.filter(col("batch").cast("long") <= b)).getOrElse(df)
        val led1 = cut(led0)
        val led = tombPath
          .flatMap(StreamingDedup.readStore(spark, _)) match {
          case Some(dead) => led1.join(
            broadcast(cut(dead).select("doc_id").distinct()),
            Seq("doc_id"), "left_anti")
          case None => led1
        }
        led.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok").cast("long")).as("tot_tokens"))
          .orderBy("lang")
      case None =>
        import org.apache.spark.sql.types.{LongType, StringType,
          StructType}
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          new StructType().add("lang", StringType)
            .add("n_docs", LongType).add("tot_tokens", LongType))
    }
  }

  /** Driver-contract query (`q_multimodal_release_inc`): three
    * ascending-doc_id microbatches through [[multimodalIngestBatch]],
    * media clusters = the sha256 payload fingerprints of the
    * image-typed docs (the `q_multimodal_release` convention), manifest
    * served from the ledger. The oracle is the batch
    * `q_multimodal_release` SQL VERBATIM — microbatch boundaries are
    * hash-pinned invisible, for BOTH keep policies at once. */
  /** Ascending microbatch slices WITHOUT a global window (VERDICT r14
    * #6): `ntile(n) OVER (ORDER BY doc_id)` funnels the corpus through
    * ONE partition — the source of every `WindowExec: No Partition
    * Defined` warning in a Verify run. For the wholesale-oracle gates
    * the exact boundary is correctness-free: the cross-batch keep-one
    * rule only needs slices MONOTONE in doc_id (the keeper — min
    * doc_id per text hash / media fingerprint — then lands in the
    * earliest slice containing it, matching the oracle's global min),
    * so the cut can be a distributed approximate-quantile pass (one
    * aggregate job, n−1 doubles to the driver, range filters pushed to
    * the scan) instead of a single-partition sort. The AS-OF and DIFF
    * gates keep the ntile window: their oracles name the exact ntile
    * membership, so there the boundary IS load-bearing. */
  private def ascendingSlices(docs: DataFrame, n: Int): Seq[DataFrame] = {
    val cuts = docs.stat.approxQuantile("doc_id",
      (1 until n).map(_.toDouble / n).toArray, 0.001)
    (0 until n).map { i =>
      val lo = if (i == 0) lit(true) else col("doc_id") > cuts(i - 1)
      val hi = if (i == n - 1) lit(true) else col("doc_id") <= cuts(i)
      docs.filter(lo && hi)
    }
  }

  def multimodalReleaseIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val textDir = Files.createTempDirectory("graft-mmtext-")
    val mediaDir = Files.createTempDirectory("graft-mmmedia-")
    val ledgerDir = Files.createTempDirectory("graft-mmledger-")
    try {
      ascendingSlices(docs, 3).zipWithIndex.foreach { case (b, i) =>
        val mc = b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
        multimodalIngestBatch(spark, textDir.toString,
          mediaDir.toString, ledgerDir.toString)(b, mc, i.toLong)
      }
      graft.Materialize.checkpoint(
        multimodalManifest(spark, ledgerDir.toString))
    } finally Seq(textDir, mediaDir, ledgerDir)
      .foreach(ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_multimodal_release_takedown`): the
    * incremental multimodal release with the `doc_id % 13 = 4` slice
    * tombstoned after ingest — the manifest accounting drops the dead
    * docs; the oracle excludes the same slice from the batch release's
    * survivors. Removal is ledger-level by design: a taken-down
    * media-canonical doc does NOT resurrect its previously-dropped
    * duplicates (they were never scored), and its fingerprints stay in
    * the stores so the content cannot re-enter. */
  def multimodalReleaseTakedownQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val textDir = Files.createTempDirectory("graft-mmtdtext-")
    val mediaDir = Files.createTempDirectory("graft-mmtdmedia-")
    val ledgerDir = Files.createTempDirectory("graft-mmtdledger-")
    val tombDir = Files.createTempDirectory("graft-mmtdtomb-")
    try {
      ascendingSlices(docs, 3).zipWithIndex.foreach { case (b, i) =>
        val mc = b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
        multimodalIngestBatch(spark, textDir.toString,
          mediaDir.toString, ledgerDir.toString)(b, mc, i.toLong)
      }
      releaseTakedownBatch(spark, tombDir.toString)(
        docs.filter(pmod(col("doc_id"), lit(13)) === 4), 3L)
      graft.Materialize.checkpoint(
        multimodalManifest(spark, ledgerDir.toString,
          tombPath = Some(tombDir.toString)))
    } finally Seq(textDir, mediaDir, ledgerDir, tombDir)
      .foreach(ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_corpus_release_inc`): split `dir`'s
    * documents into three ascending-doc_id microbatches, run each
    * through [[releaseIngestBatch]] against the process-shared LM
    * (the SAME frozen model the batch row serves from — one training
    * job covers both), and serve [[releaseManifest]] from the score
    * ledger. The oracle is the batch `q_corpus_release` SQL VERBATIM:
    * the driver's DuckDB replay of the wholesale composition
    * hash-pins that microbatching is invisible. The manifest is
    * eagerly checkpointed before the scratch stores are deleted. */
  def corpusReleaseIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val hashDir = Files.createTempDirectory("graft-relhash-")
    val scoreDir = Files.createTempDirectory("graft-relscore-")
    try {
      val ingest = releaseIngestBatch(spark, lmStore,
        hashDir.toString, scoreDir.toString) _
      ascendingSlices(docs, 3).zipWithIndex.foreach { case (b, i) =>
        ingest(b, i.toLong)
      }
      graft.Materialize.checkpoint(
        releaseManifest(spark, scoreDir.toString))
    } finally Seq(hashDir, scoreDir).foreach(
      ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_corpus_release_takedown`): the
    * incremental release with a TAKEDOWN in force — three microbatch
    * ingests, then the `doc_id % 11 = 5` slice tombstoned, manifest
    * served over the survivors. The oracle is the wholesale release
    * SQL with the dead slice excluded from the keepers before the
    * tertile gate: a hash match pins that the takedown re-releases
    * exactly as a from-scratch release over the surviving corpus
    * would (tertile boundaries move with the survivors). */
  def corpusReleaseTakedownQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val hashDir = Files.createTempDirectory("graft-tdhash-")
    val scoreDir = Files.createTempDirectory("graft-tdscore-")
    val tombDir = Files.createTempDirectory("graft-tdtomb-")
    try {
      val ingest = releaseIngestBatch(spark, lmStore,
        hashDir.toString, scoreDir.toString) _
      ascendingSlices(docs, 3).zipWithIndex.foreach { case (b, i) =>
        ingest(b, i.toLong)
      }
      releaseTakedownBatch(spark, tombDir.toString)(
        docs.filter(pmod(col("doc_id"), lit(11)) === 5), 3L)
      graft.Materialize.checkpoint(
        releaseManifest(spark, scoreDir.toString,
          tombPath = Some(tombDir.toString)))
    } finally Seq(hashDir, scoreDir, tombDir).foreach(
      ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_corpus_release_folded`, VERDICT r14
    * #1): the incremental release with the LEDGER FOLD live
    * mid-ingest. Four ascending microbatches; after the third,
    * [[compactReleaseLedgers]] folds score + hash batches {0,1} into
    * `batch=1` (the marker `_folded_upto` advances first), the fourth
    * ingests AGAINST the folded stores (novelty keepers resolve over
    * the folded hash set), and the manifest serves over the folded +
    * live partitions. The fold is a set-semantics merge, so the
    * release is bit-identical to a never-folded run — the oracle is
    * the wholesale release SQL VERBATIM, hash-pinning it. The gate
    * REQUIRES the fold physically fired (both stores folded, the
    * pre-fold batch dirs gone) so a green row proves storage was
    * reclaimed, not merely that folding is available. */
  def corpusReleaseFoldedQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val hashDir = Files.createTempDirectory("graft-relfoldhash-")
    val scoreDir = Files.createTempDirectory("graft-relfoldscore-")
    try {
      // ascending slices: the cross-batch keep-one invariant (oracle
      // keeper = min doc_id per hash) needs each hash's first sight to
      // be its smallest doc_id's batch
      val slices = ascendingSlices(docs, 4)
      val ingest = releaseIngestBatch(spark, lmStore,
        hashDir.toString, scoreDir.toString) _
      (0 until 3).foreach(i => ingest(slices(i), i.toLong))
      val folded = compactReleaseLedgers(spark, scoreDir.toString,
        hashDir.toString, 1L)
      require(folded.toSet ==
        Set(scoreDir.toString, hashDir.toString),
        s"ledger fold did not fire on both stores: $folded")
      Seq(scoreDir, hashDir).foreach { d =>
        require(StreamingDedup.listBatches(spark, d.toString)
          .map(_._1).sorted == Seq(1L, 2L),
          s"fold left pre-fold batch dirs in $d")
      }
      ingest(slices(3), 3L)
      graft.Materialize.checkpoint(
        releaseManifest(spark, scoreDir.toString))
    } finally Seq(hashDir, scoreDir).foreach(
      ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_multimodal_release_folded`): the
    * multimodal twin of [[corpusReleaseFoldedQuery]] — four ascending
    * microbatches through the MAINTENANCE loop
    * ([[multimodalMaintainBatch]], fold dial foldEvery=2/keepRecent=1),
    * whose own volume arm folds text-hash + media-fingerprint +
    * ledger batches {0,1} into `batch=1` mid-ingest; the later batches
    * ingest AGAINST the folded stores (BOTH novelty policies — text
    * keep-one and media-canonical — resolve over folded fingerprint
    * sets), and the manifest serves over folded + live partitions.
    * The fold is a set-semantics merge, so the oracle is the
    * wholesale multimodal release SQL VERBATIM. The gate REQUIRES the
    * fold physically fired on all three stores (pre-fold dirs gone). */
  def multimodalReleaseFoldedQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val textDir = Files.createTempDirectory("graft-mmfoldtext-")
    val mediaDir = Files.createTempDirectory("graft-mmfoldmedia-")
    val ledgerDir = Files.createTempDirectory("graft-mmfoldledger-")
    try {
      val body = multimodalMaintainBatch(spark, textDir.toString,
        mediaDir.toString, ledgerDir.toString, foldEvery = 2L,
        keepRecent = 1L) _
      ascendingSlices(docs, 4).zipWithIndex.foreach { case (b, i) =>
        val mc = b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
        body(b, mc, i.toLong)
      }
      // the dial fired at batch 2 (fold ≤ 1): {0,1} → 1 in all three
      // stores, batch 3 then ingested against the folded sets
      Seq(textDir, mediaDir, ledgerDir).foreach { d =>
        require(ledgerFoldBoundary(spark, d.toString) == Some(1L),
          s"maintenance fold did not fire on $d")
        require(StreamingDedup.listBatches(spark, d.toString)
          .map(_._1).sorted == Seq(1L, 2L, 3L),
          s"fold left pre-fold batch dirs in $d")
      }
      graft.Materialize.checkpoint(
        multimodalManifest(spark, ledgerDir.toString))
    } finally Seq(textDir, mediaDir, ledgerDir)
      .foreach(ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_multimodal_release_asof`): the media
    * manifest time-traveled — three ascending ntile microbatches
    * through [[multimodalIngestBatch]], the accounting served as-of
    * batch 1. The oracle is the multimodal release SQL with survivors
    * restricted to the first two ntile slices: ascending slices put
    * every text keeper AND every media-canonical doc in the earliest
    * slice containing its fingerprint, so the as-of read equals the
    * release that shipped before batch 2 for BOTH keep policies. */
  def multimodalReleaseAsOfQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val textDir = Files.createTempDirectory("graft-mmasoftext-")
    val mediaDir = Files.createTempDirectory("graft-mmasofmedia-")
    val ledgerDir = Files.createTempDirectory("graft-mmasofledger-")
    try {
      // the ntile window is LOAD-BEARING here (kept despite VERDICT
      // r14 #6): the as-of oracle restricts survivors to the first two
      // ntile(3) slices by that exact SQL, so the slice boundary must
      // be the oracle's
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(3).over(w))
        .localCheckpoint(true)
      (1 to 3).foreach { s =>
        val b = sliced.filter(col("__s") === s).drop("__s")
        val mc = b.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(substring(col("text"), 1, 16).cast("binary"), 256)
              .as("cluster_id"))
        multimodalIngestBatch(spark, textDir.toString,
          mediaDir.toString, ledgerDir.toString)(b, mc, s - 1L)
      }
      graft.Materialize.checkpoint(
        multimodalManifest(spark, ledgerDir.toString,
          asOf = Some(1L)))
    } finally Seq(textDir, mediaDir, ledgerDir)
      .foreach(ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_corpus_release_asof`): the manifest
    * TIME-TRAVELED to batch 1 — three ascending-doc_id microbatches
    * ingested, the manifest served as-of the second, i.e. the release
    * that actually shipped before batch 2 arrived. The oracle is the
    * wholesale release SQL restricted to the first two ntile slices
    * (the same ntile rule the slicing used), pinning that an as-of
    * read equals a release over only the docs ingested by then. */
  def corpusReleaseAsOfQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val hashDir = Files.createTempDirectory("graft-asofhash-")
    val scoreDir = Files.createTempDirectory("graft-asofscore-")
    try {
      // the ntile window is LOAD-BEARING here (kept despite VERDICT
      // r14 #6): the as-of oracle restricts keepers to the first two
      // ntile(3) slices by that exact SQL, so the slice boundary must
      // be the oracle's
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(3).over(w))
        .localCheckpoint(true)
      val ingest = releaseIngestBatch(spark, lmStore,
        hashDir.toString, scoreDir.toString) _
      (1 to 3).foreach { s =>
        ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L)
      }
      graft.Materialize.checkpoint(
        releaseManifest(spark, scoreDir.toString, asOf = Some(1L)))
    } finally Seq(hashDir, scoreDir).foreach(
      ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_corpus_release_pinned`): the TAG-PINNED
    * fold floor inside one hash-checked gate — the maintenance loop's
    * own fold arm fires with a snapshot tag pinned at batch 1 and the
    * tag store wired ([[compactReleaseLedgers]] `tagPath`), so the
    * boundary FLOORS at the tag (REQUIREd: boundary 1 where the dials
    * alone said 2, and the pre-floor dirs physically merged) and the
    * tagged serve is still servable — where the unpinned fold would
    * have REFUSED it. The serve is [[releaseManifestAt]] at the tag;
    * the oracle is the as-of release SQL (first two of four ntile
    * slices) VERBATIM: maintenance provably cannot orphan a tagged
    * snapshot. */
  def corpusReleasePinnedQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val lmStore = TextOps.sharedLmFor(spark, dir)
    val hashDir = Files.createTempDirectory("graft-pinhash-")
    val scoreDir = Files.createTempDirectory("graft-pinscore-")
    val tagDir = Files.createTempDirectory("graft-pintags-")
    try {
      // ntile is LOAD-BEARING (the VERDICT r14 #6 keeper rule): the
      // oracle names the first two ntile(4) slices by this exact SQL
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(4).over(w))
        .localCheckpoint(true)
      val body = releaseMaintainBatch(spark, lmStore, hashDir.toString,
        scoreDir.toString, foldEvery = 3L, keepRecent = 1L,
        tagPath = Some(tagDir.toString)) _
      body(sliced.filter(col("__s") === 1).drop("__s"), 0L)
      body(sliced.filter(col("__s") === 2).drop("__s"), 1L)
      // the snapshot a training run pinned — BEFORE the fold fires
      tagSnapshot(spark, tagDir.toString, "train-1", 1L)
      body(sliced.filter(col("__s") === 3).drop("__s"), 2L)
      body(sliced.filter(col("__s") === 4).drop("__s"), 3L) // fold fires
      // the fold FIRED (dirs merged) but floored at the tag: the dials
      // alone (batch 3 − keepRecent 1) said boundary 2
      require(ledgerFoldBoundary(spark, scoreDir.toString) == Some(1L),
        "the fold ignored the tag pin (or never fired)")
      val dirsLeft = StreamingDedup
        .listBatches(spark, scoreDir.toString).size
      require(dirsLeft == 3,
        s"expected batch dirs {1,2,3} after the floored fold, got $dirsLeft")
      graft.Materialize.checkpoint(releaseManifestAt(spark,
        scoreDir.toString, tagDir.toString, "train-1"))
    } finally Seq(hashDir, scoreDir, tagDir).foreach(
      ModelStore.deleteRecursively)
  }
}
