package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.llm.Similarity
import graft.store.ModelStore

/** Incremental ANN index maintenance on ingest (VERDICT r6 #2) — the
  * vector-side analogue of [[StreamingDedup]]'s signature store: the
  * quantizers (coarse centroids + PQ codebooks) are TRAINED ONCE on a
  * base corpus and persisted ([[Similarity.saveIvfPqIndex]]); each
  * microbatch of newly ingested vectors is ASSIGNED to the frozen coarse
  * cells and PQ-ENCODED (two broadcast joins, zero training jobs), and
  * the coded rows land in a `batch=N` parquet store with the signature
  * store's replay contract — overwrite your own partition, read nothing
  * newer. Search unions the base index's codes with every streamed
  * increment through the ONE probe+ADC body
  * ([[Similarity.ivfPqSearchOver]]).
  *
  * Because PQ encoding is pointwise per vector under frozen quantizers,
  * encoding increments separately IS encoding their union — incremental
  * search is bit-identical to a batch re-encode of everything
  * (StreamingAnnSpec pins this), and a replayed microbatch rewrites the
  * same deterministic rows (effectively-once).
  *
  * What this deliberately does NOT do: re-train the quantizers as the
  * distribution drifts. That is a base-index REBUILD (a new ModelStore
  * version + re-encode — the serve path then flips atomically), the
  * standard split in production ANN systems: cheap per-increment
  * assignment continuously, expensive retraining rarely.
  */
object StreamingAnn {

  /** Assign+encode one increment against the frozen quantizers and write
    * it to `codesPath/batch=N` — idempotent foreachBatch body (the
    * [[StreamingDedup.dedupBatch]] replay contract). Dispatches on the
    * store's own `variant` dial ([[Similarity.encodeForIndex]]): a
    * residual store gets residual codes, a raw store raw codes —
    * incremental maintenance of BOTH variants through one body.
    *
    * Increments are written CELL-PARTITIONED (`batch=N/cid=…`), the same
    * FAISS inverted-list layout the base index stores its codes in
    * ([[Similarity.codedFrame]]): the serve paths' probe filter prunes
    * increment files physically, exactly like the base — without this
    * the increment leg of every query scanned all streamed cells and
    * filtered rows afterward (VERDICT r12 #2). An empty microbatch
    * leaves a file-less partition dir, which [[StreamingDedup.readStore]]
    * skips. */
  def annIngestBatch(spark: SparkSession, store: ModelStore,
      codesPath: String, m: Int = 4, dim: Int = 64)(
      batch: DataFrame, batchId: Long): Unit =
    Similarity.encodeForIndex(store, batch, m, dim)
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$codesPath/batch=$batchId")

  /** Wire a (vec_id, embedding) stream through the incremental encode. */
  def incrementalAnnIngest(vecs: DataFrame, store: ModelStore,
      codesPath: String, checkpoint: String, m: Int = 4,
      dim: Int = 64): DataStreamWriter[Row] =
    vecs.writeStream
      .foreachBatch(annIngestBatch(vecs.sparkSession, store, codesPath,
        m, dim) _)
      .option("checkpointLocation", checkpoint)

  // ---- DELETES (tombstones): the third mutation a live index must
  // serve — adds (annIngestBatch), updates (latest batch wins), and now
  // removals (FAISS remove_ids / the takedown a training-data pipeline
  // is legally required to honor). A delete is a TOMBSTONE row
  // (vec_id, batch=N) in its own parquet store, written with the same
  // replay contract as the increments (overwrite your own partition);
  // the serve-side winners rule resolves the merged timeline — the
  // LATEST action per vec_id wins, so a tombstone hides every older
  // base/increment row and a later re-insert resurrects the id.
  //
  // The tombstone store is GLOBAL, not per index version: foreachBatch
  // batchIds are monotone across rebuild/compaction version flips, so
  // tombstone batch numbers stay comparable with increment batch
  // numbers forever — and a version flip can never resurrect a deleted
  // id out of the (also global) raw-increment store, the LSM
  // resurrection bug a per-version tombstone dir would ship.
  // COMPARABLE means ONE batchId domain: deletes must ride the same
  // stream as the inserts (the CDC upsert loop) or share its counter —
  // a separate delete stream with its own checkpoint numbers tombstones
  // in a different clock, which corrupts both the winners rule and,
  // worse since r14, the fold watermark (a tombstone clock running
  // ahead would mark unfolded insert batches as folded). Tombstones
  // are purgeable exactly when the raw increments carrying the id are
  // (both fold away only at a base-corpus rewrite, which the caller
  // owns); until then each costs 16 bytes. Physical removal from the
  // SERVED artifacts happens at [[compactIncrements]] — a compacted
  // version simply lacks the dead rows. ----

  /** Write one microbatch of deletions as a tombstone batch —
    * idempotent foreachBatch body (`batch` needs only a vec_id
    * column). */
  def annDeleteBatch(spark: SparkSession, tombPath: String)(
      batch: DataFrame, batchId: Long): Unit =
    batch.select("vec_id").distinct()
      .write.mode("overwrite").parquet(s"$tombPath/batch=$batchId")

  /** CDC-style ingest: one microbatch carrying BOTH upserts and
    * deletes, routed by its `op` column (rows with op = "d" become
    * tombstones; everything else encodes as an insert). Both writes
    * share the batch id, which is what makes the delete/insert timeline
    * totally ordered. Within a single batch a vec_id carrying both an
    * insert and a delete resolves to DELETED (the insert is dropped
    * here, and the serve rule's strict `>` agrees) — the deterministic
    * choice, documented rather than racy. */
  def annUpsertBatch(spark: SparkSession, store: ModelStore,
      codesPath: String, tombPath: String, m: Int = 4, dim: Int = 64)(
      batch: DataFrame, batchId: Long): Unit = {
    val dels = batch.filter(col("op") === "d").select("vec_id")
      .distinct().localCheckpoint(true) // tombstone write + anti-join
    annDeleteBatch(spark, tombPath)(dels, batchId)
    annIngestBatch(spark, store, codesPath, m, dim)(
      batch.filter(col("op") =!= "d")
        .join(broadcast(dels), Seq("vec_id"), "left_anti")
        .select("vec_id", "embedding"),
      batchId)
  }

  /** Wire a (vec_id, embedding, op) CDC stream through the
    * upsert/delete ingest. */
  def incrementalAnnUpsert(vecs: DataFrame, store: ModelStore,
      codesPath: String, tombPath: String, checkpoint: String,
      m: Int = 4, dim: Int = 64): DataStreamWriter[Row] =
    vecs.writeStream
      .foreachBatch(annUpsertBatch(vecs.sparkSession, store, codesPath,
        tombPath, m, dim) _)
      .option("checkpointLocation", checkpoint)

  // ---- FOLD WATERMARK (ADVICE r13, high): a compaction or rebuild
  // FOLDS the resolved effect of every increment and tombstone batch
  // it read into the new version's base artifacts. The base rows carry
  // no batch numbers, so re-applying an already-folded tombstone
  // against them has no batch comparison to save it — it would
  // anti-join out an id the fold legitimately resurrected (delete →
  // re-insert → compact: the alive row is IN the base, the stale
  // tombstone would hide it). Each folding write therefore records the
  // MAX BATCH IT FOLDED as the single-row `folded` part, and every
  // serve filters BOTH stores to batches strictly ABOVE the served
  // version's watermark: stale tombstones cannot re-kill folded
  // resurrections, and a replayed pre-fold insert batch (whose effect
  // is already in the base) is partition-pruned out rather than
  // re-served against a purged tombstone — the two directions of the
  // same staleness bug, closed by one number. ----

  // per-(store, version, key) metadata cache: a saved version is
  // immutable (every save writes a NEW version dir), so its fold
  // watermark and spill dial never change — the serving hot path reads
  // each once per process instead of paying a directory listing plus a
  // 1-row parquet head() job per query (review r14)
  private val versionMeta =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String),
      Long]()

  /** The served version's fold watermark: the max increment/tombstone
    * batch folded into its base artifacts, or -1 when the version never
    * folded streamed state (legacy and batch-built versions — for them
    * every batch applies, today's behavior). Cached per version. */
  private def foldedWatermark(store: ModelStore,
      version: Option[Long]): Long =
    version.orElse(store.currentVersion) match {
      case Some(v) =>
        // cache only versions that EXIST on disk: a lookup against a
        // missing version (a stale/future pin probed by purgeFolded)
        // must not pin -1 forever — if that version number later
        // materializes WITH a `folded` part, a cached -1 would make
        // same-process serves re-apply already-folded tombstones and
        // batches, the exact staleness the watermark closes (ADVICE
        // r14). A missing version reads -1 uncached and is re-read
        // once it exists; an existing version is immutable, so its
        // answer (folded part present or not) is safe to cache.
        val parts = store.partNamesAt(v)
        if (parts.isEmpty) -1L
        else versionMeta.computeIfAbsent((store.rootPath, v, "folded"),
          _ =>
            if (parts.contains("folded"))
              store.loadAt(v, "folded").select("folded_max")
                .head().getLong(0)
            else -1L)
      case None => -1L
    }

  /** The one-row `folded` part a folding write persists. */
  private def foldedPart(spark: SparkSession, foldedMax: Long): DataFrame =
    spark.range(1).select(lit(foldedMax).as("folded_max"))

  /** Max `batch=N` partition of a store, from one driver directory
    * listing — the fold-watermark input; None when the store has no
    * batches yet. */
  private def maxBatchIn(spark: SparkSession,
      storePath: String): Option[Long] =
    StreamingDedup.listBatches(spark, storePath).map(_._1).maxOption

  /** Max tombstone batch per deleted vec_id, or None when nothing was
    * ever deleted — one aggregate over the tombstones' two columns.
    * `asOf` restricts to tombstones at or before that batch (the
    * time-travel read: a later delete has not happened yet);
    * `minExclusive` drops tombstones a fold already applied (the
    * watermark rule — both cuts are partition pruning). */
  private def readTombs(spark: SparkSession,
      tombPath: Option[String],
      asOf: Option[Long] = None,
      minExclusive: Long = -1L): Option[DataFrame] =
    tombPath.flatMap(StreamingDedup.readStore(spark, _))
      .map { t0 =>
        val t1 = asOf.map(b =>
          t0.filter(col("batch").cast("long") <= b)).getOrElse(t0)
        // never-folded stores (wm = -1) keep their exact prior plan —
        // no vacuous partition filter
        val t = if (minExclusive >= 0)
          t1.filter(col("batch").cast("long") > minExclusive) else t1
        t.groupBy("vec_id")
          .agg(max(col("batch").cast("long")).as("__bd"))
      }

  /** Latest-action-wins resolution of insert batches vs tombstones:
    * returns (alive winners (vec_id, __b) — the insert batch that
    * survives, i.e. no tombstone at or after it; touched (vec_id) —
    * every id with ANY action, which the base must drop either way).
    * With no tombstones this degenerates to the plain max-batch
    * winners rule. Both frames are narrow aggregates over the
    * increments' and tombstones' cheapest columns — the broadcast
    * ceiling is |increment ids| + |deleted ids|, bounded by compaction
    * for the former and the caller's tombstone-purge policy for the
    * latter. */
  private def resolveWinners(ins: DataFrame,
      tombs: Option[DataFrame]): (DataFrame, DataFrame) = {
    val insWin = ins.groupBy("vec_id")
      .agg(max(col("batch").cast("long")).as("__b"))
    tombs match {
      case Some(del) =>
        // left-outer + filter, NOT a full-outer merge: a full outer
        // join cannot broadcast either side and sort-merges even two
        // tiny aggregates; `touched` needs no join at all (union +
        // distinct of two narrow id columns)
        (insWin.join(broadcast(del), Seq("vec_id"), "left_outer")
          .filter(col("__bd").isNull || col("__b") > col("__bd"))
          .select("vec_id", "__b"),
          insWin.select("vec_id")
            .unionByName(del.select("vec_id")).distinct())
      case None => (insWin, insWin.select("vec_id"))
    }
  }

  // ---- drift-triggered rebuild signal (VERDICT r7 #7): incremental
  // ingest deliberately never retrains the quantizers, which makes
  // staleness the design's open question. This closes the loop: the
  // per-vector ASSIGNMENT RESIDUAL (squared L2 to the assigned frozen
  // centroid, [[Similarity.assignDistances]]) is the observable — a
  // drifted ingest lands far from every centroid, shifting the residual
  // distribution right — and the monitor is the SAME persisted-PSI
  // machinery the value-drift tests use (shared bucket/smoothing/term
  // rules, so "drift" means one thing engine-wide). Reference = the
  // residual histogram of a HELD-OUT calibration slice the quantizer
  // did NOT train on; each increment scores against it and trips a
  // rebuild gate at the conventional PSI 0.2. The gate OBSERVES; the
  // rebuild itself stays the explicit base-index rebuild + atomic
  // version flip. ----

  /** Snapshot the drift reference at index-build time: bucket edges
    * (vmin, vmax) and histogram (bucket, c_ref) of the `calib` slice's
    * assignment residuals, persisted beside (not inside) the index —
    * its own store so re-snapshotting the monitor never rewrites the
    * serving artifacts.
    *
    * `calib` MUST be held out of the quantizer's training set
    * ([[Similarity.saveIvfPqIndexTrainedOn]] /
    * [[buildIndexWithDriftReference]]): in-sample residuals are
    * systematically smaller than any future increment's (the centroids
    * were fit to minimize exactly them), so an in-sample reference
    * makes a stationary held-out increment look drifted — r8 shipped
    * that miscalibration and the gate fired on everything (PSI 0.67 on
    * same-distribution data; VERDICT r8 #1). Out-of-sample residuals
    * are exchangeable with a same-distribution increment's, so PSI ≈ 0
    * means "same distribution as future ingest". Out-of-range
    * residuals clamp into the extreme buckets on BOTH sides of the
    * comparison (StatTests.bucketCol), so the reference's top bucket
    * carries the out-of-sample tail a stationary increment also
    * produces. */
  def saveDriftReference(calib: DataFrame, indexStore: ModelStore,
      driftStore: ModelStore, buckets: Int = 10): Long = {
    val dist = Similarity.assignDistances(calib, indexStore.load("coarse"))
      .localCheckpoint(true) // edges + histogram both read it
    val edges = dist.agg(min("d").as("vmin"), max("d").as("vmax"))
      .localCheckpoint(true) // histogram reads it too
    val hist = dist.crossJoin(broadcast(edges))
      .select(graft.operators.StatTests.bucketCol(col("d"), col("vmin"),
        col("vmax"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_ref"))
    driftStore.save(Map("drift_edges" -> edges, "drift_hist" -> hist))
  }

  /** The correctly-calibrated build, as ONE call: deterministically
    * split `emb` into a training slice and a held-out calibration
    * slice (every `calibMod`-th vec_id), train the quantizers on the
    * training slice only, encode the FULL corpus (held-out vectors are
    * still indexed — holding out affects what the quantizer LEARNS
    * from, never what the index SERVES), and snapshot the drift
    * reference from the held-out slice's residuals. Returns the index
    * version written. At 100 TB the 1/calibMod calibration pass is
    * noise next to the encode pass, and the quantizer training on
    * (calibMod−1)/calibMod of the data is the standard FAISS
    * sample-training shape anyway. */
  def buildIndexWithDriftReference(emb: DataFrame, indexStore: ModelStore,
      driftStore: ModelStore, calibMod: Int = 10, buckets: Int = 10,
      kCells: Int = 4, m: Int = 4, k: Int = 8, iters: Int = 2,
      dim: Int = 64, spill: Int = 1, variant: String = "raw",
      foldedMax: Option[Long] = None): Long = {
    require(calibMod >= 2, s"calibMod=$calibMod must leave a training slice")
    val calib = emb.filter(pmod(col("vec_id"), lit(calibMod)) === 0)
    val train = emb.filter(pmod(col("vec_id"), lit(calibMod)) =!= 0)
    // a REBUILD over a folded corpus records its fold watermark beside
    // the artifacts (the `folded` part — see the FOLD WATERMARK note):
    // the rebuilt base reflects every increment/tombstone batch the
    // rebuild corpus resolved, so serves must not re-apply them
    val extra = foldedMax
      .map(w => Map("folded" -> foldedPart(emb.sparkSession, w)))
      .getOrElse(Map.empty[String, DataFrame])
    // the drift observable (assignment residual against the coarse
    // table) is variant-independent, so the reference snapshot below is
    // shared; only the PQ-encoding arm dispatches
    val v = variant match {
      case "residual" =>
        require(spill == 1,
          "residual indexes are single-assigned (spill=1): the " +
            "residual-of-THE-cell is what ADC corrects")
        Similarity.saveIvfPqResidualIndexTrainedOn(train, emb,
          indexStore, kCells, m, k, iters, dim, extraParts = extra)
      case _ => Similarity.saveIvfPqIndexTrainedOn(train, emb,
        indexStore, kCells, m, k, iters, dim, spill, extraParts = extra)
    }
    saveDriftReference(calib, indexStore, driftStore, buckets)
    v
  }

  /** Score one increment's assignment residuals against the persisted
    * reference → ONE row (n_cur, psi, rebuild). Work per increment:
    * one broadcast assign over the batch + a ≤ `buckets`-row PSI
    * combine ([[StreamingDrift.psiReport]] — the shared rule). */
  def quantizerDriftGate(indexStore: ModelStore, driftStore: ModelStore,
      increment: DataFrame, threshold: Double = 0.2,
      buckets: Int = 10): DataFrame = {
    val curCounts = Similarity
      .assignDistances(increment, indexStore.load("coarse"))
      .crossJoin(broadcast(driftStore.load("drift_edges")))
      .select(graft.operators.StatTests.bucketCol(col("d"), col("vmin"),
        col("vmax"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_cur"))
    StreamingDrift.psiReport(driftStore.load("drift_hist"), curCounts,
      buckets)
      .agg(sum("c_cur").as("n_cur"),
        round(sum("psi_term"), 6).as("psi"))
      .select(col("n_cur"), col("psi"),
        (col("psi") > threshold).as("rebuild"))
  }

  /** foreachBatch body composing ingest + monitoring: encode the
    * increment into `codesPath/batch=N` AND append its one-row drift
    * report to `monitorPath/batch=N` — both partition-overwrite writes,
    * so a re-delivered batch rewrites the same rows (the replay
    * contract holds for the monitor too). */
  def annIngestWithDriftBatch(spark: SparkSession, indexStore: ModelStore,
      driftStore: ModelStore, codesPath: String, monitorPath: String,
      threshold: Double = 0.2, m: Int = 4, dim: Int = 64)(
      batch: DataFrame, batchId: Long): Unit = {
    annIngestBatch(spark, indexStore, codesPath, m, dim)(batch, batchId)
    quantizerDriftGate(indexStore, driftStore, batch, threshold)
      .write.mode("overwrite").parquet(s"$monitorPath/batch=$batchId")
  }

  /** The streamed coded rows (vec_id, cid, c0..c{m-1}, ux), or None
    * before the first increment — codes plus the unit-vector rerank
    * payload; the base corpus's raw parquet is never re-read. */
  def readCodes(spark: SparkSession, codesPath: String): Option[DataFrame] =
    StreamingDedup.readStore(spark, codesPath).map(_.drop("batch"))

  // ---- automated rebuild (VERDICT r9 #3): the loop above is complete
  // but human-in-the-loop — annIngestWithDriftBatch WRITES the monitor
  // row and an operator runs the rebuild. This closes it: the ingest
  // body itself consumes the gate and, on rebuild=true, retrains on
  // base ∪ every raw increment ingested so far, snapshots a fresh
  // held-out drift reference, and flips the index version atomically —
  // the ONLY trigger is the drifted microbatch itself. ----

  /** Increment codes live in a PER-INDEX-VERSION subdirectory: a rebuild
    * flips the store's `_CURRENT` pointer, which atomically selects a
    * fresh (empty) increment dir — codes encoded under the OLD
    * quantizers can never shadow the rebuilt base's rows (their cell
    * ids are meaningless under the new coarse table). Pre-rebuild
    * increments are not lost: their raw vectors were folded into the
    * rebuilt base corpus. */
  def versionedCodesPath(codesPath: String, store: ModelStore): String =
    s"$codesPath/v=${store.currentVersion.getOrElse(0L)}"

  /** The rebuild corpus: `base` plus every raw increment persisted so
    * far, one row per vec_id — latest batch wins, base loses to any
    * increment (the [[searchIncremental]] re-delivery rule, applied to
    * raw vectors). Expressed through the same narrow-winners joins as
    * the serve union ([[unionServeFrames]]): the winner table is one
    * aggregate over the increments' (vec_id, batch) columns, the base
    * loses by one anti-join — never a window over base ∪ increments.
    *
    * `aboveBatch` is the BASE's own fold watermark when `base` is
    * itself a fold of earlier batches (the [[annAutopilot]] rewritten
    * base corpus): batches at or below it are already resolved INTO
    * `base`, so both stores filter strictly above it — the serve-side
    * watermark rule applied to the fold itself. Without the filter a
    * stale sub-watermark directory (a [[purgeFolded]] crash between
    * the per-store drops, or a batch re-delivered from below the purge
    * floor) would be re-resolved against a base that already folded
    * its effects: a lone stale tombstone re-kills a later re-insert,
    * a lone stale insert resurrects a later takedown. −1 (the
    * never-folded default) keeps the exact prior plan. */
  private[graft] def rebuildCorpus(spark: SparkSession,
      base: DataFrame, rawPath: String,
      tombPath: Option[String] = None,
      aboveBatch: Long = -1L): DataFrame = {
    val tombs = readTombs(spark, tombPath, minExclusive = aboveBatch)
    val raw = StreamingDedup.readStore(spark, rawPath).map(r =>
      if (aboveBatch >= 0)
        r.filter(col("batch").cast("long") > aboveBatch)
      else r)
    (raw, tombs) match {
      case (None, None) => base.select("vec_id", "embedding")
      case (None, Some(del)) =>
        // deletions with no raw increments: the retrain corpus is the
        // base minus the dead ids — a rebuilt index must not re-learn
        // (or re-serve) vectors a takedown removed
        base.select("vec_id", "embedding")
          .join(broadcast(del.select("vec_id")), Seq("vec_id"),
            "left_anti")
      case (Some(raw), _) =>
        val (alive, touched) = resolveWinners(raw, tombs)
        val rawWin = raw.withColumn("__b", col("batch").cast("long"))
          .join(broadcast(alive), Seq("vec_id", "__b"))
          .select("vec_id", "embedding")
        base.select("vec_id", "embedding")
          .join(broadcast(touched), Seq("vec_id"), "left_anti")
          .unionByName(rawWin)
    }
  }

  /** Fully-automated drift loop as ONE foreachBatch body: persist the
    * raw increment (replay contract: overwrite your own partition),
    * encode + monitor via [[annIngestWithDriftBatch]] into the CURRENT
    * version's codes dir, then consume the monitor row just written —
    * when the gate fired, rebuild via [[buildIndexWithDriftReference]]
    * on base ∪ all raw increments (re-calibrated reference from a fresh
    * held-out slice) and flip the version. Post-rebuild batches encode
    * against the new quantizers into the new version's codes dir.
    *
    * Raw increments cost 4·dim bytes/vector of store — the price of
    * being able to retrain at all; production systems keep exactly this
    * (the vectors ARE the corpus). The rebuild pass is the expensive
    * rare arm of the split documented at the top of this object:
    * per-increment cost stays two broadcast joins + a ≤10-row PSI
    * combine until the gate fires. */
  def annAutoRebuildBatch(spark: SparkSession, indexStore: ModelStore,
      driftStore: ModelStore, base: DataFrame, codesPath: String,
      monitorPath: String, rawPath: String, calibMod: Int = 4,
      threshold: Double = 0.2, buckets: Int = 10, kCells: Int = 4,
      m: Int = 4, k: Int = 8, iters: Int = 2, dim: Int = 64,
      minRebuildN: Long = 50L, autoDial: Boolean = false,
      tombPath: Option[String] = None,
      baseFoldedMax: Long = -1L)(
      batch: DataFrame, batchId: Long): Unit = {
    batch.select("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$rawPath/batch=$batchId")
    annIngestWithDriftBatch(spark, indexStore, driftStore,
      versionedCodesPath(codesPath, indexStore), monitorPath, threshold,
      m, dim)(batch, batchId)
    val mon = spark.read.parquet(s"$monitorPath/batch=$batchId")
      .select("rebuild", "n_cur").collect().head
    // n_cur floor (ADVICE r10): a tiny or empty microbatch leaves most
    // reference buckets at c_cur=0, so its PSI is noise-dominated (an
    // EMPTY batch maxes it out) — retraining the whole index on that
    // evidence is thrash, not maintenance. The gate needs both the
    // statistic AND enough samples behind it (~5 per bucket).
    val fired = mon.getBoolean(0) && mon.getLong(1) >= minRebuildN
    if (fired) {
      val corpus = rebuildCorpus(spark, base, rawPath, tombPath,
        baseFoldedMax)
      // the rebuilt version's fold watermark: the retrain corpus
      // resolved every raw-increment and tombstone batch ABOVE the
      // base's own watermark (batches at or below it are already
      // folded into `base` — and with purgeFolded live they may be
      // partially or wholly gone from the stores, so `base` is the
      // only complete record of them); the new watermark carries the
      // base's forward so it can never regress when the surviving
      // dirs' max is lower
      val wm = ((if (baseFoldedMax >= 0) Seq(baseFoldedMax)
        else Seq.empty) ++
        maxBatchIn(spark, rawPath).toSeq ++
        tombPath.flatMap(maxBatchIn(spark, _))).maxOption
      // the rebuild preserves the store's encoding variant: a residual
      // store retrains as residual, raw as raw — the loop never flips
      // an index's semantics under its serving paths
      val variant = Similarity.indexVariant(indexStore)
      // autoDial (ADVICE r10): the automated loop otherwise retrains at
      // the fixed toy kCells forever while the folded-in increments grow
      // the corpus — opt in to re-sizing nlist/spill by the production
      // rules over the CURRENT rebuild corpus ([[Similarity.autoNlist]] /
      // [[Similarity.autoSpill]]). trainN is the COUNTED size of the
      // actual calibMod training slice (ADVICE r11: the n − n/calibMod
      // estimate assumed uniform ids; a skewed rebuild-corpus id
      // distribution could let autoNlist exceed the trainN/39 clamp the
      // oracle-pinned rule enforces) — one distinct-count pass computes
      // both sides
      if (autoDial) {
        val cnt = corpus.agg(
          countDistinct(col("vec_id")).as("n"),
          countDistinct(when(pmod(col("vec_id"), lit(calibMod)) =!= 0,
            col("vec_id"))).as("trainN")).first()
        val kc = Similarity.autoNlist(cnt.getLong(0), cnt.getLong(1))
        val sp = if (variant == "residual") 1 else Similarity.autoSpill(kc)
        buildIndexWithDriftReference(corpus, indexStore, driftStore,
          calibMod, buckets, kc, m, k, iters, dim, spill = sp,
          variant = variant, foldedMax = wm)
      } else
        buildIndexWithDriftReference(corpus, indexStore, driftStore,
          calibMod, buckets, kCells, m, k, iters, dim, variant = variant,
          foldedMax = wm)
      // nothing else to do: the flipped _CURRENT pointer re-routes the
      // next batch's encode AND every search to the new version + its
      // fresh codes dir
    }
  }

  /** The COMPLETE maintenance loop as ONE foreachBatch body (VERDICT
    * r12 #1): [[annAutoRebuildBatch]]'s ingest + drift-triggered
    * retrain, plus the volume-triggered COMPACTION arm — the three-way
    * maintenance split production ANN systems run: cheap per-increment
    * encode always; expensive retrain when the DISTRIBUTION moved;
    * a training-free merge ([[compactIncrements]]) when increment
    * VOLUME makes every query's union-dedup cost outweigh one
    * compaction pass. The trigger consumes the increments' own
    * coded-row count the same way the rebuild arm consumes the drift
    * row it just wrote: compaction fires when increment rows ≥
    * max(minCompactN, compactRatio · base coded rows) — the ratio
    * keeps a huge base from compacting on every trickle (at 10⁹
    * base vectors, 0.1 means one merge pass per 10⁸ streamed rows);
    * the floor keeps a tiny base from churning versions on noise
    * (the [[annAutoRebuildBatch]] minRebuildN discipline). A batch
    * that fired the REBUILD arm skips the volume check — the retrain
    * already folded every increment into the new base.
    *
    * Both counts are parquet metadata aggregates (footer row counts,
    * no data pages), paid once per microbatch. Replay after an
    * auto-compaction is idempotent: a re-delivered batch re-encodes
    * pointwise into the NEW version's (empty) increments dir, and the
    * winners rule serves its rows over the bit-identical compacted
    * copies — results unchanged (spec-pinned). */
  def annMaintainBatch(spark: SparkSession, indexStore: ModelStore,
      driftStore: ModelStore, base: DataFrame, codesPath: String,
      monitorPath: String, rawPath: String, calibMod: Int = 4,
      threshold: Double = 0.2, buckets: Int = 10, kCells: Int = 4,
      m: Int = 4, k: Int = 8, iters: Int = 2, dim: Int = 64,
      minRebuildN: Long = 50L, autoDial: Boolean = false,
      compactRatio: Double = 0.5, minCompactN: Long = 100L,
      tombPath: Option[String] = None, gcKeepVersions: Int = 0,
      gcPinned: Set[Long] = Set.empty,
      gcTagPath: Option[String] = None,
      foldMonitorEvery: Long = 0L,
      monitorKeepRecent: Long = 8L,
      baseFoldedMax: Long = -1L)(
      batch: DataFrame, batchId: Long): Unit = {
    val v0 = indexStore.currentVersion
    annAutoRebuildBatch(spark, indexStore, driftStore, base, codesPath,
      monitorPath, rawPath, calibMod, threshold, buckets, kCells, m, k,
      iters, dim, minRebuildN, autoDial, tombPath, baseFoldedMax)(
      batch, batchId)
    if (indexStore.currentVersion == v0)
      StreamingDedup.readStore(spark,
          versionedCodesPath(codesPath, indexStore)).foreach { inc =>
        val incN = inc.count()
        if (incN >= minCompactN &&
            incN >= compactRatio * indexStore.load("codes").count())
          compactIncrements(spark, indexStore, codesPath, tombPath)
      }
    // retention arm (VERDICT r13 #1): after a successful flip — rebuild
    // or compaction — reclaim superseded versions past the keepLast
    // window. 0 disables (the conservative default: the caller owns the
    // reader-lifetime/pin contract); `gcPinned` carries reader-held
    // versions, `gcTagPath` resolves tag-pinned versions AT GC TIME so
    // tags that moved since wiring still protect what they now name.
    if (gcKeepVersions > 0 && indexStore.currentVersion != v0)
      gcIndexVersions(spark, indexStore, codesPath, gcKeepVersions,
        gcPinned ++ gcTagPath.map(taggedIndexVersions(spark, _))
          .getOrElse(Set.empty))
    // monitor-store fold arm (VERDICT r14 #2): the drift monitor
    // appends one 1-row dir per batch forever — fold on the same
    // cadence discipline as the ledgers (keepRecent = the replay
    // horizon; folded rows keep their batch attribution, so the
    // monitor series is exact across folds). 0 disables (default).
    if (foldMonitorEvery > 0 && batchId > 0 &&
        batchId % foldMonitorEvery == 0 &&
        batchId - monitorKeepRecent >= 0)
      StreamingRelease.compactMonitorStore(spark, monitorPath,
        batchId - monitorKeepRecent)
  }

  /** The complete maintenance loop over a CDC stream — the
    * [[annMaintainBatch]] arms plus DELETES: rows with op = "d" become
    * tombstones (and are withheld from the raw store, the drift
    * monitor, and the encode), everything else flows through the
    * insert loop. The rebuild arm retrains on base ∪ raw increments
    * MINUS the dead ids ([[rebuildCorpus]] with tombstones) and the
    * compaction arm physically removes them — a takedown propagates
    * through every maintenance path without an operator in the loop. */
  def annMaintainUpsertBatch(spark: SparkSession, indexStore: ModelStore,
      driftStore: ModelStore, base: DataFrame, codesPath: String,
      monitorPath: String, rawPath: String, tombPath: String,
      calibMod: Int = 4, threshold: Double = 0.2, buckets: Int = 10,
      kCells: Int = 4, m: Int = 4, k: Int = 8, iters: Int = 2,
      dim: Int = 64, minRebuildN: Long = 50L, autoDial: Boolean = false,
      compactRatio: Double = 0.5, minCompactN: Long = 100L,
      gcKeepVersions: Int = 0, gcPinned: Set[Long] = Set.empty,
      gcTagPath: Option[String] = None,
      foldMonitorEvery: Long = 0L,
      monitorKeepRecent: Long = 8L,
      baseFoldedMax: Long = -1L)(
      batch: DataFrame, batchId: Long): Unit = {
    val dels = batch.filter(col("op") === "d").select("vec_id")
      .distinct().localCheckpoint(true)
    annDeleteBatch(spark, tombPath)(dels, batchId)
    annMaintainBatch(spark, indexStore, driftStore, base, codesPath,
      monitorPath, rawPath, calibMod, threshold, buckets, kCells, m, k,
      iters, dim, minRebuildN, autoDial, compactRatio, minCompactN,
      Some(tombPath), gcKeepVersions, gcPinned, gcTagPath,
      foldMonitorEvery, monitorKeepRecent, baseFoldedMax)(
      batch.filter(col("op") =!= "d")
        .join(broadcast(dels), Seq("vec_id"), "left_anti")
        .select("vec_id", "embedding"),
      batchId)
  }

  /** Wire a (vec_id, embedding, op) CDC stream through the complete
    * delete-aware maintenance loop. */
  def incrementalAnnMaintainUpserts(vecs: DataFrame,
      indexStore: ModelStore, driftStore: ModelStore, base: DataFrame,
      codesPath: String, monitorPath: String, rawPath: String,
      tombPath: String, checkpoint: String, calibMod: Int = 4,
      threshold: Double = 0.2, buckets: Int = 10, kCells: Int = 4,
      m: Int = 4, k: Int = 8, iters: Int = 2, dim: Int = 64,
      minRebuildN: Long = 50L, autoDial: Boolean = false,
      compactRatio: Double = 0.5, minCompactN: Long = 100L,
      gcKeepVersions: Int = 0, gcPinned: Set[Long] = Set.empty,
      gcTagPath: Option[String] = None): DataStreamWriter[Row] =
    vecs.writeStream
      .foreachBatch(annMaintainUpsertBatch(vecs.sparkSession, indexStore,
        driftStore, base, codesPath, monitorPath, rawPath, tombPath,
        calibMod, threshold, buckets, kCells, m, k, iters, dim,
        minRebuildN, autoDial, compactRatio, minCompactN,
        gcKeepVersions, gcPinned, gcTagPath) _)
      .option("checkpointLocation", checkpoint)

  /** Wire a (vec_id, embedding) stream through the complete maintenance
    * loop — ingest + drift-triggered retrain + volume-triggered
    * compaction, one call. */
  def incrementalAnnMaintain(vecs: DataFrame, indexStore: ModelStore,
      driftStore: ModelStore, base: DataFrame, codesPath: String,
      monitorPath: String, rawPath: String, checkpoint: String,
      calibMod: Int = 4, threshold: Double = 0.2, buckets: Int = 10,
      kCells: Int = 4, m: Int = 4, k: Int = 8, iters: Int = 2,
      dim: Int = 64, minRebuildN: Long = 50L, autoDial: Boolean = false,
      compactRatio: Double = 0.5, minCompactN: Long = 100L,
      gcKeepVersions: Int = 0, gcPinned: Set[Long] = Set.empty,
      gcTagPath: Option[String] = None): DataStreamWriter[Row] =
    vecs.writeStream
      .foreachBatch(annMaintainBatch(vecs.sparkSession, indexStore,
        driftStore, base, codesPath, monitorPath, rawPath, calibMod,
        threshold, buckets, kCells, m, k, iters, dim, minRebuildN,
        autoDial, compactRatio, minCompactN, None,
        gcKeepVersions, gcPinned, gcTagPath) _)
      .option("checkpointLocation", checkpoint)

  // ---- AUTOPILOT (VERDICT r14 #4): the maintenance loop's retention
  // was all manual dials — gcKeepVersions defaulted off, purgeFolded
  // was caller-invoked with a base-rewrite contract the caller had to
  // honor by hand, so "runs with bounded storage forever" was an
  // argument, not a call. annAutopilot is the one-call preset that
  // closes the loop: it OWNS the base corpus (a [[ModelStore]] the
  // caller never touches), re-reads it per batch (so a rewrite
  // re-wires the loop automatically — the foreachBatch-closure hazard
  // documented on purgeFolded cannot happen), and on every version
  // flip (compaction or rebuild) it (a) rewrites the base to the
  // resolved fold [[foldedCorpus]], (b) GCs superseded base and index
  // versions, and (c) purges every streamed batch dir below the purge
  // floor and the replay horizon. Every store the loop writes is
  // bounded by a dial: index versions ≤ gcKeepVersions (+pins), base
  // versions ≤ 1, raw/tombstone/increment batch dirs ≤ (batches
  // between flips + purgeKeepRecent), monitor dirs ≤ foldMonitorEvery
  // + monitorKeepRecent. The soak spec (AutopilotSpec) drives 50
  // microbatches with deletes and re-inserts through it and pins all
  // four bounds plus serve-equality with a never-retained twin. ----

  /** One-call self-maintaining ANN loop: ingest + drift-gated rebuild
    * + volume-gated compaction + version GC + base-corpus rewrite +
    * folded-batch purge + monitor fold. `batch` may be plain
    * (vec_id, embedding) or CDC (vec_id, embedding, op) — rows with
    * op = "d" become tombstones. `baseStore` must be dedicated to this
    * loop (its versions are GC'd aggressively: nothing else may pin
    * them). Tag-pinned versions (`gcTagPath`) are protected by GC and
    * floor the purge, exactly as in the manual loop. */
  def annAutopilot(spark: SparkSession, indexStore: ModelStore,
      driftStore: ModelStore, baseStore: ModelStore, codesPath: String,
      monitorPath: String, rawPath: String, tombPath: String,
      calibMod: Int = 4, threshold: Double = 0.2, buckets: Int = 10,
      kCells: Int = 4, m: Int = 4, k: Int = 8, iters: Int = 2,
      dim: Int = 64, minRebuildN: Long = 50L, autoDial: Boolean = false,
      compactRatio: Double = 0.0, minCompactN: Long = 100L,
      gcKeepVersions: Int = 2, gcTagPath: Option[String] = None,
      foldMonitorEvery: Long = 16L, monitorKeepRecent: Long = 8L,
      purgeKeepRecent: Long = 8L)(
      batch: DataFrame, batchId: Long): Unit = {
    require(gcKeepVersions >= 1 && purgeKeepRecent >= 0,
      "autopilot retention dials must keep at least the current state")
    // the loop's OWN base corpus, re-read each batch — empty before
    // the first flip (everything arrives through the stream). The
    // base's recorded fold watermark travels with it: every fold and
    // rebuild over this base filters both stores strictly above it
    // ([[rebuildCorpus]] `aboveBatch` — a stale sub-watermark dir from
    // a purge crash or a below-the-floor replay must not be
    // re-resolved against a base that already folded its effects).
    val base = baseStore.currentVersion.map(_ => baseStore.load("base"))
      .getOrElse(batch.select("vec_id", "embedding").limit(0))
    val baseWm = foldedWatermark(baseStore, None)
    val v0 = indexStore.currentVersion
    val cdc = batch.columns.contains("op")
    if (cdc)
      annMaintainUpsertBatch(spark, indexStore, driftStore, base,
        codesPath, monitorPath, rawPath, tombPath, calibMod, threshold,
        buckets, kCells, m, k, iters, dim, minRebuildN, autoDial,
        compactRatio, minCompactN, gcKeepVersions, Set.empty, gcTagPath,
        foldMonitorEvery, monitorKeepRecent, baseWm)(batch, batchId)
    else
      annMaintainBatch(spark, indexStore, driftStore, base, codesPath,
        monitorPath, rawPath, calibMod, threshold, buckets, kCells, m,
        k, iters, dim, minRebuildN, autoDial, compactRatio, minCompactN,
        Some(tombPath), gcKeepVersions, Set.empty, gcTagPath,
        foldMonitorEvery, monitorKeepRecent, baseWm)(batch, batchId)
    if (indexStore.currentVersion != v0) {
      // a flip folded every streamed batch into the new version's
      // base: rewrite OUR base corpus to the same resolved fold FIRST
      // (the purge contract's caller half, automated), then purge what
      // every protected version's watermark already hides — capped by
      // the replay horizon so a re-delivered recent batch still finds
      // its own partition. The rewritten base records its own fold
      // watermark (everything at or below this batch is resolved into
      // it) so the NEXT fold filters to the suffix.
      val newBase = foldedCorpus(spark, base, rawPath, Some(tombPath),
        baseWm)
      baseStore.save(Map("base" -> newBase,
        "folded" -> foldedPart(spark, batchId)))
      baseStore.gcVersions(keepLast = 1)
      // floor over EVERY on-disk version, not just current+tagged: the
      // gcKeepVersions window is still servable via loadAt, so its
      // watermarks protect too — the purge lags one flip behind the
      // oldest kept version (bounded: the window is a fixed dial)
      val upTo = math.min(
        purgeFloor(spark, indexStore,
          pinnedVersions = indexStore.versions.toSet,
          tagPath = gcTagPath),
        batchId - purgeKeepRecent)
      if (upTo >= 0)
        purgeFolded(spark, indexStore, codesPath, upTo, Some(rawPath),
          Some(tombPath), tagPath = gcTagPath)
    }
  }

  /** Wire a plain or CDC vector stream through [[annAutopilot]]. */
  def incrementalAnnAutopilot(vecs: DataFrame, indexStore: ModelStore,
      driftStore: ModelStore, baseStore: ModelStore, codesPath: String,
      monitorPath: String, rawPath: String, tombPath: String,
      checkpoint: String, calibMod: Int = 4, threshold: Double = 0.2,
      buckets: Int = 10, kCells: Int = 4, m: Int = 4, k: Int = 8,
      iters: Int = 2, dim: Int = 64, minRebuildN: Long = 50L,
      autoDial: Boolean = false, compactRatio: Double = 0.0,
      minCompactN: Long = 100L, gcKeepVersions: Int = 2,
      gcTagPath: Option[String] = None, foldMonitorEvery: Long = 16L,
      monitorKeepRecent: Long = 8L,
      purgeKeepRecent: Long = 8L): DataStreamWriter[Row] =
    vecs.writeStream
      .foreachBatch(annAutopilot(vecs.sparkSession, indexStore,
        driftStore, baseStore, codesPath, monitorPath, rawPath,
        tombPath, calibMod, threshold, buckets, kCells, m, k, iters,
        dim, minRebuildN, autoDial, compactRatio, minCompactN,
        gcKeepVersions, gcTagPath, foldMonitorEvery, monitorKeepRecent,
        purgeKeepRecent) _)
      .option("checkpointLocation", checkpoint)

  /** [[searchIncremental]] against the CURRENT index version's codes
    * dir — the serve-side half of the automated loop's atomic flip.
    * `_CURRENT` is read ONCE and every artifact of the query is served
    * from that pinned version (ADVICE r10: the previous shape re-read
    * the pointer per part, so a rebuild flipping mid-query could pair
    * the old version's increment codes with the new coarse table —
    * exactly the cross-version cell-id mismatch the per-version codes
    * dir exists to prevent). The rerank budget scales by the pinned
    * version's spill dial, the [[Similarity.annRecallAuto]] serve rule. */
  def searchAuto(spark: SparkSession, store: ModelStore,
      codesPath: String, qVec: Map[Int, Double], qId: Long = -1L,
      topK: Int = 10, nprobe: Int = 2, m: Int = 4, dim: Int = 64,
      rerankK: Int = 100, tombPath: Option[String] = None): DataFrame = {
    val v = store.currentVersion.getOrElse(0L)
    searchIncremental(spark, store, s"$codesPath/v=$v",
      qVec, qId, topK, nprobe, m, dim, rerankK * spillAt(store, v),
      version = Some(v), tombPath = tombPath)
  }

  /** Driver-contract query (`q_ann_residual_inc`): the residual index
    * maintained INCREMENTALLY — quantizers train once on the full
    * corpus with empty data parts ([[Similarity
    * .saveIvfPqResidualIndexTrainedOn]] with a limit(0) encode arm, the
    * distributed-build shape), three ascending-vec_id microbatches
    * supply every coded row through [[annIngestBatch]] (which
    * dispatches to the residual encoder off the store's variant dial),
    * and the recall sweep serves through [[searchIncremental]] (which
    * dispatches the residual ADC body). Because residual assignment and
    * encoding are pointwise under frozen quantizers, the sweep is
    * bit-identical to the batch [[Similarity.annRecallResidual]] — the
    * oracle is that row's SQL VERBATIM, so the driver's DuckDB replay
    * hash-pins that microbatching a residual index is invisible. */
  def annResidualIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-resinc-codes-")
    try {
      // process-shared frozen quantizers (read-only here — the ingest
      // writes codes to this query's own dir): one residual training
      // job serves every residual contract row
      val store = Similarity.sharedResidualQuantizers(spark, dir)
      // microbatch split by pmod, not count-based ranges (ADVICE r12:
      // with sparse/non-contiguous vec_ids a [cuts(b), cuts(b+1)) slice
      // silently drops rows with vec_id >= n, breaking the
      // verbatim-oracle equality); pmod covers every id exactly once
      // regardless of the id distribution, and encoding is pointwise so
      // any partition of the corpus yields the same index
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      val qv = Similarity.queryVecOf(emb, 0L)
      // one-scan sweep: every nprobe branch filters the shared
      // materialized shortlist (bit-equal per np to the per-np serve)
      val rr = sweepRerankedIncremental(spark, store,
        codesDir.toString, qv, qId = 0L, npMax = 4)
      graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
        Similarity.sweepTopK(rr, np, 10)
          .join(truth, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), lit(10).as("k"),
            col("n_hits"),
            (col("n_hits").cast("double") / 10).as("recall"))
      }.reduce(_ union _).orderBy("nprobe"))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** Driver-contract queries (`q_ann_compacted` /
    * `q_ann_compacted_residual`): the index maintained incrementally
    * (quantizers trained once on the full corpus with empty data parts,
    * every coded row ingested through three pmod microbatches), then
    * COMPACTED ([[compactIncrements]]) and the recall sweep served
    * through [[searchAuto]] — the post-flip serve path, reading the
    * compacted base plus the fresh empty increments dir. Compaction
    * carries the frozen quantizers and the deduped coded rows, and
    * pointwise encoding makes those rows bit-equal to the batch
    * build's, so the sweep is bit-identical to the batch recall rows
    * ([[Similarity.annRecall]] / [[Similarity.annRecallResidual]]) —
    * each oracle is that row's SQL VERBATIM, hash-pinning that
    * ingest + compaction is invisible to the serving tier (VERDICT
    * r12 #5). */
  def annCompactedQuery(spark: SparkSession, dir: String): DataFrame =
    compactedRecallSweep(spark, dir, "raw")

  def annCompactedResidualQuery(spark: SparkSession,
      dir: String): DataFrame =
    compactedRecallSweep(spark, dir, "residual")

  private def compactedRecallSweep(spark: SparkSession, dir: String,
      variant: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory(s"graft-cmp$variant-codes-")
    try {
      graft.store.ModelStore.scratch(spark, s"cmp$variant") { store =>
        if (variant == "residual")
          Similarity.saveIvfPqResidualIndexTrainedOn(emb, emb.limit(0),
            store)
        else Similarity.saveQuantizers(emb, store)
        val vp = versionedCodesPath(codesDir.toString, store)
        (0 until 3).foreach { b =>
          annIngestBatch(spark, store, vp)(
            emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
        }
        compactIncrements(spark, store, codesDir.toString)
        val qv = Similarity.queryVecOf(emb, 0L)
        // one-scan sweep: every nprobe branch filters the shared
        // materialized shortlist (bit-equal per np to the per-np serve)
        val rr = sweepRerankedAuto(spark, store, codesDir.toString,
          qv, qId = 0L, npMax = 4)
        graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
          Similarity.sweepTopK(rr, np, 10)
            .join(truth, "vec_id")
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(np).as("nprobe"), lit(10).as("k"),
              col("n_hits"),
              (col("n_hits").cast("double") / 10).as("recall"))
        }.reduce(_ union _).orderBy("nprobe"))
      }
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** Search the base index PLUS every streamed increment: one union of
    * coded rows, then the shared probe+ADC+rerank body. The probe's
    * cell filter pushes through the union/dedup joins into BOTH scans
    * ([[unionServeFrames]]): base and increments are cell-partitioned,
    * so a query physically reads nprobe/nlist of each store's
    * directories — the ADC scan reads m bytes + a cell id per candidate
    * (the ux rerank payload is column-pruned out of it).
    *
    * A vec_id may appear in more than one leg: the replay contract
    * dedups within a RE-DELIVERED batch (same batchId overwrites its own
    * partition), but an at-least-once upstream can re-deliver a vector
    * in a LATER batch, and a re-ingest can carry an updated embedding.
    * The coded rows of ONE winning batch per vec_id survive — latest
    * batch wins, base loses to any increment — so the top-K can never
    * hold the same vector twice (review r7 finding #2). "Rows", not
    * "row": a spilled index ([[Similarity.autoSpill]]) legitimately
    * codes a vector into several cells, so the dedup keeps every row of
    * the winning batch (the winners equi-join) rather than a single row
    * — and the rerank-payload leg collapses back to one ux per vec_id.
    *
    * `version`: pin every store artifact to one index version
    * ([[ModelStore.loadAt]]) — [[searchAuto]] passes the version whose
    * codes dir it resolved, so a rebuild flipping `_CURRENT` mid-query
    * cannot mix old-version codes with new-version centroids. */
  def searchIncremental(spark: SparkSession, store: ModelStore,
      codesPath: String, qVec: Map[Int, Double], qId: Long = -1L,
      topK: Int = 10, nprobe: Int = 2, m: Int = 4,
      dim: Int = 64, rerankK: Int = 100,
      version: Option[Long] = None,
      tombPath: Option[String] = None,
      pred: Option[org.apache.spark.sql.Column] = None,
      asOf: Option[Long] = None): DataFrame = {
    val (coded0, vectors, variant, ld) =
      unionServeFrames(spark, store, codesPath, version, tombPath, asOf)
    // FILTERED serve over the live index: the allowed-set predicate
    // lands on the RESOLVED candidate frame — after the winners rule
    // and the tombstones, before any scoring — the same pre-filtering
    // contract as the persisted [[Similarity.ivfPqSearchFiltered]],
    // composed with incremental maintenance and deletes
    val coded = pred.map(coded0.filter).getOrElse(coded0)
    // serve with the PINNED version's encoding semantics (ADVICE r11:
    // the raw-only body served a residual store's codes against raw ADC
    // tables — silently wrong neighbors, the failure requireVariant
    // exists to prevent; dispatch makes the mistake unreachable)
    if (variant == "residual")
      Similarity.ivfPqSearchResidualOver(ld("coarse"), coded, vectors,
        ld("codebooks"), qVec, qId, topK, nprobe, m, dim, rerankK)
    else
      Similarity.ivfPqSearchOver(ld("coarse"), coded, vectors,
        ld("codebooks"), qVec, qId, topK, nprobe, m, dim, rerankK)
  }

  /** Multi-nprobe sweep core over the live index — the
    * [[Similarity.sweepRerankedOver]] shape fed by the SAME
    * [[unionServeFrames]] dedup rule as [[searchIncremental]]: one
    * candidate scan + winner resolution + rerank at the widest probe
    * serves every narrower branch ([[Similarity.sweepTopK]]),
    * bit-equal per np to the per-np serve. */
  def sweepRerankedIncremental(spark: SparkSession, store: ModelStore,
      codesPath: String, qVec: Map[Int, Double], qId: Long = -1L,
      npMax: Int = 4, m: Int = 4, dim: Int = 64, rerankK: Int = 100,
      version: Option[Long] = None,
      tombPath: Option[String] = None,
      pred: Option[org.apache.spark.sql.Column] = None,
      asOf: Option[Long] = None): DataFrame = {
    val (coded0, vectors, variant, ld) =
      unionServeFrames(spark, store, codesPath, version, tombPath, asOf)
    val coded = pred.map(coded0.filter).getOrElse(coded0)
    Similarity.sweepRerankedOver(ld("coarse"), coded, vectors,
      ld("codebooks"), qVec, qId, npMax, m, dim, rerankK, variant)
  }

  /** [[sweepRerankedIncremental]] against the CURRENT version — the
    * [[searchAuto]] pinning + spill-scaled rerank rule. */
  def sweepRerankedAuto(spark: SparkSession, store: ModelStore,
      codesPath: String, qVec: Map[Int, Double], qId: Long = -1L,
      npMax: Int = 4, m: Int = 4, dim: Int = 64, rerankK: Int = 100,
      tombPath: Option[String] = None): DataFrame = {
    val v = store.currentVersion.getOrElse(0L)
    sweepRerankedIncremental(spark, store, s"$codesPath/v=$v", qVec,
      qId, npMax, m, dim, rerankK * spillAt(store, v),
      version = Some(v), tombPath = tombPath)
  }

  /** [[sweepRerankedIncremental]] at a NAMED snapshot — the
    * [[searchAt]] resolution + spill rule. */
  def sweepRerankedAt(spark: SparkSession, store: ModelStore,
      codesPath: String, tagPath: String, tag: String,
      qVec: Map[Int, Double], qId: Long = -1L, npMax: Int = 4,
      m: Int = 4, dim: Int = 64, rerankK: Int = 100,
      tombPath: Option[String] = None): DataFrame = {
    val (b, v) = resolveIndexTag(spark, tagPath, tag)
    sweepRerankedIncremental(spark, store, s"$codesPath/v=$v", qVec,
      qId, npMax, m, dim, rerankK * spillAt(store, v),
      version = Some(v), tombPath = tombPath, asOf = Some(b))
  }

  /** The deduped base∪increments serve frames plus the pinned variant
    * and part loader — the ONE union/dedup rule every incremental serve
    * (single-query and batched, raw and residual) reads, so they cannot
    * diverge on which coded rows win.
    *
    * The rule — latest batch wins per vec_id, base loses to any
    * increment, ALL rows of the winning batch survive (a spilled index
    * legitimately codes a vector into several cells) — is expressed as
    * two equi-joins against a narrow WINNERS table (vec_id → max batch,
    * one aggregate over the increments' two cheapest columns), not as a
    * max-over-window on the union. The window shape shuffled the whole
    * base ∪ increments by vec_id on EVERY query and blocked the probe's
    * cell filter from reaching the scans; the join shape broadcasts
    * |increment vec_ids| rows — bounded by compaction
    * ([[compactIncrements]], auto-fired by [[annMaintainBatch]]) — and
    * lets the cid predicate push into BOTH legs, which on the
    * cell-partitioned layout ([[annIngestBatch]] /
    * [[Similarity.codedFrame]]) is physical partition pruning of base
    * and increment files alike: the probe reads nprobe/nlist of the
    * directories, the FAISS inverted-list contract, maintained live.
    *
    * Codes and the ux rerank payload must win TOGETHER per vec_id (an
    * increment can carry an updated embedding), so both serve legs read
    * this one deduped frame; the ADC leg drops ux inside the shared
    * search body. */
  private def unionServeFrames(spark: SparkSession, store: ModelStore,
      codesPath: String, version: Option[Long],
      tombPath: Option[String] = None,
      asOf: Option[Long] = None)
      : (DataFrame, DataFrame, String, String => DataFrame) = {
    def ld(part: String): DataFrame = version match {
      case Some(v) => store.loadAt(v, part)
      case None => store.load(part)
    }
    val baseCodes = Similarity.codedFrame(ld)
    // fold watermark of the version actually served: batches at or
    // below it are already reflected in the base artifacts and must
    // not re-apply (see the FOLD WATERMARK note above)
    val wm = foldedWatermark(store, version)
    // a version whose base folded batches AFTER the requested as-of
    // cannot time-travel below its own fold — the post-asOf rows are
    // physically in the base with no batch column to prune them by.
    // Fail loudly (ADVICE r13: the silent read included them): pin a
    // version whose watermark predates the as-of batch instead.
    asOf.foreach(a => require(wm <= a,
      s"as-of batch $a predates this version's fold watermark $wm — " +
        "batches after the as-of were already folded into its base; " +
        "pin an index version whose watermark is <= the as-of batch"))
    val tombs = readTombs(spark, tombPath, asOf, minExclusive = wm)
    // AS-OF (time-travel) read: restrict increments and tombstones to
    // batches ≤ asOf — the serve sees exactly the index state after
    // that batch committed, because every later batch is partition-
    // pruned out of both stores (batch is a hive partition column) and
    // the winners rule is a pure function of the rows that remain. The
    // BASE artifacts are pinned separately by `version`: as-of
    // time-travels the streamed data, version pins the quantizers.
    val incs = StreamingDedup.readStore(spark, codesPath)
      .map { i0 =>
        val i = if (wm >= 0)
          i0.filter(col("batch").cast("long") > wm) else i0
        asOf.map(b => i.filter(col("batch").cast("long") <= b))
          .getOrElse(i)
      }
    val (coded, vectors) =
      (incs, tombs) match {
      case (Some(inc), _) =>
        val base = baseCodes
          .join(ld("vectors"), "vec_id") // rerank payload
        val (alive, touched) = resolveWinners(inc, tombs)
        val incWin = inc.withColumn("__b", col("batch").cast("long"))
          .join(broadcast(alive), Seq("vec_id", "__b"))
          .select(base.columns.map(col): _*)
        val dd = base
          .join(broadcast(touched), Seq("vec_id"), "left_anti")
          .unionByName(incWin)
        (dd, dd.select("vec_id", "ux").dropDuplicates("vec_id"))
      case (None, Some(del)) =>
        // tombstones with no live increments: one broadcast anti-join
        // hides the dead ids from both serve legs. `del` holds only
        // tombstones ABOVE the served version's fold watermark — a
        // compacted/rebuilt base already resolved the older ones
        // (including re-inserts they lost to), so applying them here
        // would re-kill legitimately folded resurrections (ADVICE r13)
        val dead = del.select("vec_id")
        (baseCodes.join(broadcast(dead), Seq("vec_id"), "left_anti"),
          ld("vectors").join(broadcast(dead), Seq("vec_id"), "left_anti"))
      case (None, None) => (baseCodes, ld("vectors"))
    }
    val variant = version.map(Similarity.indexVariantAt(store, _))
      .getOrElse(Similarity.indexVariant(store))
    (coded, vectors, variant, ld)
  }

  /** COMPACTION: fold the streamed increments into the base index
    * WITHOUT retraining — a new store version carrying the SAME
    * quantizers whose data parts are exactly the deduped union every
    * serve computes per query (latest batch wins per vec_id, base loses
    * to any increment). The version flip atomically selects a fresh
    * empty increments dir ([[versionedCodesPath]]), so post-compaction
    * serving reads the compacted base alone — bit-identical results
    * (spec-pinned), with the per-query union/dedup cost gone until new
    * increments accumulate.
    *
    * This is the third arm of the maintenance split, between
    * per-increment encode (cheap, continuous) and drift-triggered
    * retrain (expensive, rare): compaction is one deduped pass over
    * base ∪ increments — no training jobs, no raw-vector reads beyond
    * the stored ux payload — and production ANN systems run exactly
    * this (FAISS merges on-disk inverted lists; LSM stores compact
    * levels). At 100 TB the trigger is increment volume: compact when
    * the per-query dedup-window cost over the union outweighs one
    * merge pass. Raw increments under `rawPath` are untouched — the
    * retrain corpus is unaffected by serve-side compaction. Returns
    * the new version. */
  def compactIncrements(spark: SparkSession, store: ModelStore,
      codesPath: String, tombPath: Option[String] = None): Long = {
    val v = store.currentVersion.getOrElse(0L)
    // the new version's fold watermark: everything this compaction
    // reads — increments and tombstones alike — is folded into its
    // base, so the max batch across both stores (carried forward over
    // the prior fold's watermark) marks the staleness boundary below
    // which serves must never re-apply either store
    val wm = (Seq(foldedWatermark(store, Some(v))) ++
      maxBatchIn(spark, s"$codesPath/v=$v") ++
      tombPath.flatMap(maxBatchIn(spark, _))).max
    val (coded0, vectors0, _, ld) = unionServeFrames(spark, store,
      s"$codesPath/v=$v", Some(v), tombPath)
    // the deduped union feeds FOUR saved parts (cells, codes, vectors,
    // and the empty-part probe inside save) — materialize it once
    // instead of re-evaluating the union/dedup plan per consumer
    // (ADVICE r12). With no increments coded0 is the base codes frame
    // (no ux payload) and the rewrite is a no-op refresh.
    val coded = graft.Materialize.checkpoint(coded0)
    val vectors =
      if (coded.columns.contains("ux"))
        coded.select("vec_id", "ux").dropDuplicates("vec_id")
      else vectors0
    // legacy (pre-dials) stores get a dials record derived from the
    // artifacts themselves, never hard-coded guesses (ADVICE r12)
    val hasDials = store.partNamesAt(v).contains("dials")
    val codes = coded.drop("ux")
    // quantizers (and a present dials record) are UNCHANGED by
    // compaction — copy their part files instead of a Spark
    // read+rewrite per part (the ModelStore `copied` fast path)
    val written = Map(
      "cells" -> codes.select("vec_id", "cid"),
      "codes" -> codes,
      "vectors" -> vectors,
      "folded" -> foldedPart(spark, wm)) ++
      (if (hasDials) Map.empty[String, DataFrame]
       else Map("dials" -> Similarity.legacyDialsOf(ld("coarse"),
         ld("codebooks"), codes, vectors)))
    store.save(written,
      partitioned = Map("codes" -> Seq("cid")),
      copied = Map("coarse" -> (store, v), "codebooks" -> (store, v)) ++
        (if (hasDials) Map("dials" -> (store, v))
         else Map.empty[String, (ModelStore, Long)]))
  }

  // ---- STORAGE RETENTION (VERDICT r13 #1/#5): the maintenance loop's
  // automation writes state it never reclaims — every auto-fired
  // compaction/rebuild leaves a full superseded index version (plus its
  // orphaned per-version increments dir), and tombstone/raw-increment
  // batch dirs accumulate forever. Retention has two arms with one
  // story: gcIndexVersions drops superseded VERSIONS (bounded by
  // keepLast + pins), purgeFolded drops streamed BATCH DIRS a completed
  // fold already absorbed (bounded by the fold watermark, which is what
  // makes the purge provably serve-invisible: serves filter to batches
  // ABOVE the watermark, so a purged batch was unreadable already). ----

  /** Delete superseded index versions AND their per-version increment
    * dirs — [[graft.store.ModelStore.gcVersions]] plus the
    * `codesPath/v=N` twin each version owns ([[versionedCodesPath]]).
    * The pin contract is the store's: tag-pinned versions and versions
    * handed to long-lived `loadAt` readers belong in `pinned`. Returns
    * the deleted versions. */
  def gcIndexVersions(spark: SparkSession, store: ModelStore,
      codesPath: String, keepLast: Int = 2,
      pinned: Set[Long] = Set.empty): Seq[Long] = {
    val dead = store.gcVersions(keepLast, pinned)
    dead.foreach { v =>
      val p = new org.apache.hadoop.fs.Path(s"$codesPath/v=$v")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    dead
  }

  /** Drop a store's `batch=N` partitions at or below `upTo`. */
  private def dropBatches(spark: SparkSession, path: String,
      upTo: Long): Unit =
    StreamingDedup.listBatches(spark, path)
      .filter(_._1 <= upTo)
      .foreach { case (_, dir) =>
        dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(dir, true)
      }

  /** PURGE the streamed state a completed fold already absorbed:
    * tombstone, raw-increment, and current-version increment `batch=N`
    * dirs at or below `upToBatch` are deleted. Legal only up to the
    * fold watermark of EVERY version still servable — the current one
    * plus anything in `pinnedVersions` or named by a tag under
    * `tagPath` (review r14: an older pinned/tagged version with a
    * lower watermark still READS tombstones above its own fold; purging
    * them would silently resurrect its takedowns). At or below that
    * floor, serves of every protected version already partition-prune
    * both stores out, so the purge is serve-invisible by construction,
    * and a REPLAYED pre-purge batch cannot resurrect a dead id
    * afterwards because its rows land below the watermark too
    * (spec-pinned).
    *
    * The REBUILD contract is the caller's half: [[rebuildCorpus]] reads
    * the base frame plus ALL raw increments, so before purging raw
    * batches the caller must rewrite its base corpus to
    * [[foldedCorpus]] over the same cut AND re-wire any running
    * maintenance stream onto the new base (a foreachBatch closure holds
    * the base frame it was wired with — purging raw under a stream
    * still carrying the old base starves its next rebuild). After that,
    * rebuild over (new base, purged stores) is row-identical to rebuild
    * over (old base, full stores), which the spec pins. Tombstones ≤
    * upToBatch are purged with the raw rows they guarded — the r13
    * "both fold away only at a base-corpus rewrite" IOU, now an
    * operator instead of a comment. */
  /** The highest batch a purge may legally reach: the LOWEST fold
    * watermark across every protected version — current, `pinned`,
    * and anything named by a tag under `tagPath`. -1 when any
    * protected version never folded (or does not exist — stale pins
    * fail safe): nothing is purgeable. The [[annAutopilot]] purge arm
    * reads this to pick its bound; [[purgeFolded]] enforces it. */
  def purgeFloor(spark: SparkSession, store: ModelStore,
      pinnedVersions: Set[Long] = Set.empty,
      tagPath: Option[String] = None): Long = {
    val protect = store.currentVersion.toSet ++ pinnedVersions ++
      tagPath.map(taggedIndexVersions(spark, _)).getOrElse(Set.empty)
    require(protect.nonEmpty,
      "purgeFolded on an empty store: nothing was ever folded")
    // a pinned version that no longer exists reads watermark -1 and
    // refuses every purge — stale pins fail safe, not silent
    protect.map(v => foldedWatermark(store, Some(v))).min
  }

  /** CRASH posture: the three per-store drops below are not atomic —
    * a crash between them leaves stale sub-floor dirs in some stores
    * but not others. Harmless by construction: serves filter strictly
    * above every protected version's watermark (they never read a
    * sub-floor dir), and folds/rebuilds over a rewritten base filter
    * strictly above the BASE's recorded watermark ([[rebuildCorpus]]
    * `aboveBatch`), so a surviving stale tombstone cannot re-kill a
    * folded re-insert and a surviving stale insert cannot resurrect a
    * folded takedown. A retried purge re-drops idempotently. */
  def purgeFolded(spark: SparkSession, store: ModelStore,
      codesPath: String, upToBatch: Long,
      rawPath: Option[String] = None,
      tombPath: Option[String] = None,
      pinnedVersions: Set[Long] = Set.empty,
      tagPath: Option[String] = None): Unit = {
    val floor = purgeFloor(spark, store, pinnedVersions, tagPath)
    val protect = store.currentVersion.toSet ++ pinnedVersions ++
      tagPath.map(taggedIndexVersions(spark, _)).getOrElse(Set.empty)
    require(upToBatch <= floor,
      s"purgeFolded(upToBatch=$upToBatch) exceeds the lowest fold " +
        s"watermark $floor across the current/pinned/tagged versions " +
        s"($protect) — a protected serve still reads those batches")
    dropBatches(spark, versionedCodesPath(codesPath, store), upToBatch)
    rawPath.foreach(dropBatches(spark, _, upToBatch))
    tombPath.foreach(dropBatches(spark, _, upToBatch))
  }

  /** The resolved (vec_id, embedding) corpus through everything
    * streamed so far — base ∪ raw-increment winners minus tombstoned
    * ids, the exact frame a drift rebuild retrains on. The caller
    * persists this as its new base corpus before [[purgeFolded]]
    * drops the raw batches that fed it (the base-corpus rewrite half
    * of the purge contract). */
  def foldedCorpus(spark: SparkSession, base: DataFrame,
      rawPath: String, tombPath: Option[String] = None,
      aboveBatch: Long = -1L): DataFrame =
    rebuildCorpus(spark, base, rawPath, tombPath, aboveBatch)

  /** BATCHED k-NN over the incrementally-maintained index: top-k for
    * every query in `queries` against base ∪ every streamed increment —
    * the serving-tier shape against a live index (the single-query
    * [[searchIncremental]] pays a driver round-trip per query). One
    * deduped union feeds the variant-matched batched serve body
    * ([[Similarity.ivfPqKnnJoinOver]] /
    * [[Similarity.ivfPqKnnJoinResidualOver]]); batch == per-query
    * [[searchIncremental]] holds query by query (spec-pinned, both
    * variants). Returns (qid, vec_id, cos_sim, rnk). */
  def knnJoinIncremental(spark: SparkSession, store: ModelStore,
      codesPath: String, queries: DataFrame, topK: Int = 5,
      nprobe: Int = 2, m: Int = 4, dim: Int = 64, rerankK: Int = 50,
      excludeSelf: Boolean = true, broadcastQueries: Boolean = true,
      version: Option[Long] = None,
      tombPath: Option[String] = None,
      pred: Option[org.apache.spark.sql.Column] = None,
      asOf: Option[Long] = None): DataFrame = {
    val (coded1, vectors, variant, ld) =
      unionServeFrames(spark, store, codesPath, version, tombPath, asOf)
    val coded = pred.map(coded1.filter).getOrElse(coded1)
    if (variant == "residual")
      Similarity.ivfPqKnnJoinResidualOver(ld("coarse"), coded, vectors,
        ld("codebooks"), queries, topK, nprobe, m, dim, rerankK,
        excludeSelf, broadcastQueries)
    else
      Similarity.ivfPqKnnJoinOver(ld("coarse"), coded, vectors,
        ld("codebooks"), queries, topK, nprobe, m, dim, rerankK,
        excludeSelf, broadcastQueries)
  }

  /** [[knnJoinIncremental]] against the CURRENT version's codes dir —
    * [[searchAuto]]'s batched twin: `_CURRENT` read once, every
    * artifact pinned to that version, rerank budget scaled by its
    * spill dial. */
  def knnJoinAuto(spark: SparkSession, store: ModelStore,
      codesPath: String, queries: DataFrame, topK: Int = 5,
      nprobe: Int = 2, m: Int = 4, dim: Int = 64, rerankK: Int = 50,
      excludeSelf: Boolean = true,
      broadcastQueries: Boolean = true,
      tombPath: Option[String] = None): DataFrame = {
    val v = store.currentVersion.getOrElse(0L)
    knnJoinIncremental(spark, store, s"$codesPath/v=$v", queries,
      topK, nprobe, m, dim, rerankK * spillAt(store, v), excludeSelf,
      broadcastQueries, version = Some(v), tombPath = tombPath)
  }

  // ---- NAMED SNAPSHOTS over the ANN serves (VERDICT r13 #4): r13
  // wired tags to the release reads only, so "the corpus training run
  // 7 saw" pinned the corpus but not the index. An INDEX tag names the
  // (as-of batch, index version) PAIR: as-of time-travels the streamed
  // data, the version pins the quantizers AND the fold watermark —
  // both dials are needed, because an as-of below a later version's
  // watermark correctly refuses (the fold physically absorbed later
  // batches). Tag at ingest time with the current version; the reads
  // it resolves to ARE the watermark-guarded as-of serves. Same store
  // discipline as the release tags: tiny parquet, tag=NAME partition,
  // re-tag overwrites its own partition, names fenced to a safe
  // charset ([[StreamingRelease.validTag]]). ----

  /** Name the live index's state after `batch` committed: records
    * (batch, version) under `tagPath/tag=NAME`.
    *
    * A tag is a POINTER, and it is stored like one — a one-line file
    * promoted by an overwriting atomic rename, the `_CURRENT` /
    * `_folded_upto` discipline. The previous parquet `mode(overwrite)`
    * of the partition dir was delete-then-write: a crash mid-retag
    * left NO readable tag, and since [[annMaintainBatch]] resolves
    * [[taggedIndexVersions]] AT GC TIME, a GC firing inside that
    * window read an empty tag dir, dropped the tagged version from
    * the pin set, and could delete the very version the tag protected
    * (ADVICE r14). The rename leaves either the old pointer or the
    * new one on every prefix of the crash — never none. (Dir-onto-dir
    * rename cannot overwrite atomically on HDFS; a one-line file
    * can.) */
  def tagIndexSnapshot(spark: SparkSession, tagPath: String,
      tag: String, batch: Long, version: Long,
      nonce: Option[String] = None): Unit = {
    val dir = new org.apache.hadoop.fs.Path(tagPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val name = StreamingRelease.validTag(tag)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tag-$name.tmp")
    val out = fs.create(tmp, true)
    // the optional `#nonce` suffix is the RunTags generation marker
    // (StreamingRelease.splitNonce); single-store tags carry none
    try out.write(
      (s"$batch $version" +
        nonce.map(n => s"#${StreamingRelease.validNonce(n)}").getOrElse(""))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // one-time upgrade: a pre-r15 tag is a parquet DIR, and a file
    // cannot rename over a non-empty dir — remove it first. This one
    // retag is delete-then-rename (the old hazard); every later retag
    // of the name is the atomic pointer swap.
    val dest = new org.apache.hadoop.fs.Path(dir, s"tag=$name")
    if (fs.exists(dest) && fs.getFileStatus(dest).isDirectory)
      fs.delete(dest, true)
    org.apache.hadoop.fs.FileContext
      .getFileContext(dir.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(dir, s"tag=$name"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Read one tag pointer: `Some((batch, version))`, or None when the
    * tag does not exist. Pre-r15 stores wrote each tag as a 1-row
    * parquet PARTITION dir — still readable (upgrade compatibility);
    * the next re-tag of that name rewrites it as a pointer file. */
  private def readIndexTag(spark: SparkSession, tagPath: String,
      name: String): Option[(Long, Long)] =
    readIndexTagWithNonce(spark, tagPath, name).map(t => (t._1, t._2))

  private def readIndexTagWithNonce(spark: SparkSession, tagPath: String,
      name: String): Option[(Long, Long, Option[String])] = {
    val p = new org.apache.hadoop.fs.Path(s"$tagPath/tag=$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else if (fs.getFileStatus(p).isDirectory) {
      val r = spark.read.parquet(p.toString)
        .select("batch", "version").head()
      Some((r.getLong(0), r.getLong(1), None))
    } else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      val (payload, nonce) = StreamingRelease.splitNonce(s)
      val Array(b, v) = payload.split("\\s+")
      Some((b.toLong, v.toLong, nonce))
    }
  }

  /** Resolve an index tag to its (as-of batch, version) pair; unknown
    * tags fail loudly. */
  def resolveIndexTag(spark: SparkSession, tagPath: String,
      tag: String): (Long, Long) = {
    val (b, v, _) = resolveIndexTagWithNonce(spark, tagPath, tag)
    (b, v)
  }

  /** [[resolveIndexTag]] plus the generation nonce (None for pre-nonce
    * payloads, parquet-dir tags, and single-store tags) — the
    * [[graft.streaming.RunTags.resolveRun]] torn-re-tag check. */
  def resolveIndexTagWithNonce(spark: SparkSession, tagPath: String,
      tag: String): (Long, Long, Option[String]) =
    readIndexTagWithNonce(spark, tagPath, StreamingRelease.validTag(tag))
      .getOrElse(throw new IllegalArgumentException(
        s"unknown index snapshot tag '$tag' under $tagPath"))

  /** Every version named by any tag under `tagPath` — the pin set a
    * retention caller hands [[gcIndexVersions]] so tagged snapshots
    * stay servable forever. One driver listing + one tiny read per
    * tag (≤ |tags|); a concurrent re-tag is invisible (each pointer
    * read sees its old or new value, never a missing one). */
  def taggedIndexVersions(spark: SparkSession,
      tagPath: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(tagPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // existing-but-empty tag dirs (pre-created by tooling, or the last
    // tag removed) are NO tags, not a crash inside the maintenance
    // batch (review r14)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(_.getPath.getName.startsWith("tag="))
      .flatMap(s => readIndexTag(spark, tagPath,
        s.getPath.getName.stripPrefix("tag=")))
      .map(_._2).toSet
  }

  /** [[searchIncremental]] at a NAMED snapshot — resolve the tag once,
    * serve that version's artifacts as-of that batch (bit-identical to
    * the numeric as-of read the tag recorded, spec-pinned); the rerank
    * budget scales by the PINNED version's spill dial, the
    * [[searchAuto]] rule. */
  def searchAt(spark: SparkSession, store: ModelStore,
      codesPath: String, tagPath: String, tag: String,
      qVec: Map[Int, Double], qId: Long = -1L, topK: Int = 10,
      nprobe: Int = 2, m: Int = 4, dim: Int = 64,
      rerankK: Int = 100, tombPath: Option[String] = None): DataFrame = {
    val (b, v) = resolveIndexTag(spark, tagPath, tag)
    searchIncremental(spark, store, s"$codesPath/v=$v", qVec, qId,
      topK, nprobe, m, dim, rerankK * spillAt(store, v),
      version = Some(v), tombPath = tombPath, asOf = Some(b))
  }

  /** [[knnJoinIncremental]] at a NAMED snapshot — [[searchAt]]'s
    * batched twin. */
  def knnJoinAt(spark: SparkSession, store: ModelStore,
      codesPath: String, tagPath: String, tag: String,
      queries: DataFrame, topK: Int = 5, nprobe: Int = 2, m: Int = 4,
      dim: Int = 64, rerankK: Int = 50, excludeSelf: Boolean = true,
      broadcastQueries: Boolean = true,
      tombPath: Option[String] = None): DataFrame = {
    val (b, v) = resolveIndexTag(spark, tagPath, tag)
    knnJoinIncremental(spark, store, s"$codesPath/v=$v", queries,
      topK, nprobe, m, dim, rerankK * spillAt(store, v), excludeSelf,
      broadcastQueries, version = Some(v), tombPath = tombPath,
      asOf = Some(b))
  }

  /** The pinned version's spill dial (1 for pre-dials stores) — the
    * rerank-budget scaler [[searchAuto]]/[[knnJoinAuto]] apply, shared
    * so the tag serves cannot diverge from the auto serves. Cached per
    * version like the fold watermark. */
  private def spillAt(store: ModelStore, v: Long): Int = {
    // same missing-version cache guard as [[foldedWatermark]]: never
    // pin a default for a version that is not on disk yet
    val parts = store.partNamesAt(v)
    if (parts.isEmpty) 1
    else versionMeta.computeIfAbsent((store.rootPath, v, "spill"), _ =>
      if (parts.contains("dials"))
        store.loadAt(v, "dials").select("spill").head().getInt(0).toLong
      else 1L).toInt
  }

  /** Driver-contract query (`q_ivfpq_batch_inc`): the raw index
    * maintained incrementally (quantizers trained once on the full
    * corpus with empty data parts, every coded row ingested through
    * three microbatches), then the first-8 query batch served through
    * [[knnJoinIncremental]]. Pointwise encoding makes the union
    * bit-equal to the batch build, so the oracle is the batch
    * `q_ivfpq_batch` SQL VERBATIM — microbatching is invisible to the
    * batched serving tier too. */
  def ivfPqBatchIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-batchinc-codes-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      // pmod split, not count-based ranges — see
      // [[annResidualIncrementalQuery]] (ADVICE r12)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      graft.Materialize.checkpoint(
        knnJoinIncremental(spark, store, codesDir.toString,
          emb.filter(col("vec_id") < 8)))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** Driver-contract query (`q_ann_deleted`): the recall sweep over a
    * live index AFTER a takedown — quantizers train once on the full
    * corpus (deletion happens after ingest, so the frozen quantizers
    * legitimately saw the deleted vectors), two pmod microbatches
    * ingest every row, a third batch TOMBSTONES the `vec_id % 7 = 3`
    * slice, and [[searchIncremental]] serves nprobe ∈ {1, 2, 4} with
    * the tombstones in force. Truth is the brute-force cosine top-10
    * over the SURVIVING corpus — deleted search is graded against
    * deleted truth. The oracle replays the same index chain in SQL
    * with the dead slice excluded from the candidate set and the
    * truth, hash-pinning that a tombstone is indistinguishable from
    * the row never having been indexed. */
  def annDeletedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dead = pmod(col("vec_id"), lit(7)) === 3
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10, !dead).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-anndel-codes-")
    val tombDir = java.nio.file.Files
      .createTempDirectory("graft-anndel-tombs-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 2).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(2)) === b), b.toLong)
      }
      annDeleteBatch(spark, tombDir.toString)(emb.filter(dead), 2L)
      val qv = Similarity.queryVecOf(emb, 0L)
      // one-scan sweep: every nprobe branch filters the shared
      // materialized shortlist (bit-equal per np to the per-np serve)
      val rr = sweepRerankedIncremental(spark, store,
        codesDir.toString, qv, qId = 0L, npMax = 4,
        tombPath = Some(tombDir.toString))
      graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
        Similarity.sweepTopK(rr, np, 10)
          .join(truth, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), lit(10).as("k"),
            col("n_hits"),
            (col("n_hits").cast("double") / 10).as("recall"))
      }.reduce(_ union _).orderBy("nprobe"))
    } finally {
      graft.store.ModelStore.deleteRecursively(codesDir)
      graft.store.ModelStore.deleteRecursively(tombDir)
    }
  }

  /** Driver-contract query (`q_ann_filtered_inc`): the filtered recall
    * sweep over the LIVE index — quantizers trained once with empty
    * data parts, every coded row ingested through three pmod
    * microbatches, the `vec_id % 3 = 1` allowed-set predicate applied
    * by [[searchIncremental]] to the resolved candidate frame. The
    * oracle is the filtered batch sweep SQL VERBATIM
    * (`q_ann_filtered`'s): pointwise encoding makes filtering a live
    * index indistinguishable from filtering the batch-built one. */
  def annFilteredIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = pmod(col("vec_id"), lit(3)) === 1
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10, pred).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annfinc-codes-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      val qv = Similarity.queryVecOf(emb, 0L)
      // one-scan sweep: every nprobe branch filters the shared
      // materialized shortlist (bit-equal per np to the per-np serve)
      val rr = sweepRerankedIncremental(spark, store,
        codesDir.toString, qv, qId = 0L, npMax = 4, pred = Some(pred))
      graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
        Similarity.sweepTopK(rr, np, 10)
          .join(truth, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), lit(10).as("k"),
            col("n_hits"),
            (col("n_hits").cast("double") / 10).as("recall"))
      }.reduce(_ union _).orderBy("nprobe"))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** RANGE search over the live index — the radius query against
    * base ∪ increments, with the full lifecycle composition: the
    * winners rule, tombstones, an optional allowed-set predicate, and
    * the as-of cut all resolve BEFORE the shared probe+ADC-bound+
    * exact-threshold body, which dispatches on the pinned version's
    * encoding variant ([[Similarity.ivfPqRangeSearchOver]] /
    * [[Similarity.ivfPqRangeSearchResidualOver]]) — the r13 raw-only
    * refusal closed (VERDICT r13 #3): the residual ADC value bounds
    * the same global radius once each probed cell's own table has
    * scored its candidates. */
  def rangeSearchIncremental(spark: SparkSession, store: ModelStore,
      codesPath: String, qVec: Map[Int, Double], qId: Long = -1L,
      minSim: Double = 0.2, nprobe: Int = 2, m: Int = 4,
      dim: Int = 64, adcSlack: Double = 2.0,
      version: Option[Long] = None,
      tombPath: Option[String] = None,
      pred: Option[org.apache.spark.sql.Column] = None,
      asOf: Option[Long] = None): DataFrame = {
    val (coded0, vectors, variant, ld) =
      unionServeFrames(spark, store, codesPath, version, tombPath, asOf)
    val coded = pred.map(coded0.filter).getOrElse(coded0)
    if (variant == "residual")
      Similarity.ivfPqRangeSearchResidualOver(ld("coarse"), coded,
        vectors, ld("codebooks"), qVec, qId, minSim, nprobe, m, dim,
        adcSlack)
    else
      Similarity.ivfPqRangeSearchOver(ld("coarse"), coded, vectors,
        ld("codebooks"), qVec, qId, minSim, nprobe, m, dim, adcSlack)
  }

  /** Driver-contract query (`q_ann_range_inc`): the radius query over
    * the live index — quantizers shared-frozen, every coded row
    * ingested through three pmod microbatches, the radius served
    * through [[rangeSearchIncremental]]. Pointwise encoding makes the
    * union bit-equal to the batch build, so the oracle is the batch
    * `q_ann_range` SQL VERBATIM. */
  def annRangeIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annrinc-codes-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      graft.Materialize.checkpoint(
        rangeSearchIncremental(spark, store, codesDir.toString,
          Similarity.queryVecOf(emb, 0L), qId = 0L))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** Driver-contract query (`q_ann_tagged`): the recall sweep served
    * at a NAMED index snapshot — three pmod microbatches ingested, the
    * tag "run-7" names (batch 1, the current version), the sweep
    * serves through [[searchAt]]. The oracle is the as-of sweep SQL
    * VERBATIM (`q_ann_asof`'s): a tag is a pointer, and resolving it
    * is hash-invisible next to the numeric as-of read it names. */
  def annTaggedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val member = pmod(col("vec_id"), lit(3)) =!= 2
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10, member).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-anntag-codes-")
    val tagDir = java.nio.file.Files
      .createTempDirectory("graft-anntag-tags-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      val vp = versionedCodesPath(codesDir.toString, store)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, vp)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      tagIndexSnapshot(spark, tagDir.toString, "run-7", 1L,
        store.currentVersion.getOrElse(0L))
      val qv = Similarity.queryVecOf(emb, 0L)
      // one-scan sweep: every nprobe branch filters the shared
      // materialized shortlist (bit-equal per np to the per-np serve)
      val rr = sweepRerankedAt(spark, store, codesDir.toString,
        tagDir.toString, "run-7", qv, qId = 0L, npMax = 4)
      graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
        Similarity.sweepTopK(rr, np, 10)
          .join(truth, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), lit(10).as("k"),
            col("n_hits"),
            (col("n_hits").cast("double") / 10).as("recall"))
      }.reduce(_ union _).orderBy("nprobe"))
    } finally {
      graft.store.ModelStore.deleteRecursively(codesDir)
      graft.store.ModelStore.deleteRecursively(tagDir)
    }
  }

  /** Process-shared drift REFERENCE over `dir`'s embeddings at the
    * default dials — the [[llm.Similarity.sharedQuantizers]]
    * discipline for the retention gates' monitor input: the reference
    * is a deterministic train-once artifact, so sharing it across
    * gates is oracle-invisible. Consumers must treat it as READ-ONLY
    * (the gates disable the rebuild arm, which is the only writer). */
  private def sharedDriftReference(spark: SparkSession,
      dir: String): ModelStore =
    ModelStore.shared(spark, Seq("ann-driftref",
      graft.store.ArtifactCache.tableFingerprint(dir, "embeddings"),
      "calibMod=4", "buckets=10")) { ds =>
      saveDriftReference(
        spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(pmod(col("vec_id"), lit(4)) === 0),
        Similarity.sharedQuantizers(spark, dir), ds); ()
    }

  /** Driver-contract query (`q_ann_run`): the recall sweep served at
    * a COMPOSITE run tag ([[RunTags.searchAtRun]]) — the corpus half
    * tagged on the release tag store, the index half on the index tag
    * store, both under one name, the serve gated on the run resolving
    * WHOLE. The oracle is the as-of sweep SQL VERBATIM (`q_ann_asof`'s,
    * same as `q_ann_tagged`): a run tag is two pointers, and resolving
    * them is hash-invisible next to the numeric as-of read they name.
    * The gate also REQUIREs the half-tagged refusal live (the index
    * half alone must not serve). */
  def annRunTaggedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val member = pmod(col("vec_id"), lit(3)) =!= 2
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10, member).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annrun-codes-")
    val relTagDir = java.nio.file.Files
      .createTempDirectory("graft-annrun-reltags-")
    val idxTagDir = java.nio.file.Files
      .createTempDirectory("graft-annrun-idxtags-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      val vp = versionedCodesPath(codesDir.toString, store)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, vp)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      val v = store.currentVersion.getOrElse(0L)
      // a half-tagged run (index half only) must refuse before the
      // complete tagRun lands
      tagIndexSnapshot(spark, idxTagDir.toString, "train-15", 1L, v)
      val refused =
        try { RunTags.resolveRun(spark, "train-15", relTagDir.toString,
          idxTagDir.toString); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("half-tagged") }
      require(refused, "half-tagged run served instead of refusing")
      RunTags.tagRun(spark, "train-15", relTagDir.toString, 1L,
        idxTagDir.toString, 1L, v)
      val qv = Similarity.queryVecOf(emb, 0L)
      // one-scan sweep: every nprobe branch filters the shared
      // materialized shortlist (bit-equal per np to the per-np serve)
      val rr = RunTags.sweepRerankedAtRun(spark, "train-15", store,
        codesDir.toString, relTagDir.toString, idxTagDir.toString,
        qv, qId = 0L, npMax = 4)
      graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
        Similarity.sweepTopK(rr, np, 10)
          .join(truth, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), lit(10).as("k"),
            col("n_hits"),
            (col("n_hits").cast("double") / 10).as("recall"))
      }.reduce(_ union _).orderBy("nprobe"))
    } finally Seq(codesDir, relTagDir, idxTagDir)
      .foreach(graft.store.ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_ann_autopilot`): the ONE-CALL
    * [[annAutopilot]] preset driven across three pmod microbatches —
    * per-batch compaction flips, version GC, the automated base-corpus
    * rewrite, and the folded-batch purge all fire inside the gate
    * (REQUIREd: one version on disk, base store populated, purged raw
    * dirs gone) — then the recall sweep serves through [[searchAuto]].
    * The oracle is the batch recall SQL VERBATIM: a deployment that
    * has only ever been touched by the autopilot serves bit-identically
    * to a never-retained build. Rebuild hard-off as in
    * [[annRetainedQuery]] (a retrain is correct but a different index
    * than the oracle's full-corpus quantizers). */
  def annAutopilotQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10).select("vec_id"))
    val names = Seq("codes", "mon", "raw", "tomb", "base")
    val dirs = names.map(n =>
      java.nio.file.Files.createTempDirectory(s"graft-annap-$n-"))
    val Seq(codesDir, monDir, rawDir, tombDir, baseDir) = dirs
    try {
      graft.store.ModelStore.scratch(spark, "annap") { store =>
        // the [[annRetainedQuery]] bootstrap: clone the shared trained
        // quantizers into the gate's own mutable store, read the
        // shared drift reference (rebuild arm off — no writer)
        store.cloneCurrentFrom(Similarity.sharedQuantizers(spark, dir),
          partitioned = Map("codes" -> Seq("cid")))
        val driftStore = sharedDriftReference(spark, dir)
        val baseStore = new ModelStore(spark, baseDir.toString)
        val auto = annAutopilot(spark, store, driftStore, baseStore,
          codesDir.toString, monDir.toString, rawDir.toString,
          tombDir.toString, threshold = Double.MaxValue,
          minRebuildN = Long.MaxValue, compactRatio = 0.0,
          minCompactN = 1L, gcKeepVersions = 1,
          purgeKeepRecent = 0L) _
        // two flips cover the full cycle twice: GC has something to
        // reclaim at each, the base rewrite feeds flip 2's fold, and
        // the purge runs against a purgeable floor both times
        (0 until 2).foreach { b =>
          auto(emb.filter(pmod(col("vec_id"), lit(2)) === b), b.toLong)
        }
        // retention provably ran: one index version, a rewritten base,
        // and the purged raw dirs physically gone
        require(store.versions.size == 1,
          s"autopilot GC left versions: ${store.versions}")
        require(baseStore.currentVersion.nonEmpty &&
          baseStore.versions.size == 1,
          "autopilot did not maintain its base corpus")
        require(StreamingDedup.listBatches(spark, rawDir.toString)
          .map(_._1).forall(_ > 1L),
          "autopilot purge left raw batches at or below the floor")
        val qv = Similarity.queryVecOf(emb, 0L)
        // one-scan sweep: every nprobe branch filters the shared
        // materialized shortlist (bit-equal per np to the per-np serve)
        val rr = sweepRerankedAuto(spark, store, codesDir.toString,
          qv, qId = 0L, npMax = 4, tombPath = Some(tombDir.toString))
        graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
          Similarity.sweepTopK(rr, np, 10)
            .join(truth, "vec_id")
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(np).as("nprobe"), lit(10).as("k"),
              col("n_hits"),
              (col("n_hits").cast("double") / 10).as("recall"))
        }.reduce(_ union _).orderBy("nprobe"))
      }
    } finally dirs.foreach(graft.store.ModelStore.deleteRecursively)
  }

  /** Driver-contract query (`q_ann_retained`, VERDICT r14 #1): the
    * FULL retention lifecycle inside one hash-checked gate. The index
    * is maintained through [[annMaintainBatch]] with every retention
    * arm LIVE — per-batch compaction (minCompactN = 1), version GC
    * (keepLast = 1) with tag-pinned protection resolved at GC time,
    * and a final [[purgeFolded]] of the raw batches the folds
    * absorbed — then the recall sweep serves through [[searchAuto]].
    * Retention is invisible by construction (GC'd versions were
    * superseded, purged batches were below every protected version's
    * fold watermark), so the oracle is the batch recall SQL VERBATIM:
    * the DuckDB replay hash-pins that a GC'd + purged deployment
    * serves bit-identically to a never-retained build. The gate also
    * REQUIRES the reclaimed state physically gone mid-flight — a green
    * row proves directories were deleted, not merely ignorable.
    *
    * The rebuild arm is hard-disabled (threshold/minRebuildN maxed):
    * a rebuild retrains quantizers on a pmod slice, which is a
    * different (correct) index than the oracle's full-corpus
    * quantizers — compaction + GC + purge are the retention arms
    * under test, and none of them may touch a weight. The purge's
    * base-rewrite contract is vacuous here: the maintain base is the
    * empty frame and no rebuild ever reads the raw store again. */
  def annRetainedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annret-codes-")
    val monDir = java.nio.file.Files
      .createTempDirectory("graft-annret-mon-")
    val rawDir = java.nio.file.Files
      .createTempDirectory("graft-annret-raw-")
    val tagDir = java.nio.file.Files
      .createTempDirectory("graft-annret-tags-")
    try {
      // GC mutates the store — a scratch build, never the shared one;
      // but the trained artifacts are deterministic, so v0 CLONES the
      // process-shared quantizer store (zero training jobs) and the
      // monitor reads the shared drift reference (read-only here —
      // the rebuild arm, the only writer, is disabled below)
      graft.store.ModelStore.scratch(spark, "annret") { store =>
        store.cloneCurrentFrom(Similarity.sharedQuantizers(spark, dir),
          partitioned = Map("codes" -> Seq("cid")))
        val driftStore = sharedDriftReference(spark, dir)
        val body = annMaintainBatch(spark, store, driftStore,
          base = emb.limit(0), codesPath = codesDir.toString,
          monitorPath = monDir.toString, rawPath = rawDir.toString,
          calibMod = 4, threshold = Double.MaxValue,
          minRebuildN = Long.MaxValue, compactRatio = 0.0,
          minCompactN = 1L, gcKeepVersions = 1,
          gcTagPath = Some(tagDir.toString)) _
        // two flips are the minimal COMPLETE proof: flip 1's GC must
        // reclaim something (v0), flip 2's GC must run with the tag
        // live and protect the pinned version
        body(emb.filter(pmod(col("vec_id"), lit(2)) === 0), 0L) // → v1
        val v1 = store.currentVersion.getOrElse(0L)
        // the loop's own GC (keepLast=1, no tags yet) reclaimed v0
        require(store.versions == Seq(v1),
          s"in-loop GC left superseded versions: ${store.versions}")
        // pin v1 through a tag, then let batch 1's GC run with the tag
        // store live: the pin must protect it past the keepLast window
        tagIndexSnapshot(spark, tagDir.toString, "run-15", 0L, v1)
        body(emb.filter(pmod(col("vec_id"), lit(2)) === 1), 1L) // → v2
        val v2 = store.currentVersion.getOrElse(0L)
        require(store.versions == Seq(v1, v2),
          s"tag-pinned GC broke: ${store.versions} (want v$v1, v$v2)")
        // purge the raw batches every protected fold absorbed: floor =
        // min(wm(v2)=1, wm(tagged v1)=0) = 0, so batch 0 goes
        purgeFolded(spark, store, codesDir.toString, 0L,
          rawPath = Some(rawDir.toString),
          tagPath = Some(tagDir.toString))
        require(StreamingDedup.listBatches(spark, rawDir.toString)
          .map(_._1).sorted == Seq(1L),
          "purgeFolded left raw batches at or below the floor")
        val qv = Similarity.queryVecOf(emb, 0L)
        // one-scan sweep: every nprobe branch filters the shared
        // materialized shortlist (bit-equal per np to the per-np serve)
        val rr = sweepRerankedAuto(spark, store, codesDir.toString,
          qv, qId = 0L, npMax = 4)
        graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
          Similarity.sweepTopK(rr, np, 10)
            .join(truth, "vec_id")
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(np).as("nprobe"), lit(10).as("k"),
              col("n_hits"),
              (col("n_hits").cast("double") / 10).as("recall"))
        }.reduce(_ union _).orderBy("nprobe"))
      }
    } finally Seq(codesDir, monDir, rawDir, tagDir)
      .foreach(graft.store.ModelStore.deleteRecursively)
  }

  /** The radius-query LIFECYCLE rows (`q_ann_range_filtered` /
    * `q_ann_range_deleted` / `q_ann_range_asof` /
    * `q_ann_range_residual_inc`): the full {filtered, deleted, as-of}
    * × radius matrix over the live index, plus the residual variant
    * maintained incrementally — each a one-line composition over
    * [[rangeSearchIncremental]], each oracle the range SQL with the
    * membership predicate injected (the r13 builder pattern: a
    * lifecycle op on the radius serve is hash-pinned to the plain
    * radius chain over the surviving candidates). */
  def annRangeFilteredQuery(spark: SparkSession, dir: String): DataFrame =
    rangeLifecycleQuery(spark, dir,
      pred = Some(pmod(col("vec_id"), lit(3)) === 1))

  def annRangeAsOfQuery(spark: SparkSession, dir: String): DataFrame =
    rangeLifecycleQuery(spark, dir, asOf = Some(1L))

  def annRangeResidualIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame =
    rangeLifecycleQuery(spark, dir, residual = true)

  def annRangeDeletedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annrdel-codes-")
    val tombDir = java.nio.file.Files
      .createTempDirectory("graft-annrdel-tombs-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 2).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(2)) === b), b.toLong)
      }
      annDeleteBatch(spark, tombDir.toString)(
        emb.filter(pmod(col("vec_id"), lit(7)) === 3), 2L)
      graft.Materialize.checkpoint(
        rangeSearchIncremental(spark, store, codesDir.toString,
          Similarity.queryVecOf(emb, 0L), qId = 0L,
          tombPath = Some(tombDir.toString)))
    } finally {
      graft.store.ModelStore.deleteRecursively(codesDir)
      graft.store.ModelStore.deleteRecursively(tombDir)
    }
  }

  private def rangeLifecycleQuery(spark: SparkSession, dir: String,
      pred: Option[org.apache.spark.sql.Column] = None,
      asOf: Option[Long] = None, residual: Boolean = false): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annrlc-codes-")
    try {
      val store =
        if (residual) Similarity.sharedResidualQuantizers(spark, dir)
        else Similarity.sharedQuantizers(spark, dir)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      graft.Materialize.checkpoint(
        rangeSearchIncremental(spark, store, codesDir.toString,
          Similarity.queryVecOf(emb, 0L), qId = 0L, pred = pred,
          asOf = asOf))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** Driver-contract query (`q_ivfpq_batch_deleted`): the batched
    * serving tier under a takedown — two pmod microbatches ingest the
    * corpus, the `vec_id % 7 = 3` slice is tombstoned, and the first-8
    * query batch serves through [[knnJoinIncremental]] with the
    * tombstones in force (a deleted id is a fine QUERY — a query need
    * not be a corpus member — it just cannot be a RESULT). The oracle
    * is the batch serving SQL with the dead slice excluded from the
    * candidates. */
  def ivfPqBatchDeletedQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-batchdel-codes-")
    val tombDir = java.nio.file.Files
      .createTempDirectory("graft-batchdel-tombs-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 2).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(2)) === b), b.toLong)
      }
      annDeleteBatch(spark, tombDir.toString)(
        emb.filter(pmod(col("vec_id"), lit(7)) === 3), 2L)
      graft.Materialize.checkpoint(
        knnJoinIncremental(spark, store, codesDir.toString,
          emb.filter(col("vec_id") < 8),
          tombPath = Some(tombDir.toString)))
    } finally {
      graft.store.ModelStore.deleteRecursively(codesDir)
      graft.store.ModelStore.deleteRecursively(tombDir)
    }
  }

  /** Driver-contract query (`q_ivfpq_batch_asof`): the batched serving
    * tier time-traveled — three pmod microbatches, the first-8 query
    * batch served as-of batch 1 through [[knnJoinIncremental]]. The
    * oracle is the batch serving SQL with the as-of membership as the
    * candidate predicate. */
  def ivfPqBatchAsOfQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-batchasof-codes-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      graft.Materialize.checkpoint(
        knnJoinIncremental(spark, store, codesDir.toString,
          emb.filter(col("vec_id") < 8), asOf = Some(1L)))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }

  /** Driver-contract query (`q_ann_asof`): the TIME-TRAVEL read —
    * three pmod microbatches ingested, the recall sweep served AS-OF
    * batch 1, i.e. over exactly the rows batches 0–1 committed
    * (`vec_id % 3 ∈ {0, 1}`); batch 2's rows exist on disk but are
    * partition-pruned out of the read. Truth is the brute-force top-10
    * over the as-of corpus. The oracle is the filtered sweep SQL with
    * the as-of membership as the predicate — a hash match pins that an
    * as-of read equals an index that never ingested the later batch
    * (training reproducibility: the corpus a run saw is recoverable
    * forever). The quantizers are version-pinned separately and
    * legitimately predate nothing here (trained once on the full
    * corpus, as the oracle's chains are). */
  def annAsOfQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val member = pmod(col("vec_id"), lit(3)) =!= 2
    // materialized once — one exact scan feeds every nprobe branch
    val truth = graft.Materialize.checkpoint(
      Similarity.cosineTopK(spark, dir, 0L, 10, member).select("vec_id"))
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-annasof-codes-")
    try {
      val store = Similarity.sharedQuantizers(spark, dir)
      (0 until 3).foreach { b =>
        annIngestBatch(spark, store, codesDir.toString)(
          emb.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
      }
      val qv = Similarity.queryVecOf(emb, 0L)
      // one-scan sweep: every nprobe branch filters the shared
      // materialized shortlist (bit-equal per np to the per-np serve)
      val rr = sweepRerankedIncremental(spark, store,
        codesDir.toString, qv, qId = 0L, npMax = 4, asOf = Some(1L))
      graft.Materialize.checkpoint(Seq(1, 2, 4).map { np =>
        Similarity.sweepTopK(rr, np, 10)
          .join(truth, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), lit(10).as("k"),
            col("n_hits"),
            (col("n_hits").cast("double") / 10).as("recall"))
      }.reduce(_ union _).orderBy("nprobe"))
    } finally graft.store.ModelStore.deleteRecursively(codesDir)
  }
}
