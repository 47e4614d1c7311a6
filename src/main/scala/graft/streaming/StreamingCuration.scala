package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.llm.{Dedup, TextCuration}

/** Incremental curation FUNNEL (VERDICT r6 #7): the stateless quality
  * gates, the per-source quota, and the incremental near-dup composed
  * into one `foreachBatch` body — the live-ingest counterpart of
  * [[graft.llm.Curation.curationFunnel]]. A 100 TB crawl is curated as
  * it arrives, not in a nightly wholesale re-run; each microbatch pays
  * only for its own rows plus narrow partition-pruned probes of the
  * stores.
  *
  * Stage order (admission first, cheap shape gates next, pairwise dedup
  * last — the shrinking-set cost order of the batch funnel):
  *
  *   1. quota     — admit each source's first `quota` docs across the
  *                  whole stream history (per-source counter store)
  *   2. gopher    — document-shape rule battery (stateless)
  *   3. c4        — line punctuation/contaminant screens (stateless)
  *   4. near-dup  — MinHash/LSH against the batch itself and the
  *                  signature store ([[StreamingDedup.novelNearDupInBatch]])
  *
  * State lives in three `batch=N` parquet stores sharing
  * [[StreamingDedup]]'s idempotent-replay contract (overwrite own
  * partition, read strictly-earlier batches only):
  *
  *   - `countsPath`: (source, n) admitted-candidate counts per batch —
  *     one row per source per batch, so the prior-seen lookup is a
  *     partition-pruned scan of a table with |sources|·batches rows.
  *   - `sigPath`: capped band rows of every GATE-SURVIVING doc (dropped
  *     near-dups included — transitive recall, see
  *     [[StreamingDedup.novelNearDupInBatch]]). Gate-REJECTED docs never
  *     enter the store: they were never corpus candidates, exactly as
  *     the batch funnel dedups only gate survivors.
  *   - `outPath`: the batch's funnel survivors.
  *
  * Stage counts are written to `statsPath/batch=N` (batch, stage, ord,
  * n_in, n_kept) — the same funnel-report shape as the batch
  * `curationFunnel`, accumulated by [[funnelReport]].
  *
  * DETERMINISM: quota admission within a batch is by ascending doc_id
  * (a deterministic rule over the batch's SET, not its arrival order) —
  * replays admit the same rows, and parity with a batch run needs only
  * "batches partition the corpus in ascending doc_id order", which
  * StreamingCurationSpec pins: stage counts AND survivor sets over
  * concatenated microbatches equal the batch reference funnel's.
  * [[StreamingQuota]] remains the pure arrival-order alternative for
  * feeds without a monotone id.
  */
object StreamingCuration {

  /** Batch reference funnel with IDENTICAL stage semantics — the parity
    * oracle for the streaming body, and a usable batch funnel in its own
    * right: quota (first `quota` per source by doc_id) → gopher → c4 →
    * near-dup (min-id survivor per cluster). Returns the survivor frame;
    * stage counts via [[referenceFunnelStages]]. */
  def referenceFunnel(docs: DataFrame, quota: Long,
      minEstSim: Double = 0.5): DataFrame =
    referenceFunnelStages(docs, quota, minEstSim).last._2

  /** (stage-name, survivors) after each stage of [[referenceFunnel]]. */
  def referenceFunnelStages(docs: DataFrame, quota: Long,
      minEstSim: Double = 0.5): Seq[(String, DataFrame)] = {
    val wq = Window.partitionBy("source").orderBy("doc_id")
    val admitted = docs.withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") <= quota).drop("_rk")
    val gopher = admitted.join(
      TextCuration.gopherRulesOf(admitted).filter(col("keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val c4 = gopher.join(
      TextCuration.c4RulesOf(gopher).filter(col("doc_keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val nearDup = c4.join(
      Dedup.dupClustersOf(c4, minEstSim).filter(col("is_survivor") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    Seq("quota" -> admitted, "gopher" -> gopher, "c4" -> c4,
      "near_dup" -> nearDup)
  }

  private def priorSourceCounts(spark: SparkSession, countsPath: String,
      batchId: Long): DataFrame =
    StreamingDedup.readStore(spark, countsPath)
      .map(_.filter(col("batch") < batchId)
        .groupBy("source").agg(sum("n").as("seen")))
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("source", org.apache.spark.sql.types.StringType)
          .add("seen", org.apache.spark.sql.types.LongType)))

  /** The idempotent foreachBatch body. `batch` needs (doc_id, source,
    * text); extra columns ride along to `outPath`. */
  def funnelBatch(spark: SparkSession, countsPath: String, sigPath: String,
      outPath: String, statsPath: String, quota: Long,
      minEstSim: Double = 0.5,
      storeBucketCap: Int = StreamingDedup.DefaultStoreBucketCap)(
      batch: DataFrame, batchId: Long): Unit = {
    // 1. quota: per-source rank by doc_id within the batch, offset by the
    // prior batches' admission counts. The counter store counts QUOTA
    // candidates (all arrivals), so seen+rank is the doc's global
    // admission index — the same "first N per source" rule however the
    // corpus is sliced into batches.
    val prior = priorSourceCounts(spark, countsPath, batchId)
    val wq = Window.partitionBy("source").orderBy("doc_id")
    val (ranked, nIn) = graft.Materialize.checkpointCounted(
      batch.withColumn("_rk", row_number().over(wq))
        .join(broadcast(prior), Seq("source"), "left")
        .withColumn("_idx", col("_rk") + coalesce(col("seen"), lit(0L))))
    val (admitted, nQuota) = graft.Materialize.checkpointCounted(
      ranked.filter(col("_idx") <= quota).drop("_rk", "seen", "_idx"))

    // 2+3. stateless shape gates over the admitted rows
    val (gopher, nGopher) = graft.Materialize.checkpointCounted(
      admitted.join(
        TextCuration.gopherRulesOf(admitted).filter(col("keep") === 1)
          .select("doc_id"), Seq("doc_id"), "left_semi"))
    val (c4, nC4) = graft.Materialize.checkpointCounted(
      gopher.join(
        TextCuration.c4RulesOf(gopher).filter(col("doc_keep") === 1)
          .select("doc_id"), Seq("doc_id"), "left_semi"))

    // 4. near-dup against the batch itself + the signature store
    val priorSigs = StreamingDedup.readSignatures(spark, sigPath)
      .map(_.filter(col("batch") < batchId)
        .select("doc_id", "sig", "band", "bh"))
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType)
          .add("sig", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))
          .add("band", org.apache.spark.sql.types.IntegerType)
          .add("bh", org.apache.spark.sql.types.StringType)))
    val (novelRaw, bands) =
      StreamingDedup.novelNearDupInBatch(c4, priorSigs, minEstSim)
    val (novel, nNovel) = graft.Materialize.checkpointCounted(novelRaw)

    // persist: counter rows, capped signatures, survivors, stage counts —
    // each an overwrite of this batch's own partition (replay-safe)
    batch.groupBy("source").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$countsPath/batch=$batchId")
    graft.Materialize.checkpoint(
        StreamingDedup.capBandRows(bands, storeBucketCap))
      .write.mode("overwrite").parquet(s"$sigPath/batch=$batchId")
    novel.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    import spark.implicits._
    Seq(("quota", 1, nIn, nQuota), ("gopher", 2, nQuota, nGopher),
      ("c4", 3, nGopher, nC4), ("near_dup", 4, nC4, nNovel))
      .toDF("stage", "ord", "n_in", "n_kept")
      .write.mode("overwrite").parquet(s"$statsPath/batch=$batchId")
  }

  /** Accumulated funnel report across all ingested batches: (stage, ord,
    * n_in, n_kept) summed over batches — comparable row-for-row with the
    * batch `curationFunnel` report shape. */
  def funnelReport(spark: SparkSession, statsPath: String): DataFrame =
    StreamingDedup.readStore(spark, statsPath)
      .map(_.groupBy("stage", "ord")
        .agg(sum("n_in").as("n_in"), sum("n_kept").as("n_kept"))
        .orderBy("ord"))
      .getOrElse(spark.emptyDataFrame)

  /** Wire a (doc_id, source, text) stream through the incremental
    * funnel. */
  def incrementalFunnel(docs: DataFrame, countsPath: String, sigPath: String,
      outPath: String, statsPath: String, checkpoint: String, quota: Long,
      minEstSim: Double = 0.5,
      storeBucketCap: Int = StreamingDedup.DefaultStoreBucketCap)
      : DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream
      .foreachBatch(funnelBatch(spark, countsPath, sigPath, outPath,
        statsPath, quota, minEstSim, storeBucketCap) _)
      .option("checkpointLocation", checkpoint)
  }
}
