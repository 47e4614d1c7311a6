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
      batch: DataFrame, batchId: Long): Unit = {
    val prior = StreamingDedup.readHashes(spark, hashPath)
      .map(_.filter(col("batch") < batchId).select("h"))
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("h", org.apache.spark.sql.types.StringType)))
    // one candidate per hash within the batch (min doc_id — doc_id is
    // unique, so the struct-min is decided by it), then drop hashes any
    // earlier batch already keeps
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
    val docs = novel.select("doc_id", "lang", "text")
    val scored = TextOps.lmScoreRowsPersisted(docs, lmStore, trainLang)
      .join(docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tok")),
        Seq("doc_id"))
    scored.write.mode("overwrite").parquet(s"$scorePath/batch=$batchId")
  }

  /** The release manifest over everything ingested so far: the score
    * ledger through the shared tertile+shard body — equals
    * [[graft.llm.TextOps.corpusRelease]] on the union of the ingested
    * batches (spec-pinned parity; empty ledger → empty manifest). */
  def releaseManifest(spark: SparkSession, scorePath: String,
      shards: Int = 8): DataFrame =
    StreamingDedup.readStore(spark, scorePath) match {
      case Some(scored) =>
        TextOps.releaseManifestFrom(scored.drop("batch"), shards)
      case None =>
        import org.apache.spark.sql.types.{IntegerType, LongType,
          StructType}
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          new StructType().add("shard", IntegerType)
            .add("n_docs", LongType).add("tot_tokens", LongType))
    }

  /** Wire a (doc_id, lang, text) stream through the incremental
    * release ingest. */
  def incrementalRelease(docs: DataFrame, lmStore: ModelStore,
      hashPath: String, scorePath: String, checkpoint: String,
      trainLang: String = "en"): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch(releaseIngestBatch(docs.sparkSession, lmStore,
        hashPath, scorePath, trainLang) _)
      .option("checkpointLocation", checkpoint)

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
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      val sliced = docs.withColumn("__s", ntile(3).over(w))
        .localCheckpoint(true)
      val ingest = releaseIngestBatch(spark, lmStore,
        hashDir.toString, scoreDir.toString) _
      (1 to 3).foreach { s =>
        ingest(sliced.filter(col("__s") === s).drop("__s"), s - 1L)
      }
      graft.Materialize.checkpoint(
        releaseManifest(spark, scoreDir.toString))
    } finally Seq(hashDir, scoreDir).foreach(
      ModelStore.deleteRecursively)
  }
}
