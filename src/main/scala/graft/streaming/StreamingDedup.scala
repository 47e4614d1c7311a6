package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming/incremental exact dedup — the ingest-side complement of
  * [[graft.llm.Dedup.exact]]. A 100 TB corpus is never re-deduped wholesale:
  * each increment is deduped (a) against itself in flight and (b) against
  * the hashes of everything already ingested, reading only the narrow hash
  * column, never the stored document text.
  *
  * Reference scope note: the reference pipeline is Kafka-in/out streaming
  * (`scripts/get_entity_job.py`); this module applies the same
  * Structured-Streaming patterns (watermarked state, idempotent foreachBatch)
  * to the LLM-data dedup family.
  */
object StreamingDedup {

  /** (a) In-flight dedup: drop re-arrivals of the same content hash within
    * the watermark horizon. State is bounded by the horizon (Spark evicts
    * keys older than the watermark), NOT by corpus size — the property that
    * keeps the state store finite on an unbounded crawl stream. Emits the
    * first arrival of each hash. */
  def inFlight(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")

  /** Rows of `batch` that survive exact dedup against the batch itself
    * (min doc_id per hash — same survivor rule as `Dedup.exact`) and
    * against the prior hash set. Pure batch logic, unit-testable. */
  def novelInBatch(batch: DataFrame, priorHashes: DataFrame): DataFrame = {
    val w = Window.partitionBy("h").orderBy("doc_id")
    batch.withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .join(priorHashes.select("h"), Seq("h"), "left_anti")
  }

  /** Hash-set reader: the store is parquet partitioned by ingest batch
    * (`batch=N` dirs), so "all hashes before batch B" is a partition-pruned
    * scan of one narrow string column. Returns None when nothing has been
    * ingested yet. */
  def readHashes(spark: SparkSession, storePath: String): Option[DataFrame] = {
    val root = new java.io.File(storePath)
    val parts = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    if (parts.isEmpty) None
    else Some(spark.read.option("basePath", storePath)
      .parquet(parts.map(_.getPath): _*))
  }

  /** (b) Cross-run incremental dedup as an idempotent foreachBatch body:
    * survivors of microbatch `batchId` are written to `outPath/batch=N`
    * and their hashes to `storePath/batch=N`, both with OVERWRITE — a
    * replayed batch rewrites its own partition and reads only hashes from
    * STRICTLY EARLIER batches, so retry produces byte-identical output
    * (effectively-once without a transaction log). */
  def dedupBatch(spark: SparkSession, storePath: String, outPath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val prior = readHashes(spark, storePath)
      .map(_.filter(col("batch") < batchId).select("h"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("h", org.apache.spark.sql.types.StringType)))
    val novel = graft.Materialize.checkpoint(novelInBatch(batch, prior))
    novel.select("h").write.mode("overwrite")
      .parquet(s"$storePath/batch=$batchId")
    novel.drop("h").write.mode("overwrite")
      .parquet(s"$outPath/batch=$batchId")
  }

  /** Compact hash-store partitions `batch < upToBatch` into the
    * `batch=upToBatch` dir — the small-files countermeasure for a store
    * that gains one directory per microbatch (at one batch/minute that is
    * half a million dirs a year; scan planning dies long before the data).
    *
    * Crash-safe because the visible hash set only ever GROWS until the
    * final deletes: the older dirs' hashes are APPENDED into
    * `batch=upToBatch` (its own files are never rewritten), and the source
    * dirs are deleted only after the append's commit. A crash mid-append
    * leaves an ignored `_temporary` dir; a crash mid-delete leaves hashes
    * present in two partitions — the anti-join consumer cannot observe
    * either (set semantics, duplicates are harmless).
    *
    * Operational constraints: (a) only compact batches older than the
    * stream's replay horizon — a replayed batch must still see itself
    * excluded from "prior", which compaction into a lower-or-equal batch
    * id preserves; (b) run it from the stream's driver thread between
    * microbatches (e.g. at the top of foreachBatch) — deleting source
    * dirs races an in-flight readHashes scan otherwise. */
  def compactHashes(spark: SparkSession, storePath: String,
      upToBatch: Long): Unit = {
    val root = new java.io.File(storePath)
    val old = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory &&
        f.getName.stripPrefix("batch=").toLongOption.exists(_ < upToBatch))
    if (old.isEmpty) return
    spark.read.option("basePath", storePath)
      .parquet(old.map(_.getPath): _*)
      .select("h").distinct()
      .write.mode("append").parquet(s"$storePath/batch=$upToBatch")
    import scala.jdk.CollectionConverters._
    old.foreach { d =>
      java.nio.file.Files.walk(d.toPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }
  }

  /** Wire a (doc_id, text) stream through the incremental dedup. */
  def incrementalDedup(docs: DataFrame, storePath: String, outPath: String,
      checkpoint: String): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream
      .foreachBatch(dedupBatch(spark, storePath, outPath) _)
      .option("checkpointLocation", checkpoint)
  }
}
