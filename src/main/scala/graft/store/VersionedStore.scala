package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned entity store (SURVEY §1.1 / FIXTURES §7): the engine-owned
  * replacement for the reference's Elasticsearch audit index
  * (`/root/reference/scripts/publish_state_job.py:77-84` — doc id
  * "{guid}_{updateTime}").
  *
  * Layout: parquet partitioned/bucketed by guid hash so the as-of join and
  * per-guid history scans are co-located. At 100 TB: bucket count sized to
  * executor memory; appends are per-microbatch; compaction is a rewrite of
  * hot buckets only.
  */
object VersionedStore {

  /** S4: append entity versions with the doc-id key. `nBuckets` pre-shuffles
    * by guid so downstream per-guid reads don't re-shuffle. */
  def append(versions: DataFrame, path: String, nBuckets: Int = 32): Unit =
    versions
      .withColumn("docId",
        concat_ws("_", col("guid"), col("updateTime"))) // P13
      .repartition(nBuckets, col("guid"))
      .write.mode(SaveMode.Append)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Catalog-backed bucketed layout: `bucketBy(guid) sortBy(updateTime)`.
    * Joins and windows keyed on guid between co-bucketed tables then plan
    * with NO exchange — at 100 TB the as-of join against the store becomes
    * shuffle-free (SURVEY §4.2 "partition versioned store by guid bucket"). */
  def appendBucketed(versions: DataFrame, table: String,
      nBuckets: Int = 32): Unit =
    versions
      .withColumn("docId", concat_ws("_", col("guid"), col("updateTime")))
      .write.mode(SaveMode.Append)
      .bucketBy(nBuckets, "guid")
      .sortBy("updateTime")
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Deterministic tiebreak for equal-updateTime versions, matching
    * EntityDiff.withPrevious (content hash over the diff-relevant columns
    * when present, every non-key column otherwise) — "latest" must be the
    * same row the diff treated as last, or cross-batch seeds diverge from
    * the in-batch ordering. */
  private def contentTie(store: DataFrame): org.apache.spark.sql.Column = {
    val diffCols = graft.diff.EntityDiff.tieCols
    val cols =
      if (diffCols.forall(store.columns.contains)) diffCols
      else store.columns.toSeq
        .filterNot(Seq("guid", "updateTime", "docId").contains)
    if (cols.isEmpty) lit("")
    else md5(to_json(struct(cols.map(col): _*)))
  }

  /** S5/J3: as-of read — latest version strictly before `asOfTime` per guid
    * (the reference's per-record ES query `determine_change_job.py:194-227`
    * as one windowed scan). */
  def asOf(store: DataFrame, asOfTime: Long): DataFrame = {
    val w = Window.partitionBy("guid")
      .orderBy(col("updateTime").desc, contentTie(store).desc)
    store.filter(col("updateTime") < asOfTime)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** S6/S7: point / batch get by guid — broadcast semi-join of the key set
    * (`elastic.py:43-51`, `:88-93`). */
  def byGuids(store: DataFrame, keys: DataFrame): DataFrame =
    store.join(keys.select("guid").distinct(), Seq("guid"), "left_semi")

  /** Latest version per guid (the A8 compaction view of the store). */
  def latest(store: DataFrame): DataFrame = {
    val w = Window.partitionBy("guid")
      .orderBy(col("updateTime").desc, contentTie(store).desc)
    store.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Compaction: per-microbatch appends leave one small file per bucket per
    * batch; rewrite the history into `outPath` as nBuckets guid-clustered,
    * updateTime-sorted files (one shuffle), then atomically swap dirs at
    * the caller's leisure. At 100 TB this runs per hot bucket on a
    * schedule, not per batch. */
  def compact(spark: SparkSession, path: String, outPath: String,
      nBuckets: Int = 32): Unit =
    read(spark, path)
      .repartition(nBuckets, col("guid"))
      .sortWithinPartitions("guid", "updateTime")
      .write.mode(SaveMode.Overwrite).parquet(outPath)
}
