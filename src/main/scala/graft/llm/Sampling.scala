package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deterministic dataset splitting for training pipelines.
  *
  * Train/val/test assignment must be a pure function of a STABLE key —
  * reproducible across runs, engines, partition layouts, and incremental
  * re-ingests. `rand()`/`sample()` fail all four (they reseed per task and
  * change under repartition); hashing the document id fails none. The same
  * rule lets two independent pipelines agree on the split without sharing
  * state — exactly what a 100 TB corpus rebuilt incrementally needs.
  */
object Sampling {

  /** 80/10/10 split by md5 of the doc id: bucket = h60(id) mod 100,
    * train < 80 ≤ val < 90 ≤ test. A pure projection — zero shuffle,
    * embarrassingly parallel, and the parquet scan reads only `doc_id`. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        (Dedup.h60(col("doc_id").cast("string")) % 100).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
}
