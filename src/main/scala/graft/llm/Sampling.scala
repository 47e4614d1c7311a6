package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** THE split rule, defined once: bucket = h60(md5 of the id) mod 100.
    * Every consumer (standalone hashSplit, the curation composition) must
    * route through these two expressions, or two pipelines could silently
    * disagree on train/val/test membership. */
  def splitBucket(docId: Column): Column =
    Dedup.h60(docId.cast("string")) % 100

  /** train < 80 ≤ val < 90 ≤ test over a [[splitBucket]] value. */
  def splitName(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** 80/10/10 split by md5 of the doc id. A pure projection — zero
    * shuffle, embarrassingly parallel, and the parquet scan reads only
    * `doc_id`. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), splitBucket(col("doc_id")).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        splitName(col("bucket")).as("split"))
      .orderBy("doc_id")

  /** Exactly-k-per-stratum deterministic sample ("10k eval docs per
    * language"): rank docs inside each stratum by md5 of the id (a
    * uniform, reproducible shuffle order) and keep the first k.
    *
    * Skew note for 100 TB: a naive per-stratum window puts ALL of a hot
    * stratum ('en' is most of a web corpus) through one partition. This
    * runs two phases: phase 1 takes the top-k per (stratum, salt) over 32
    * salts — bounding any partition at 1/32nd of the stratum — and phase 2
    * re-ranks the ≤ 32·k phase-1 survivors per stratum. Identical result,
    * worst partition 32× smaller; increase salts with cluster width. */
  def stratifiedSample(spark: SparkSession, dir: String,
      k: Int = 20, salts: Int = 32): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("r"))
      .withColumn("salt", Dedup.h60(concat(lit("s#"),
        col("doc_id").cast("string"))) % salts)
    val w1 = Window.partitionBy("lang", "salt").orderBy("r", "doc_id")
    val w2 = Window.partitionBy("lang").orderBy("r", "doc_id")
    docs
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
      .withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
      .select(col("doc_id"), col("lang"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  /** Source-weighted data MIXING: keep a deterministic fraction of each
    * source ("web 25%, curated 100%" — the mixture step before training).
    * Membership is a pure function of the stable id — [[splitBucket]]'s
    * rule over a mix-specific salt, so the mix is reproducible across
    * runs/engines/partition layouts AND independent of the train/val/test
    * split (different salt ⇒ uncorrelated bucket). Fractions are in
    * integer percent; unlisted sources default to 0 (dropped).
    *
    * Scale: a pure projection + filter — zero shuffle, and the scan reads
    * only (doc_id, source). */
  def sourceMix(spark: SparkSession, dir: String,
      pctBySource: Map[String, Int] = Map(
        "src0" -> 100, "src1" -> 50, "src2" -> 25)): DataFrame = {
    val pct = pctBySource.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col("source") === s, lit(p)).otherwise(acc)
    }
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (Dedup.h60(concat(lit("mix#"), col("doc_id").cast("string"))) % 100)
          .as("mix_bucket"))
      .withColumn("keep_pct", pct)
      .filter(col("mix_bucket") < col("keep_pct"))
      .select(col("doc_id"), col("source"), col("mix_bucket"))
      .orderBy("doc_id")
  }
}
