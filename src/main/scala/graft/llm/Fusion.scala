package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Reciprocal-rank fusion of quality signals (Cormack & Clarke 2009):
  * combine K independent rankings of the corpus into one score
  *
  *   rrf(d) = Σ_k 1 / (60 + rank_k(d))
  *
  * — the standard way curation pipelines merge heterogeneous quality
  * signals (heuristic score, classifier, perplexity) without having to
  * calibrate their scales against each other. Ranks, not raw values,
  * so one signal's outliers can't dominate.
  *
  * Scale: the naive formulation is a GLOBAL row_number per signal — a
  * SinglePartition sort of the corpus, K times. [[globalRank]] is the
  * two-phase histogram discipline instead ([[Sampling.budgetSelectOf]]'s
  * shape): bucket each signal (monotone coarsening), count per bucket
  * with map-side partials, cumulative offsets on the driver (bucket-
  * bounded rows), then row_number WITHIN each bucket only — the window
  * partitions by bucket, never the corpus. Equivalence to the naive
  * global window is spec-pinned.
  *
  * Determinism: ranks are integers; 1/(60+r) and their fixed-order sum
  * are identical IEEE ops in any engine. Every rank order carries a
  * doc_id tiebreak, so the total order — and therefore every rank — is
  * unique.
  */
object Fusion {

  /** Global 1-based rank of each row in the (key DESC, id ASC) total
    * order, without a global sort. `bucket` must be a monotone
    * NON-DECREASING function of `key` (equal keys → equal buckets);
    * higher bucket = better rank. Adds `rankCol` to `df`. */
  def globalRank(df: DataFrame, key: Column, id: Column, bucket: Column,
      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val b = df.withColumn("__b", bucket.cast("long"))
    val hist = b.groupBy("__b").agg(count(lit(1)).as("__n"))
      .orderBy(col("__b").desc).collect() // bucket-bounded, not corpus
    var acc = 0L
    val offsets = hist.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq
    val off = spark.createDataFrame(offsets).toDF("__b", "__off")
    val w = Window.partitionBy("__b").orderBy(key.desc, id.asc)
    b.join(broadcast(off), "__b")
      .withColumn(rankCol, col("__off") + row_number().over(w))
      .drop("__b", "__off")
  }

  /** RRF over three quality signals of `documents`: token count (more
    * is better), distinct-token ratio (higher is better — repetition
    * penalty), stopword count (more is better — Gopher's "natural
    * English carries stopwords" direction). Returns per-doc ranks and
    * the fused score, best first. */
  def rrfFusionOf(docs: DataFrame, k: Int = 60): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val sig = docs.select(
      col("doc_id"),
      size(toks).as("n_tok"),
      (size(array_distinct(toks)).cast("double") / size(toks))
        .as("uniq_ratio"),
      TextOps.stopwordCount(toks).as("n_stop"))
      .localCheckpoint(true) // three rankings read the one token pass
    val r1 = globalRank(sig, col("n_tok"), col("doc_id"),
      col("n_tok"), "r_tok")
    val r2 = globalRank(r1, col("uniq_ratio"), col("doc_id"),
      floor(col("uniq_ratio") * 1024).cast("long"), "r_uniq")
    val r3 = globalRank(r2, col("n_stop"), col("doc_id"),
      col("n_stop"), "r_stop")
    r3.select(col("doc_id"), col("r_tok"), col("r_uniq"), col("r_stop"),
        (lit(1.0) / (lit(k) + col("r_tok")) +
          lit(1.0) / (lit(k) + col("r_uniq")) +
          lit(1.0) / (lit(k) + col("r_stop"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  def rrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrfFusionOf(t(spark, dir, "documents"))

  /** Per-GROUP rank in each group's (key DESC, id ASC) total order —
    * [[globalRank]]'s two-phase discipline with the histogram and
    * offsets computed per (group, bucket): the driver table is bounded
    * by groups × buckets, the window partitions by (group, bucket), and
    * no partition ever holds more than one bucket of one group. The
    * per-source normalization primitive: a 10 TB source never plans a
    * source-wide window. Group column must be a string. */
  def groupedRank(df: DataFrame, grpCol: String, key: Column, id: Column,
      bucket: Column, rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val b = df.withColumn("__b", bucket.cast("long"))
      .withColumn("__g", col(grpCol))
    val hist = b.groupBy("__g", "__b").agg(count(lit(1)).as("__n"))
      .orderBy(col("__g"), col("__b").desc).collect() // groups×buckets
    val offsets = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    var curG: String = null; var acc = 0L
    hist.foreach { r =>
      val g = r.getString(0)
      if (g != curG) { curG = g; acc = 0L }
      offsets += ((g, r.getLong(1), acc)); acc += r.getLong(2)
    }
    val off = spark.createDataFrame(offsets.toSeq)
      .toDF("__g", "__b", "__off")
    val w = Window.partitionBy("__g", "__b").orderBy(key.desc, id.asc)
    b.join(broadcast(off), Seq("__g", "__b"))
      .withColumn(rankCol, col("__off") + row_number().over(w))
      .drop("__g", "__b", "__off")
  }

  /** Quantile normalization of a quality signal WITHIN each source:
    * pct = (n − r)/(n − 1) over the source's (score DESC, doc_id) total
    * order — best doc 1.0, worst 0.0, NULL for a single-doc source. The
    * standard move before mixing heterogeneously-scored sources (a
    * percentile is comparable across sources; a raw score is not — the
    * [[rrfFusionOf]] rationale applied per source). Rank via
    * [[groupedRank]]; pct is one integer-to-double division. */
  def quantileNormOf(docs: DataFrame): DataFrame = {
    val sig = docs.select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).as("n_tok"))
    val ranked = groupedRank(sig, "source", col("n_tok"), col("doc_id"),
      col("n_tok"), "r")
    val counts = ranked.groupBy("source").agg(count(lit(1)).as("n"))
    ranked.join(broadcast(counts), "source")
      .select(col("doc_id"), col("source"), col("n_tok"),
        when(col("n") > 1, (col("n") - col("r")).cast("double") /
          (col("n") - 1).cast("double")).as("pct"))
      .orderBy("doc_id")
  }

  def quantileNorm(spark: SparkSession, dir: String): DataFrame =
    quantileNormOf(t(spark, dir, "documents"))
}
