package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS): score every raw document by how much more likely its hashed
  * n-gram features are under a TARGET distribution (trusted/in-domain
  * text) than under the RAW corpus distribution, then keep the
  * target-like head. The weight is the add-one-smoothed log-likelihood
  * ratio
  *
  *   w(doc) = Σ_tokens [ ln p_target(f) − ln p_raw(f) ],
  *   p(f)   = (count(f) + 1) / (total + B)
  *
  * over B hash buckets — the paper's hashed-feature bag-of-n-grams
  * model at n = 1. (The paper's final resampling step draws with Gumbel
  * noise; the engine keeps the deterministic ranking core and exposes
  * the weight — a caller wanting sampled selection feeds `weight` into
  * [[Sampling]]'s hash-bucket machinery, which is the reproducible-set
  * discipline this engine uses everywhere RNG would appear.)
  *
  * Scale: two bucket-bounded count aggregations (B rows each — broadcast
  * by size, like the LM model tables), one token pass joined against the
  * broadcast B-row ratio table, one per-doc fold. No corpus-sized model
  * state anywhere; the target slice is read from the same scan via a
  * filter, not a second pass.
  *
  * Determinism: ln() is within-1-ulp across engines, so the per-doc sum
  * replays as an ORDERED fold over (pos, lr) — the
  * [[TextOps.lmPerplexityOf]] discipline — and the oracle mirrors the
  * identical op sequence (two lns subtracted, never ln of the quotient).
  */
object Dsir {

  /** (doc_id, n_feat, weight, selected) for every document; `selected`
    * marks weight > 0 (more target-like than raw-average). Docs with no
    * letter tokens score 0 with n_feat = 0 — unscorable, not dropped. */
  def dsirWeightsOf(docs: DataFrame, targetLang: String = "en",
      buckets: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    // one token pass feeds raw counts, target counts, and the scorer
    val tok = graft.Materialize.checkpoint(
      docs.select(col("doc_id"), col("lang"),
        posexplode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
          lit(0))).as(Seq("pos", "t")))
        .select(col("doc_id"), col("lang"), col("pos"),
          pmod(Dedup.h60(concat(lit("dsir#"), col("t"))), lit(buckets.toLong))
            .as("f")))
    val raw = tok.groupBy("f").agg(count(lit(1)).as("c_raw"))
    val tgt = tok.filter(col("lang") === targetLang)
      .groupBy("f").agg(count(lit(1)).as("c_tgt"))
    val tgtRows = tgt.agg(sum("c_tgt")).head()
    require(!tgtRows.isNullAt(0) && tgtRows.getLong(0) > 0,
      s"dsirWeights: no '$targetLang' tokens — the target distribution " +
        "is undefined; pass a targetLang present in the corpus")
    val tgtTot = tgtRows.getLong(0)
    val rawTot = raw.agg(sum("c_raw")).head().getLong(0)
    // B-row smoothed log-ratio table; missing buckets smooth to count 0
    val ratio = raw.join(tgt, Seq("f"), "left")
      .select(col("f"),
        (log((coalesce(col("c_tgt"), lit(0L)) + lit(1.0)) /
          lit(tgtTot + buckets.toDouble)) -
          log((col("c_raw") + lit(1.0)) / lit(rawTot + buckets.toDouble)))
          .as("lr"))
    val scored = tok.join(broadcast(ratio), Seq("f"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos"), col("lr"))).as("lrs"))
      .select(col("doc_id"),
        size(col("lrs")).as("n_feat"),
        round(aggregate(array_sort(col("lrs")), lit(0.0),
          (acc, x) => acc + x.getField("lr")), 6).as("weight"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0)).as("n_feat"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
      .withColumn("selected", (col("weight") > 0).cast("int"))
      .orderBy("doc_id")
  }

  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeightsOf(t(spark, dir, "documents"))
}
