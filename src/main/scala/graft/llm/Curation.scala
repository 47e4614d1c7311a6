package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** End-to-end corpus curation — the composition a pretraining-data pipeline
  * actually runs, chained from the individually-oracle-checked operators:
  *
  *   1. quality gate   (TextOps.qualityScore rule: stopword ratio ≤ 0.2
  *                      AND ≥ 12 tokens; benchmark slice excluded up front)
  *   2. exact dedup    (min doc_id per md5(text) — Dedup.exact's rule)
  *   3. near-dup dedup (keep each LSH cluster's min-id survivor —
  *                      Dedup.dupClustersOf over the stage-2 survivors)
  *   4. decontamination (drop docs sharing any 3-gram with the benchmark
  *                      slice — Dedup.decontaminate's rule)
  *   5. split          (Sampling.hashSplit's deterministic 80/10/10)
  *
  * Each stage reads only the previous stage's survivors, so the expensive
  * stages (shingling, signatures) run over a shrinking set — the order
  * cheap-filters-first is the 100 TB cost model, not a style choice.
  * The DuckDB oracle reconstructs all five stages as chained CTEs, making
  * this the LLM-ops analogue of `q_pipeline_e2e`: the COMPOSITION is
  * verified, not just each piece.
  */
object Curation {

  private val stopwordsArr =
    array(Seq("the", "a", "of", "and", "to").map(lit): _*)

  def curationE2E(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)

    // 1. quality gate over the training candidates
    val toks = TextOps.tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks, w => array_contains(stopwordsArr, w)))
    val quality = docs.filter(col("doc_id") % 97 =!= 0)
      .filter(nStop.cast("double") / nTok <= 0.2 && nTok >= 12)

    // 2. exact dedup: min doc_id per content hash. Checkpointed: it feeds
    // the signature pipeline AND the survivor semi-join — without the
    // barrier each consumer re-runs the tokenize+window funnel above.
    val wExact = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val exact = graft.Materialize.checkpoint(
      quality.withColumn("rn", row_number().over(wExact))
        .filter(col("rn") === 1).drop("rn"))

    // one shingle pass over the exact survivors feeds BOTH stage 3
    // (minhash signatures) and stage 4 (decontamination probe) — the
    // tokenize+window funnel is the expensive part of each
    val exactSh = graft.Materialize.checkpoint(Dedup.shingleRows(exact))

    // 3. near-dup cluster survivors over the exact survivors (two
    // consumers again: decontamination shingles + the final anti-join)
    val nearDup = graft.Materialize.checkpoint(exact.join(
      Dedup.dupClustersFromShingles(exact.select("doc_id"), exactSh)
        .filter(col("is_survivor") === 1)
        .select("doc_id"),
      Seq("doc_id"), "left_semi"))

    // 4. decontamination against the benchmark slice's shingles (shingles
    // of the stage-3 survivors = exactSh restricted to them)
    val benchSh = Dedup.shingleRows(bench).select("s").distinct()
    val contaminated = exactSh
      .join(nearDup.select("doc_id"), Seq("doc_id"), "left_semi")
      .join(broadcast(benchSh), Seq("s"), "left_semi")
      .select("doc_id").distinct()
    val clean = nearDup.join(contaminated, Seq("doc_id"), "left_anti")

    // 5. deterministic split assignment (the one shared rule)
    clean.select(col("doc_id"), col("lang"),
        Sampling.splitName(Sampling.splitBucket(col("doc_id"))).as("split"))
      .orderBy("doc_id")
  }
}
