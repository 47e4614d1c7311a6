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

  /** The MODERN curation funnel — the round-6 gates chained in the order
    * a 2020s pretraining pipeline runs them, reported as a per-stage
    * funnel (stage, ord, n_in, n_kept):
    *
    *   1. gopher rules       (document-shape battery)
    *   2. c4 heuristics      (line punctuation/contaminant screens)
    *   3. LM perplexity      (keep the fluent-under-model head,
    *                          xent ≤ maxXent)
    *   4. canonical near-dup (quality survivor per cluster)
    *   5. temperature mix    (language-flattened membership)
    *   6. token budget       (best classifier scores until spent)
    *
    * Cheap shape gates first, model scoring second, expensive pairwise
    * dedup third, membership/budget last — the shrinking-set cost order
    * [[curationE2E]] establishes. Every stage operator is individually
    * oracle-checked; the COMPOSITION is pinned by reconciliation spec
    * (each stage's n_in equals the previous n_kept; each stage equals
    * the standalone operator applied to the surviving subset). Stages
    * checkpoint between steps so lineage stays flat. */
  def curationFunnel(docs: DataFrame, maxXent: Double = 4.0,
      budget: Long = 10000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // checkpointCounted: the eager materialization IS a count job, so
    // every stage count is free; the previous stage's count carries
    // forward as the next n_in (no re-count of any frame)
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val (d0, n0) = graft.Materialize.checkpointCounted(docs)
    var prev = n0
    def step(name: String, out: DataFrame): DataFrame = {
      val (kept, n) = graft.Materialize.checkpointCounted(out)
      stages += ((name, prev, n))
      prev = n
      kept
    }
    val d1 = step("gopher_rules", d0.join(
      TextCuration.gopherRulesOf(d0).filter(col("keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi"))
    val d2 = step("c4_rules", d1.join(
      TextCuration.c4RulesOf(d1).filter(col("doc_keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi"))
    // the LM trains on the FULL corpus's trusted slice (the CCNet shape —
    // a reference model, not one fit to whatever survived the shape
    // gates, whose 'en' slice may even be empty) and scores the survivors
    val d3 = step("lm_perplexity", d2.join(
      TextOps.lmCrossPerplexity(d2, d0).filter(col("xent") <= maxXent)
        .select("doc_id"), Seq("doc_id"), "left_semi"))
    val d4 = step("canonical_dedup", d3.join(
      Dedup.canonicalDocsOf(d3).filter(col("keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi"))
    val d5 = step("temperature_mix", d4.join(
      Sampling.temperatureMixOf(d4).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    // the selector emits one row per kept d5 doc: its count IS n_kept —
    // no semi-join + checkpoint of a frame nobody reads
    stages += (("token_budget", prev,
      Sampling.budgetSelectOf(d5, budget).count()))
    stages.zipWithIndex
      .map { case ((n, i, k), ord) => (n, ord + 1, i, k) }
      .toSeq.toDF("stage", "ord", "n_in", "n_kept")
      .orderBy("ord")
  }
}
