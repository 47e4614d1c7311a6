package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize
import graft.Tables._

/** Model-assisted quality filtering: train a linear classifier over cheap
  * per-document count features and score every document with it — the
  * "quality classifier" stage of pretraining pipelines (a model trained to
  * prefer curated text over raw crawl, cf. the GPT-3 / LLaMA data notes),
  * re-expressed as distributed Spark aggregation.
  *
  * The trainer is a BATCH perceptron: per round, score every doc with the
  * current weights, and add the summed gradient of the misclassified docs
  * (`w += Σ_err y·x`) in one pass. Everything is INTEGER arithmetic —
  * counts in, long weights out — so training is bit-reproducible on any
  * engine and the oracle can unroll the identical rounds as CTEs (the
  * `ivfTrain` / `bpeTrain` pattern; a sigmoid/logistic variant would hinge
  * on `exp`, which is not correctly rounded across engines).
  *
  * Scale shape: the feature frame is ONE codegen projection over the scan
  * (no shuffle), materialized once and shared by every round; each round is
  * a single all-to-one aggregate with map-side partials (m+1 sums) and a
  * one-row driver fetch — the same per-round round-trip as `ivfTrain`'s
  * centroid update, and the natural shape of distributed full-batch
  * gradient steps. Scoring is a zero-shuffle projection with the trained
  * weights folded in as literals. At petabyte corpus sizes the integer
  * gradient sums can approach int64 range — a production run would scale
  * features down or train on a sample (the standard practice); the math
  * here is the distributed part.
  */
object Classifier {

  /** Feature count (bias + four centered counts). */
  private val M = 5

  private val rounds = 3

  /** Integer feature projection — one codegen pass, zero shuffles. The
    * counts are CENTERED by fixed integer priors (≈ corpus medians): raw
    * counts are all-positive and near-collinear, which drives every batch
    * update in one direction and collapses the decision to a single sign;
    * centering puts the boundary near the origin where a few integer
    * rounds can carve it (the integer analogue of standardizing features
    * before a linear model). The label distills the heuristic quality
    * gate (enough tokens AND stopword ratio ≤ 1/5) into the model — the
    * rule-to-model distillation real pipelines run so the deployed filter
    * is one dot product instead of a rule cascade. */
  private def featureFrame(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = TextOps.stopwordCount(toks).cast("long")
    docs.select(
      col("doc_id"),
      when(TextOps.qualityGate(toks), 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      (nTok - 25).as("x1"),
      (size(array_distinct(toks)).cast("long") - 18).as("x2"),
      (nStop - 2).as("x3"),
      (col("n_chars").cast("long") - 140).as("x4"))
  }

  private def scoreCol(w: Seq[Long]): Column =
    (0 until M).map(j => col(s"x$j") * lit(w(j))).reduce(_ + _)

  /** Unrolled batch-perceptron rounds; returns (round, n_err, weights-after)
    * per round. One aggregate job + one tiny driver fetch per round. */
  private def trainOn(feat: DataFrame): Seq[(Int, Long, Seq[Long])] = {
    var w: Seq[Long] = Seq.fill(M)(0L)
    (1 to rounds).map { r =>
      val err = (col("y") * scoreCol(w)) <= 0
      val aggs = count(when(err, 1)).as("n_err") +:
        (0 until M).map(j => sum(when(err, col("y") * col(s"x$j"))).as(s"g$j"))
      val row = feat.agg(aggs.head, aggs.tail: _*).collect()(0)
      val nErr = row.getLong(0)
      w = (0 until M).map(j =>
        w(j) + (if (row.isNullAt(j + 1)) 0L else row.getLong(j + 1)))
      (r, nErr, w)
    }
  }

  /** Training trajectory as a frame: (step, n_err, w0..w4) per round —
    * the artifact a filtering job ships (and the oracle pins every round,
    * not just the final weights). */
  def clfTrain(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = Materialize.checkpoint(featureFrame(docs))
    trainOn(feat)
      .map { case (r, nErr, w) => (r, nErr, w(0), w(1), w(2), w(3), w(4)) }
      .toDF("step", "n_err", "w0", "w1", "w2", "w3", "w4")
      .orderBy("step")
  }

  /** Score every document with the final trained weights: (doc_id, score,
    * pred) — `keep` iff the margin is positive. Pure projection over the
    * shared feature frame; the weights ride as literals, so the scoring
    * pass stays inside whole-stage codegen. */
  def clfScore(docs: DataFrame): DataFrame =
    scoredTokens(docs)
      .select(col("doc_id"), col("score"),
        when(col("score") > 0, "keep").otherwise("drop").as("pred"))
      .orderBy("doc_id")

  /** THE one train-and-score path (clfScore is a projection over it):
    * scored docs with the token count recovered from the feature frame
    * (x1 = n_tok − 25) — consumers that need both (budget selection)
    * must not re-tokenize the corpus to recompute what the checkpointed
    * features already hold. */
  private[llm] def scoredTokens(docs: DataFrame): DataFrame = {
    val feat = Materialize.checkpoint(featureFrame(docs))
    val w = trainOn(feat).last._3
    feat.select(
      col("doc_id"),
      scoreCol(w).as("score"),
      (col("x1") + 25L).as("n_tok"))
  }

  /** Persist the training trajectory (VERDICT r6 #1) — the final row's
    * weights are the deployed model; keeping every round makes the
    * artifact auditable (the same frame `clfTrain` oracles). Returns the
    * store version. */
  def clfSave(docs: DataFrame, store: graft.store.ModelStore): Long =
    store.save(Map("weights" -> clfTrain(docs)))

  /** Score with PERSISTED weights — zero training jobs: the final
    * round's weights load from the store (a `rounds`-row frame) and ride
    * the scoring projection as literals, exactly like the in-line path.
    * Bit-identical to [[clfScore]] over the training corpus (integer
    * weights round-trip parquet exactly). */
  def clfScorePersisted(docs: DataFrame,
      store: graft.store.ModelStore): DataFrame = {
    val last = store.load("weights").orderBy(col("step").desc)
      .limit(1).collect()(0)
    val w = (0 until M).map(j => last.getAs[Long](s"w$j"))
    featureFrame(docs)
      .select(col("doc_id"), scoreCol(w).as("score"))
      .select(col("doc_id"), col("score"),
        when(col("score") > 0, "keep").otherwise("drop").as("pred"))
      .orderBy("doc_id")
  }

  /** Oracle row: train into a scratch store, score FROM the store,
    * hash-match `q_quality_clf_score`'s oracle — persisted == in-query. */
  def clfPersistedQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.store.ModelStore.scratch(spark, "clf") { store =>
      clfSave(docs, store)
      clfScorePersisted(docs, store)
    }
  }

  def clfTrainQuery(spark: SparkSession, dir: String): DataFrame =
    clfTrain(t(spark, dir, "documents"))

  def clfScoreQuery(spark: SparkSession, dir: String): DataFrame =
    clfScore(t(spark, dir, "documents"))
}
