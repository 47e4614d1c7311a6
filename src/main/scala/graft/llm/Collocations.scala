package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** PMI collocation mining (Church & Hanks 1990): score adjacent word
  * pairs by pointwise mutual information — how much more often the
  * pair co-occurs than its words' frequencies predict. The classic
  * "hash join"/"new york" detector, and the association measure behind
  * phrase-merging pre-tokenizers (wordpiece-style vocabulary induction
  * starts from exactly these counts).
  *
  * Probability space: the bigram table itself — p(a,b) = c_ab/N,
  * p(a·) / p(·b) are its left/right margins — so the measure is
  * self-consistent and every count is an exact integer. PMI is then
  * the single ratio (c_ab·N)/(c_a·c_b): both products are exact Longs
  * and cast exactly to double below 2⁵³, ONE division, ONE ln() rounded
  * at 6 places (the engine-wide ln-is-1-ulp caveat). At trillion-token
  * scale the products overflow the exact-double window; there the
  * 4-term ordered form ln(c_ab)+ln(N)−ln(c_a)−ln(c_b) (the
  * [[TextOps]] LM xent discipline) replaces the single ratio — same
  * caveat class, no exactness claim lost since ln already rounds.
  *
  * Shape: ONE corpus pass (posexplode + per-doc lead window, the
  * [[Keywords]] adjacency discipline) into a vocab²-bounded count
  * table; margins and the total re-aggregate THAT table, never the
  * corpus, and broadcast back. Output is vocab²-bounded and ordered by
  * the pair itself — never by the float score.
  */
object Collocations {

  def pmiOf(docs: DataFrame, minCount: Long = 5): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bg = docs
      .select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
          lit(0))).as(Seq("pos", "t")))
      .select(col("doc_id"), col("t").as("a"),
        lead(col("t"), 1).over(w).as("b"))
      .filter(col("b").isNotNull)
    // the ONE corpus-sized aggregation; margins/total read this table
    val cab = bg.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true)
    val ca = cab.groupBy("a").agg(sum("c_ab").as("c_a"))
    val cb = cab.groupBy("b").agg(sum("c_ab").as("c_b"))
    val n = broadcast(cab.agg(sum("c_ab").as("n")))
    // margin joins stay equi-joins WITHOUT a broadcast hint: the
    // margins are vocabulary-sized, and a web-scale vocabulary (typos
    // included) can reach 10⁸ rows — AQE broadcasts them when they fit,
    // falls back to hash join when they don't
    cab.filter(col("c_ab") >= minCount)
      .join(ca, "a")
      .join(cb, "b")
      .crossJoin(n)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("n"),
        round(log((col("c_ab") * col("n")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")), 6).as("pmi"))
      .orderBy("a", "b")
  }

  def pmi(spark: SparkSession, dir: String): DataFrame =
    pmiOf(t(spark, dir, "documents"))

  /** Per-source bigram diversity: total vs distinct adjacent word
    * pairs and their ratio — the cheap corpus-diversity proxy (low
    * distinct/total = template/boilerplate-heavy source; the
    * self-repetition facet of what self-BLEU measures) that a mixing
    * pipeline reads next to source quality before setting weights.
    * Same one-pass adjacency as [[pmiOf]]; the distinct count is exact
    * (one aggregate per source over the pair table), ratio is one
    * division. */
  def ngramDiversityOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bg = docs
      .select(col("doc_id"), col("source"),
        posexplode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
          lit(0))).as(Seq("pos", "t")))
      .select(col("source"), col("doc_id"), col("t").as("a"),
        lead(col("t"), 1).over(w).as("b"))
      .filter(col("b").isNotNull)
    bg.groupBy("source").agg(
        count(lit(1)).as("n_bigrams"),
        count_distinct(concat(col("a"), lit("#"), col("b")))
          .as("n_distinct"))
      .select(col("source"), col("n_bigrams"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_bigrams").cast("double"))
          .as("diversity"))
      .orderBy("source")
  }

  def ngramDiversity(spark: SparkSession, dir: String): DataFrame =
    ngramDiversityOf(t(spark, dir, "documents"))
}
