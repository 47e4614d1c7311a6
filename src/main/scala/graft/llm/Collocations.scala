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

  /** Adjacent word pairs per doc — the ONE tokenization + adjacency
    * definition shared by PMI, diversity, and the word vectors (a
    * regex or ordering change cannot silently desynchronize one of the
    * three oracles). `carry` = extra doc columns to keep alongside
    * (doc_id, a, b). [[Keywords.textRankOf]] stays separate by design:
    * its adjacency is over the stopword-filtered content-word
    * sequence, a different relation. */
  private[llm] def adjacentBigrams(docs: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id") +: carry.map(col) :+
        posexplode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
          lit(0))).as(Seq("pos", "t")): _*)
      .select(col("doc_id") +: carry.map(col) :+
        col("t").as("a") :+ lead(col("t"), 1).over(w).as("b"): _*)
      .filter(col("b").isNotNull)
  }

  def pmiOf(docs: DataFrame, minCount: Long = 5): DataFrame = {
    val bg = adjacentBigrams(docs)
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
    val bg = adjacentBigrams(docs, carry = Seq("source"))
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

  /** Distributional word similarity from hashed-PPMI vectors — the
    * count-based member of the word-embedding family (Levy & Goldberg
    * 2014: word2vec's objective implicitly factorizes this very PMI
    * matrix). Each word's vector is its positive-PMI mass over
    * adjacent-context words, hashed into `dims` buckets (the
    * [[TextOps]] hashing-trick discipline — vocabulary-independent
    * width); similarity = cosine.
    *
    * Determinism end to end: PPMI quantizes to 1e-3 fixed point
    * immediately after its single ln (BIGINT from then on), vector
    * components are exact integer sums, norms and dots are exact
    * integer sums of products (bounded ≪ 2⁵³ by the quantization
    * scale), and the final cosine is one pinned double sequence
    * rounded at 6. Pairs sharing no nonzero dimension have cosine 0
    * and are absent — identical join semantics in both engines.
    *
    * Scale: everything after the ONE corpus bigram pass is vocabulary-
    * bounded; the pair join is blocked by shared dimension (a word
    * pair joins once per common nonzero dim, ≤ dims times). The
    * all-pairs output is for an analysis vocabulary — at web-scale
    * vocabularies cap contexts to the top-k by frequency first. */
  def wordNeighborsOf(docs: DataFrame, dims: Int = 64,
      minCount: Long = 5): DataFrame = {
    val bg = adjacentBigrams(docs)
    // symmetric co-occurrence: context on either side
    val cooc = bg.select(col("a").as("w"), col("b").as("c"))
      .union(bg.select(col("b").as("w"), col("a").as("c")))
      .groupBy("w", "c").agg(count(lit(1)).as("n_wc"))
      .localCheckpoint(true)
    val cw = cooc.groupBy("w").agg(sum("n_wc").as("n_w"))
    val n = broadcast(cooc.agg(sum("n_wc").as("n")))
    val ppmi = cooc.filter(col("n_wc") >= minCount)
      .join(cw, "w")
      .join(cw.select(col("w").as("c"), col("n_w").as("n_c")), "c")
      .crossJoin(n)
      .withColumn("pmi", log((col("n_wc") * col("n")).cast("double") /
        (col("n_w") * col("n_c")).cast("double")))
      .filter(col("pmi") > 0)
      .select(col("w"), col("c"),
        round(col("pmi") * 1000).cast("long").as("pq"))
    val vec = ppmi
      .select(col("w"),
        (graft.llm.Dedup.h60(concat(lit("wv#"), col("c"))) % dims).as("j"),
        col("pq"))
      .groupBy("w", "j").agg(sum("pq").as("v"))
      .localCheckpoint(true) // feeds norms AND both pair-join sides
    val norms = vec.groupBy("w").agg(sum(col("v") * col("v")).as("nrm"))
    val dots = vec.as("a").join(vec.as("b"),
        col("a.j") === col("b.j") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(sum(col("a.v") * col("b.v")).as("dot"))
    dots
      .join(norms.select(col("w").as("w1"), col("nrm").as("nrm1")), "w1")
      .join(norms.select(col("w").as("w2"), col("nrm").as("nrm2")), "w2")
      .select(col("w1"), col("w2"),
        round(col("dot").cast("double") /
          (sqrt(col("nrm1").cast("double")) *
            sqrt(col("nrm2").cast("double"))), 6).as("cos"))
      .orderBy("w1", "w2")
  }

  def wordNeighbors(spark: SparkSession, dir: String): DataFrame =
    wordNeighborsOf(t(spark, dir, "documents"))
}
