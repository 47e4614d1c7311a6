package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextOps

/** Differential + contract tests for the CCNet-style bigram LM quality
  * filter (the oracle rows pin exact engine-vs-engine values; these pin
  * the math against an independent driver-side reference and the
  * distribution-independence of the ordered fold). */
class LmSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  /** Driver-side reference: same tokenization, same add-one smoothing,
    * same ordered left-fold — written against plain Scala collections so
    * a shared Spark-side bug cannot hide. */
  private def refScores(rows: Seq[(Long, String, String)],
      trainLang: String): Map[Long, (Int, Double)] = {
    def toks(t: String): Seq[String] =
      "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
    def bigrams(t: String): Seq[(String, String)] = {
      val w = toks(t); w.zip(w.drop(1))
    }
    val train = rows.filter(_._3 == trainLang).flatMap(r => bigrams(r._2))
    val cab = train.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ca = train.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = train.map(_._1).distinct.size.toDouble
    rows.flatMap { case (id, t, _) =>
      val bg = bigrams(t)
      if (bg.isEmpty) None
      else {
        val tot = bg.foldLeft(0.0) { case (acc, p) =>
          acc + -math.log(
            (cab.getOrElse(p, 0L) + 1.0) / (ca.getOrElse(p._1, 0L) + v))
        }
        Some(id -> (bg.size,
          BigDecimal(tot / bg.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toMap
  }

  private val fixture = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the cat sat on the cat", "en"),
    (3L, "the dog sat on a log and the dog ran", "en"),
    (4L, "cat cat cat cat", "en"),
    (5L, "der hund sitzt auf der matte", "de"), // NOT in the train slice
    (6L, "zzz qqq xxx www", "de"), // every bigram unseen -> uniform 1/V
    (7L, "one", "en")) // a single token: no bigram, no score row

  test("perplexity matches the driver-side reference bit-for-bit") {
    val out = TextOps.lmPerplexityOf(docs(fixture: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_bigrams"), r.getAs[Double]("xent"))).toMap
    val ref = refScores(fixture, "en")
    // every input doc gets a row: the bigram-less doc 7 scores the
    // uniform-model ceiling ln V with n_bigrams = 0
    assert(out.keySet == ref.keySet + 7L)
    ref.foreach { case (id, (n, x)) =>
      assert(out(id)._1 == n, s"doc $id n_bigrams")
      assert(out(id)._2 == x, s"doc $id xent: got ${out(id)._2}, want $x")
    }
    val v = TextOps.lmModelOf(docs(fixture: _*))
      .select("a").distinct().count().toDouble
    val ceiling = BigDecimal(math.log(v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(7L) == ((0, ceiling)))
  }

  test("model trains ONLY on the train-language slice") {
    val model = TextOps.lmModelOf(docs(fixture: _*)).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    assert(model.contains(("the", "cat")))
    assert(!model.exists { case (a, b) => a == "hund" || b == "hund" })
  }

  test("fully-unseen text backs off to uniform 1/V exactly") {
    val out = TextOps.lmPerplexityOf(docs(fixture: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val vocab = TextOps.lmModelOf(docs(fixture: _*))
      .select("a").distinct().count().toDouble
    val expect = BigDecimal(math.log(vocab))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(6L) == expect) // -mean ln(1/V) = ln V, every bigram unseen
    // and unseen text scores strictly worse than fluent-under-model text
    assert(out(6L) > out(1L) && out(6L) > out(2L))
  }

  test("an empty training slice fails loud, not with a NULL-score wipeout") {
    val ex = intercept[IllegalArgumentException] {
      TextOps.lmPerplexityOf(docs((1L, "nur deutsche worte hier", "de")))
        .collect()
    }
    assert(ex.getMessage.contains("no 'en' bigrams"))
  }

  test("cross-perplexity trains on the reference frame, scores the subset") {
    val all = docs(fixture: _*)
    val subset = all.filter(org.apache.spark.sql.functions.col("doc_id") <= 3)
    val cross = TextOps.lmCrossPerplexity(subset, all).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val self = TextOps.lmPerplexityOf(all).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    // the model is identical (same train corpus), so subset scores match
    assert(cross.keySet == Set(1L, 2L, 3L))
    cross.foreach { case (id, x) => assert(x == self(id), s"doc $id") }
  }

  test("the ordered fold makes the score partition-independent") {
    val d = docs(fixture: _*)
    val a = TextOps.lmPerplexityOf(d.repartition(1)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val b = TextOps.lmPerplexityOf(d.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    assert(a == b)
  }
}

/** Hashing-trick text embeddings: unit-norm contract, identical-text
  * collision, and the bridge into the ANN pair path (exact values are
  * oracle-pinned by q_text_embed). */
class TextEmbedSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val fix = Seq(
    1L -> "the cat sat on the mat and the cat slept",
    2L -> "the cat sat on the mat and the cat slept", // identical to 1
    3L -> "completely different words about spark shuffles and joins",
    4L -> "the cat sat on the mat and the dog slept") // near 1

  test("vectors are unit-norm and a pure function of the text") {
    val out = TextOps.embedTextOf(docs(fix: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 16).map(k => r.getAs[Double](s"e$k"))).toMap
    out.values.foreach { v =>
      val n = v.map(x => x * x).sum
      assert(math.abs(n - 1.0) < 1e-6, s"norm $n") // rounded components
    }
    assert(out(1L) == out(2L)) // same text, same vector, bit for bit
    assert(out(1L) != out(3L))
  }

  test("derived vectors flow through the ANN pair path unchanged") {
    val vecs = TextOps.textEmbedVectors(docs(fix: _*))
    assert(vecs.schema("embedding").dataType.simpleString == "array<float>")
    val pairs = graft.llm.Similarity
      .annPairsOf(vecs, minSim = 0.9, dim = 16).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim")))
    // identical docs land in the same sign bucket with cosine 1
    assert(pairs.exists { case (a, b, s2) => a == 1L && b == 2L && s2 == 1.0 })
    // the unrelated doc 3 pairs with nobody at 0.9
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L })
  }
}
