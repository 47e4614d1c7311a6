package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Collocations

/** PMI collocation semantics on hand fixtures. */
class CollocationsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docsOf(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pmiOf: a repeated pair scores positive, counts are the exact bigram margins") {
    // "alpha beta" ×5 with varying fillers; fillers stay under minCount
    val d = docsOf(
      (1L, "alpha beta one alpha beta two alpha beta three"),
      (2L, "alpha beta four alpha beta five"))
    val got = Collocations.pmiOf(d, minCount = 5).collect()
    assert(got.length == 1, got.toSeq)
    val r = got.head
    assert((r.getString(0), r.getString(1)) == ("alpha", "beta"))
    assert(r.getLong(2) == 5L) // c_ab
    // margins: alpha occurs as LEFT element only before beta (c_a = 5);
    // beta is the RIGHT element only after alpha (c_b = 5)
    assert(r.getLong(3) == 5L && r.getLong(4) == 5L)
    // N = total bigrams: 9 tokens → 8, 6 tokens → 5
    assert(r.getLong(5) == 13L)
    // pmi = ln(5·13/(5·5)) = ln(2.6) ≈ 0.9555
    assert(r.getDouble(6) > 0.95 && r.getDouble(6) < 0.96, r.getDouble(6))
  }

  test("pmiOf: adjacency does not cross document boundaries") {
    val d = docsOf((1L, "aa bb"), (2L, "bb cc"))
    // with minCount 1: pairs are (aa,bb) and (bb,cc) only — no (bb,bb)
    val got = Collocations.pmiOf(d, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("aa", "bb"), ("bb", "cc")), got)
  }

  test("ngramDiversityOf: template repetition collapses the distinct ratio") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "a b a b a b", "tmpl"), (2L, "a b a b a b", "tmpl"),
      (3L, "a b c d e f", "div"))
      .toDF("doc_id", "text", "source")
    val got = Collocations.ngramDiversityOf(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("tmpl") == (10L, 2L, 0.2), got("tmpl")) // (a,b)/(b,a) only
    assert(got("div") == (5L, 5L, 1.0), got("div"))
  }

  test("wordNeighborsOf: words with identical context distributions hit cosine 1") {
    val s = spark; import s.implicits._
    // aa and bb always appear as "p _ q": identical hashed-PPMI
    // vectors, so their cosine is exactly 1.0
    val d = Seq((1L, Seq.fill(6)("p aa q p bb q").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Collocations.wordNeighborsOf(d, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("aa", "bb")) == 1.0, got)
    // orientation is canonical: no (bb, aa) duplicate
    assert(!got.contains(("bb", "aa")))
  }

  test("pmiOf: margins are consistent — Σ c_ab over a equals c_a") {
    val d = docsOf((1L, "x y x y x z z x y"))
    val got = Collocations.pmiOf(d, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byA = got.groupBy(_._1)
    byA.foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == rows.head._4, rows.toSeq)
    }
  }
}
