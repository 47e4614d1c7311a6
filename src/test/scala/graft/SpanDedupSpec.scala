package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Chunking, Dsir, SpanDedup}

/** Semantics of the round-7 LLM-ops additions: substring-span dedup
  * (detection + canonical-keeping scrub), DSIR importance weights, and
  * passage chunking. */
class SpanDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  // k = 4 keeps fixtures readable; operators take k as a parameter
  private val K = 4

  private def docsOf(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dupSpans: cross-doc repeated span is flagged in both docs, unique text is not") {
    val boiler = "all rights reserved by the publisher"   // 6 tokens
    val d = docsOf(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"zeta eta $boiler theta iota kappa"),
      (3L, "one two three four five six seven eight nine"))
    val out = SpanDedup.dupSpansOf(d, K).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toMap
    // the 6-token boiler yields 3 duplicated 4-windows per doc, all
    // overlapping → ONE island of 6 tokens in each
    assert(out(1L)._2 == 3 && out(1L)._3 == 1 && out(1L)._4 == 6, out(1L))
    assert(out(2L)._2 == 3 && out(2L)._3 == 1 && out(2L)._4 == 6, out(2L))
    assert(out(3L) == (6, 0, 0, 0), out(3L))
  }

  test("dupSpans: disjoint repeats form separate islands; short docs get a zero row") {
    val (a, b) = ("red green blue white", "north south east west")
    val d = docsOf(
      (1L, s"$a x1 x2 x3 $b"),
      (2L, s"$a y1 y2 y3 $b"),
      (3L, "tiny doc"))  // < k tokens → zero spans, still a row
    val out = SpanDedup.dupSpansOf(d, K).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toMap
    assert(out(1L)._3 == 2 && out(1L)._4 == 8, out(1L))
    assert(out(2L)._3 == 2 && out(2L)._4 == 8, out(2L))
    assert(out(3L) == (0, 0, 0, 0), out(3L))
  }

  test("spanScrub: canonical occurrence keeps its text, later ones lose it") {
    val boiler = "all rights reserved by publisher now"   // 6 tokens
    val d = docsOf(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"zeta eta $boiler theta iota"))
    val out = SpanDedup.spanScrubOf(d, K).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    // doc 1 holds the canonical occurrences → untouched
    assert(out(1L) == (10, 10, s"alpha beta $boiler gamma delta"), out(1L))
    // doc 2 loses exactly the 6 boiler tokens
    assert(out(2L) == (10, 4, "zeta eta theta iota"), out(2L))
  }

  test("spanScrub: keep-biased overlap — tokens under a canonical span survive") {
    // doc 2 carries a NON-canonical span [a b c d] (doc 1 has it first)
    // overlapping a CANONICAL span [b c d e] (doc 4 repeats it later):
    // only the token covered SOLELY by the non-canonical copy drops
    val d = docsOf(
      (1L, "a b c d p q"),
      (2L, "a b c d e r s"),
      (4L, "z b c d e w v"))
    val out = SpanDedup.spanScrubOf(d, K).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "a b c d p q", out(1L))       // canonical holder
    assert(out(2L) == "b c d e r s", out(2L))       // only 'a' drops
    assert(out(4L) == "z w v", out(4L))             // non-canon copy drops
  }

  test("dsir: target-like docs outrank junk; loud fail on absent lang") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "en", "alpha beta gamma delta alpha beta"),
      (2L, "en", "alpha gamma beta delta beta alpha"),
      (3L, "xx", "zork quux blarg frobnitz zork quux"),
      (4L, "xx", "alpha beta gamma delta alpha gamma"))
      .toDF("doc_id", "lang", "text")
    val out = Dsir.dsirWeightsOf(d, "en", 64).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getInt(3)))
      .toMap
    // ordering, not signs: add-one smoothing over 64 buckets dominates
    // absolute magnitudes at 6-token scale, but target-like text always
    // outranks junk under the log-ratio
    assert(out(1L)._2 > out(3L)._2, out)
    assert(out(2L)._2 > out(3L)._2, out)
    // doc 4 is xx-labelled but en-worded → scores like the en docs
    // (content-based selection, label-blind scoring)
    assert(out(4L)._2 > out(3L)._2, out)
    assert(out.values.forall(_._1 == 6))
    val e = intercept[IllegalArgumentException] {
      Dsir.dsirWeightsOf(d, "zz").collect()
    }
    assert(e.getMessage.contains("zz"))
  }

  test("passage chunks: stride overlap, trailing shrink, short and empty docs") {
    val s = spark; import s.implicits._
    val text40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, text40), (2L, "a b c"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Chunking.passageChunksOf(d, window = 32, stride = 16)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))
    val byDoc = out.groupBy(_._1)
    // doc 1 (40 tokens): starts 0,16,32 → sizes 32, 24, 8; overlap is
    // exactly W−S = 16 tokens between consecutive chunks
    assert(byDoc(1L).map(c => (c._2, c._3, c._4)).toSeq.sorted ==
      Seq((0, 0, 32), (1, 16, 24), (2, 32, 8)))
    val c0 = byDoc(1L).find(_._2 == 0).get._5.split(" ")
    val c1 = byDoc(1L).find(_._2 == 1).get._5.split(" ")
    assert(c0.drop(16).toSeq == c1.take(16).toSeq)
    // doc 2: single short chunk; doc 3 (whitespace): no chunks
    assert(byDoc(2L).map(c => (c._2, c._4, c._5)).toSeq ==
      Seq((0, 3, "a b c")))
    assert(!byDoc.contains(3L))
    // chunk ids unique
    val ids = Chunking.passageChunksOf(d).select("chunk_id").collect()
      .map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    intercept[IllegalArgumentException] {
      Chunking.passageChunksOf(d, window = 8, stride = 9)
    }
  }

  test("plan shapes: span hash join is equi (no cartesian); dsir ratio table broadcasts") {
    val p1 = SpanDedup.dupSpans(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoop"), p1.take(2000))
    val p2 = Dsir.dsirWeights(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"), p2.take(2000))
    assert(!p2.contains("CartesianProduct"))
  }
}
