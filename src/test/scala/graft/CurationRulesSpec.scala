package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextCuration

/** The modern curation funnel: stage accounting must reconcile and each
  * stage must equal the standalone operator on the surviving subset. */
class CurationFunnelSpec extends AnyFunSuite {
  import SparkTestSession._

  test("funnel stages reconcile and agree with standalone operators") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val f = graft.llm.Curation.curationFunnel(docs).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Int]("ord"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_kept")))
    assert(f.map(_._1).toSeq == Seq("gopher_rules", "c4_rules",
      "lm_perplexity", "canonical_dedup", "temperature_mix", "token_budget"))
    // chain accounting: every stage consumes exactly what the previous kept
    f.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"${b._1} n_in ${b._3} != ${a._1} n_kept ${a._4}")
    }
    f.foreach { case (n, _, i, k) => assert(k <= i, s"$n grew the corpus") }
    assert(f.head._3 == docs.count())
    // stage 1 must equal the standalone gopher gate on the full corpus
    val gopherKeep = graft.llm.TextCuration.gopherRulesOf(docs)
      .filter(org.apache.spark.sql.functions.col("keep") === 1).count()
    assert(f.head._4 == gopherKeep)
  }
}

/** Data card: known-answer metrics on a tiny corpus. */
class DataCardSpec extends AnyFunSuite {
  import SparkTestSession._

  test("metrics are exact on a hand-computable fixture") {
    val s = spark; import s.implicits._
    val good = ((1 to 23).map(i => s"w$i") ++ Seq("the", "a")).mkString(" ")
    val d = Seq(
      (1L, good, "en", "s0"), // 25 toks, 2 stop: passes the quality gate
      (2L, good, "en", "s1"), // exact duplicate of 1's text
      (3L, "tiny doc", "de", "s0"), // fails gate (too short)
      (4L, "the the the the", "en", "s0")) // 4 toks: fails gate
      .toDF("doc_id", "text", "lang", "source")
    val card = graft.llm.TextOps.dataCardOf(d).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(card("n_docs") == 4.0)
    assert(card("n_tokens") == 25.0 + 25.0 + 2.0 + 4.0)
    assert(card("n_langs") == 2.0 && card("n_sources") == 2.0)
    assert(card("exact_dup_frac") == 0.25) // 3 distinct texts of 4
    assert(card("quality_keep_frac") == 0.5) // docs 1 and 2
    assert(card("mean_doc_tokens") == 14.0)
  }
}

/** k-anonymous release: no published row under k, suppressed mass
  * conserved, no empty fold row. */
class KAnonSpec extends AnyFunSuite {
  import SparkTestSession._

  test("EVERY released row has at least k members — including 'other'") {
    val out = graft.operators.Relational.kanonRelease(spark, sfDir, k = 10)
      .collect()
    assert(out.forall(_.getAs[Long]("n") >= 10), out.mkString("; "))
    // released mass never exceeds the corpus; the shortfall (if any) is
    // a below-k fold that must be fully suppressed, not published
    val total = out.map(_.getAs[Long]("n")).sum
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(total <= docs)
    if (total < docs)
      assert(!out.exists(_.getAs[String]("lang") == "<suppressed>"))
  }

  test("a below-k residue is suppressed entirely, not published as the fold row") {
    val s = spark; import s.implicits._
    // one big group + one 3-member group: the residue is under k, and
    // publishing it as 'other' would disclose that group's exact stats
    val rows = (1L to 20L).map(i => (i, "en", "s0", 10L)) ++
      (21L to 23L).map(i => (i, "fr", "s1", 10L))
    val out = graft.operators.Relational
      .kanonReleaseOf(rows.toDF("doc_id", "lang", "source", "n_chars"), 10)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("lang") == "en" &&
      out.head.getAs[Long]("n") == 20L)
    // and a residue that itself clears k IS published as one fold row
    val rows2 = rows ++ (24L to 32L).map(i => (i, "zh", "s2", 10L))
    val out2 = graft.operators.Relational
      .kanonReleaseOf(rows2.toDF("doc_id", "lang", "source", "n_chars"), 10)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    assert(out2 == Map("en" -> 20L, "<suppressed>" -> 12L)) // 3 fr + 9 zh folded
  }

  test("when every group clears k there is no fold row") {
    val out = graft.operators.Relational.kanonRelease(spark, sfDir, k = 1)
      .collect()
    assert(!out.exists(_.getAs[String]("lang") == "<suppressed>"))
  }
}

/** Budget selection: the two-phase cut must equal the naive global
  * running-sum window, with sane budget endpoints. */
class BudgetSelectSpec extends AnyFunSuite {
  import SparkTestSession._

  private def naive(budget: Long) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scored = graft.llm.Classifier.clfScore(docs)
      .join(docs.select(col("doc_id"),
        size(graft.llm.TextOps.tokens(col("text"))).cast("long").as("n_tok")),
        "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), asc("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    scored.withColumn("cum", sum("n_tok").over(w))
      .filter(col("cum") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  private def twoPhase(budget: Long) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.llm.Sampling.budgetSelectOf(docs, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("two-phase selection equals the naive global window") {
    Seq(0L, 100L, 500L, 1000L, 2000L, Long.MaxValue / 4).foreach { b =>
      assert(twoPhase(b) == naive(b), s"budget $b")
    }
  }

  test("budget endpoints: zero selects nothing, infinite selects all") {
    assert(twoPhase(0L).isEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(twoPhase(Long.MaxValue / 4).size == docs)
  }
}

/** Contract tests for the Gopher rule battery and C4 heuristics on
  * adversarial fixtures (the oracle rows pin engine-vs-engine values on
  * the corpus; these pin each rule's firing condition). */
class CurationRulesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def gopher(rows: (Long, String)*): Map[Long, Map[String, Int]] =
    TextCuration.gopherRulesOf(docs(rows: _*)).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        Seq("r_word_count", "r_mean_len", "r_symbol", "r_bullet",
          "r_ellipsis", "r_alpha", "r_stop", "keep")
          .map(c => c -> r.getAs[Int](c)).toMap
    }.toMap

  // 60 plain words incl. >=2 gopher stopwords, mean length in [3,10]
  private val good = ((1 to 58).map(i => s"word$i") ++ Seq("the", "with"))
    .mkString(" ")

  test("a clean document passes every gopher rule") {
    val out = gopher(5L -> good) // 5 avoids the %13/%17/%19 fabrications
    assert(out(5L).values.forall(_ == 1), out(5L).toString)
  }

  test("each gopher rule fires independently") {
    val out = gopher(
      5L -> good,
      6L -> "too short with the", // < 50 words
      7L -> ((1 to 58).map(_ => "supercalifragilistic") ++
        Seq("the", "with")).mkString(" "), // mean word length > 10
      8L -> (good + " " + (1 to 10).map(_ => "#").mkString(" ")), // symbols
      9L -> ((1 to 58).map(i => s"$i") ++ Seq("the", "with"))
        .mkString(" "), // digits: alpha fraction < 0.8
      10L -> (1 to 60).map(i => s"word$i").mkString(" ")) // no stopwords
    assert(out(6L)("r_word_count") == 0 && out(6L)("keep") == 0)
    assert(out(7L)("r_mean_len") == 0 && out(7L)("r_word_count") == 1)
    assert(out(8L)("r_symbol") == 0 && out(8L)("r_word_count") == 1)
    assert(out(9L)("r_alpha") == 0)
    assert(out(10L)("r_stop") == 0 && out(10L)("r_alpha") == 1)
  }

  test("fabricated slices exercise the line rules for real") {
    // doc 13: ten bullet lines against ONE original line -> 10/11 > 90%
    // doc 17: four of five lines end with ellipsis -> > 30%
    val out = gopher(13L -> good, 17L -> good, 19L -> good)
    assert(out(13L)("r_bullet") == 0)
    assert(out(17L)("r_ellipsis") == 0)
    assert(out(19L)("r_symbol") == 0) // 8 hashes vs 68 words: > 0.1
  }

  private def c4(rows: (Long, String)*) =
    TextCuration.c4RulesOf(docs(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("c4 keeps punctuated lines, drops the unpunctuated third") {
    // doc 5: 24 words = 3 chunks; (5+idx)%3 != 0 for idx 0,2 -> 2 kept
    val words = (1 to 24).map(i => s"w$i").mkString(" ")
    val out = c4(5L -> words)
    assert(out(5L).getAs[Int]("n_lines") == 3)
    assert(out(5L).getAs[Int]("n_sent") == 2)
    assert(out(5L).getAs[Int]("n_kept") == 2)
    // fewer than 3 sentences -> the whole doc is dropped
    assert(out(5L).getAs[Int]("doc_keep") == 0)
    val kept = out(5L).getAs[String]("kept_text")
    assert(kept.split("\\.").length == 2 && kept.endsWith("."))
  }

  test("c4 doc-level screens: lorem ipsum, braces, javascript lines") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ") // 5 chunks
    val out = c4(29L -> words, 31L -> words, 23L -> words, 7L -> words)
    assert(out(29L).getAs[Int]("has_lorem") == 1 &&
      out(29L).getAs[Int]("doc_keep") == 0)
    assert(out(31L).getAs[Int]("has_brace") == 1 &&
      out(31L).getAs[Int]("doc_keep") == 0)
    // javascript kills its line, not the doc
    assert(out(23L).getAs[Int]("has_lorem") == 0)
    assert(out(23L).getAs[Int]("n_kept") < out(23L).getAs[Int]("n_sent")
      || out(23L).getAs[Int]("doc_keep") == 1)
    assert(!out(23L).getAs[String]("kept_text").contains("javascript"))
    assert(out(7L).getAs[Int]("doc_keep") == 1) // clean doc with >=3 sentences
  }
}
