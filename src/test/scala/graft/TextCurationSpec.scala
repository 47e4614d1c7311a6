package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextCuration

/** Property tests for the C4/Gopher-style curation operators (the oracle
  * rows pin exact values; these pin the semantic contracts on adversarial
  * fixtures). */
class TextCurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("line dedup keeps the first global occurrence and reassembles in order") {
    val chunk = "w1 w2 w3 w4 w5 w6 w7 w8" // one exact 8-word line
    val d = docs(
      1L -> s"$chunk a b c d e f g h",
      2L -> s"$chunk x y z p q r s t") // repeats doc 1's first chunk
    val out = TextCuration.lineDedupOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_lines") == 2 &&
      out(1L).getAs[Int]("n_kept") == 2)
    assert(out(2L).getAs[Int]("n_lines") == 2 &&
      out(2L).getAs[Int]("n_kept") == 1)
    assert(out(2L).getAs[String]("text_dedup") == "x y z p q r s t")
    // order preserved in the survivor
    assert(out(1L).getAs[String]("text_dedup") ==
      s"$chunk a b c d e f g h")
    // idempotence: dedup of the deduped text keeps everything
    val again = TextCuration.lineDedupOf(
      docs(1L -> out(1L).getAs[String]("text_dedup"),
        2L -> out(2L).getAs[String]("text_dedup"))).collect()
    assert(again.forall(r =>
      r.getAs[Int]("n_kept") == r.getAs[Int]("n_lines")))
  }

  test("line dedup survives a degenerate hot line (one chunk, thousands of copies)") {
    val banner = "please enable javascript to view this site now" // 8 words
    val d = docs((1L to 500L).map(i => i -> banner): _*)
    val out = TextCuration.lineDedupOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 500)
    assert(out(1L).getAs[Int]("n_kept") == 1 &&
      out(1L).getAs[String]("text_dedup") == banner)
    assert((2L to 500L).forall(i => out(i).getAs[Int]("n_kept") == 0 &&
      out(i).getAs[String]("text_dedup") == ""))
  }

  test("repetition stats flag n-gram spam, pass varied text") {
    val spam = Seq.fill(20)("buy now").mkString(" ")
    val varied = (1 to 40).map(i => s"tok$i").mkString(" ")
    val out = TextCuration.repetitionStatsOf(docs(1L -> spam, 2L -> varied))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("flagged") == 1)
    assert(out(1L).getAs[Double]("top_bigram_frac") > 0.4) // "now buy"/"buy now"
    assert(out(2L).getAs[Int]("flagged") == 0)
    assert(out(2L).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("sequence packing: contiguous per-shard offsets, bounded seq_offset") {
    val d = docs((0L to 31L).map(i =>
      i -> (1 to (i.toInt % 5 + 3)).map(j => s"w$j").mkString(" ")): _*)
    val out = TextCuration.sequencePackOf(d, seqLen = 10, nShards = 4)
      .collect()
    assert(out.forall(_.getAs[Long]("seq_offset") < 10))
    // per shard: start_tok of the k-th doc == sum of earlier docs' tokens
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        val start = r.getAs[Long]("seq_id") * 10 + r.getAs[Long]("seq_offset")
        assert(start == cum, s"doc ${r.getAs[Long]("doc_id")}")
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("pii redaction replaces every match and counts them") {
    val d = docs(
      1L -> "reach me at a.user@test.org or bob@x.io and call 123-4567",
      2L -> "nothing sensitive here")
    val out = TextCuration.piiRedact(spark, sfDir) // oracle form runs on table
    val direct = d.select(col("doc_id"),
      regexp_count(col("text"),
        lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(direct(1L) == 2 && direct(2L) == 0)
    // the driver-contract query redacts its augmented slice completely
    val leaked = out.filter(col("redacted").contains("@example.com") ||
      col("redacted").rlike("[0-9]{3}-[0-9]{4}"))
    assert(leaked.count() == 0)
    assert(out.filter(col("n_emails") > 0).count() > 0)
  }
}

/** Source-mix properties: exact fractions under a 100% weight, salt
  * independence from the train/val/test split. */
class SourceMixSpec extends AnyFunSuite {
  import SparkTestSession._

  test("weights govern per-source keep fractions; 100% keeps everything") {
    val all = graft.llm.Sampling.sourceMix(spark, sfDir,
      Map("src0" -> 100, "src1" -> 100)).collect()
    val n = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src0", "src1")).count()
    assert(all.length == n) // 100% weight = every doc of that source
    val mixed = graft.llm.Sampling.sourceMix(spark, sfDir).collect()
    val bySrc = mixed.groupBy(_.getAs[String]("source")).view
      .mapValues(_.length).toMap
    assert(bySrc.keySet == Set("src0", "src1", "src2")) // unlisted dropped
    // 25 docs per source in sf0.01: 100% keeps all, 50%/25% keep fewer
    assert(bySrc("src0") == 25)
    assert(bySrc("src1") < 25 && bySrc("src1") > 5)
    assert(bySrc("src2") < bySrc("src1"))
    // deterministic across evaluations
    val again = graft.llm.Sampling.sourceMix(spark, sfDir).collect()
    assert(again.map(_.getLong(0)).toSeq == mixed.map(_.getLong(0)).toSeq)
  }
}

/** Temperature-mixing contracts: α-endpoints, rarest-language retention,
  * determinism (exact values are oracle-pinned by q_temperature_mix). */
class TemperatureMixSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs() = {
    val s = spark; import s.implicits._
    // 64 'en' vs 8 'fr': sqrt flattening keeps all fr, ~sqrt(1/8) of en
    ((1L to 64L).map(i => (i, "en")) ++ (65L to 72L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
  }

  test("alpha=0.5 keeps the rarest language whole and flattens the head") {
    val out = graft.llm.Sampling.temperatureMixOf(docs()).collect()
    val byLang = out.groupBy(_.getAs[String]("lang")).view
      .mapValues(_.length).toMap
    assert(byLang("fr") == 8) // rate 1.0: every fr doc kept
    // en rate = sqrt(8/64) ≈ 0.354: strictly flattened but not erased
    assert(byLang("en") < 40 && byLang("en") > 8)
    val ppm = out.filter(_.getAs[String]("lang") == "en")
      .map(_.getAs[Long]("rate_ppm")).distinct
    assert(ppm.length == 1 &&
      ppm.head == math.floor(math.sqrt(8.0 / 64.0) * 1e6).toLong)
  }

  test("alpha=1 is the natural distribution; alpha=0 equalizes the threshold") {
    val all = graft.llm.Sampling.temperatureMixOf(docs(), alpha = 1.0)
      .collect()
    assert(all.length == 72) // rate 1.0 everywhere
    val eq = graft.llm.Sampling.temperatureMixOf(docs(), alpha = 0.0)
      .collect()
    val ppm = eq.map(r => r.getAs[String]("lang") -> r.getAs[Long]("rate_ppm"))
      .toMap
    assert(ppm("en") == 125000L && ppm.getOrElse("fr", 1000000L) == 1000000L)
  }

  test("membership is deterministic and a pure function of (salt, doc_id)") {
    val a = graft.llm.Sampling.temperatureMixOf(docs()).collect()
      .map(_.getLong(0)).toSeq
    val b = graft.llm.Sampling.temperatureMixOf(docs()).collect()
      .map(_.getLong(0)).toSeq
    assert(a == b)
    val c = graft.llm.Sampling.temperatureMixOf(docs(), salt = "tmix2")
      .collect().map(_.getLong(0)).toSeq
    assert(c != a) // a new salt is a fresh draw
  }
}

/** Epoch shuffle + contrastive negative sampling contracts (exact
  * values are oracle-pinned by q_global_shuffle / q_negative_pairs). */
class ShuffleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("globalShuffle is a reproducible permutation; a new salt is a new epoch") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val a = graft.llm.Sampling.globalShuffleOf(docs).collect()
    assert(a.length == n && a.map(_.getLong(0)).distinct.length == n)
    // positions are contiguous 1..sz inside every shard
    a.groupBy(_.getAs[Int]("shard")).values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rows.length))
    }
    // deterministic across evaluations, different across salts
    val again = graft.llm.Sampling.globalShuffleOf(docs).collect()
    assert(again.map(_.toString).sorted.toSeq == a.map(_.toString).sorted.toSeq)
    val ep1 = graft.llm.Sampling.globalShuffleOf(docs, salt = "ep1").collect()
    val orderA = a.sortBy(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos")))
      .map(_.getLong(0)).toSeq
    val orderB = ep1.sortBy(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos")))
      .map(_.getLong(0)).toSeq
    assert(orderA != orderB, "salt change must reshuffle the epoch")
  }

  test("negativePairs: k non-self negatives per doc, salt-sensitive, no cartesian") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.llm.Sampling.negativePairsOf(docs, k = 2)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val rows = out.collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size == docs.count())
    byDoc.foreach { case (id, rs) =>
      assert(rs.length <= 2)
      assert(rs.forall(_.getAs[Long]("neg_id") != id), s"self-pair for $id")
      assert(rs.map(_.getAs[Int]("j")).forall(j => j == 1 || j == 2))
    }
    val other = graft.llm.Sampling.negativePairsOf(docs, k = 2, salt = "neg2")
      .collect()
    assert(other.map(_.toString).toSeq != rows.map(_.toString).toSeq,
      "salt change must draw different negatives")
  }
}

/** Differential test for the distributed learned-BPE merge trainer. */
class BpeTrainSpec extends AnyFunSuite {
  import SparkTestSession._

  test("distributed BPE merges match a driver-side list-walk reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa abab banana bandana"),
      (2L, "the cat and the hat in the banana stand"),
      (3L, "aaaaa aaa abab abab abab low lower lowest"),
      (4L, "Mixed CASE and punct!!! banana?? bandana."))
      .toDF("doc_id", "text")
    val merges = 10
    // reference: greedy leftmost list-walk merging — no regex, so it can
    // only agree with the two-space regexp_replace encoding if that
    // encoding really is exact greedy merging (overlapping runs like
    // "aaaaa" are the adversarial case)
    def mergeWord(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    var vocab: Map[List[String], Long] = docs.collect()
      .flatMap(r => "[a-z]+".r.findAllIn(r.getString(1).toLowerCase))
      .groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.length.toLong }
    val expected =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to merges) {
      val counts = vocab.toSeq
        .flatMap { case (syms, cnt) => syms.zip(syms.tail).map(_ -> cnt) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (counts.nonEmpty) {
        val ((a, b), f) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        expected += ((step, a, b, f))
        vocab = vocab.toSeq
          .map { case (syms, cnt) => mergeWord(syms, a, b) -> cnt }
          .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      }
    }
    val got = graft.llm.TextOps.bpeTrain(docs, merges).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    assert(got.length == merges) // fixture doesn't exhaust early

    // encode with the learned table: per-doc token counts must match
    // applying the reference merges word by word
    val encExpected = docs.collect().map { r =>
      val ws = "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
      val nToks = ws.map { w =>
        expected.foldLeft(w.toList.map(_.toString)) {
          case (syms, (_, a, b, _)) => mergeWord(syms, a, b)
        }.length.toLong
      }.sum
      (r.getLong(0), ws.length.toLong, nToks)
    }.sortBy(_._1).toSeq
    val enc = graft.llm.TextOps.bpeEncode(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc == encExpected)
    // merging strictly compressed: fewer learned tokens than characters
    val rawChars = docs.collect().map(r =>
      "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).map(_.length).sum).sum
    assert(enc.map(_._3).sum < rawChars)
  }
}

/** Corpus n-gram statistics: differential vs a driver-side count plus a
  * plan-shape pin (the oracle row checks exact values at sf0.01). */
class NgramStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ngramStatsOf matches a driver-side trigram count, ties broken lexically") {
    val s = spark; import s.implicits._
    val d = Seq(
      1L -> "the quick brown fox jumps over the quick brown dog",
      2L -> "The Quick Brown fox; the quick brown fox!",
      3L -> "ab", // < n words after tokenization → contributes nothing
      4L -> "one two three").toDF("doc_id", "text")
    val expected = d.collect().flatMap { r =>
      val ws = "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
      ws.sliding(3).filter(_.length == 3).map(_.mkString(" "))
    }.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
      .toSeq.sortBy { case (g, c) => (-c, g) }.take(5)
    val got = graft.llm.TextOps.ngramStatsOf(d, n = 3, topK = 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    assert(got.head == ("the quick brown" -> 4L))
  }

  test("top-k is TakeOrderedAndProject, not a global sort of the gram table") {
    val s = spark; import s.implicits._
    val d = Seq(1L -> "a b c d e f").toDF("doc_id", "text")
    val p = graft.llm.TextOps.ngramStatsOf(d).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ngramDocScoreOf separates boilerplate from unique text") {
    val s = spark; import s.implicits._
    val boiler = "terms of service apply to all users"
    val d = Seq(
      1L -> boiler, 2L -> boiler, 3L -> boiler, // 3 identical docs
      4L -> "wholly unique prose nothing shares these grams",
      5L -> "xy") // < n words -> no row
    val out = graft.llm.TextOps.ngramDocScoreOf(d.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(5L))
    // each boiler doc: 5 trigrams, every gram occurs 3x in the corpus
    (1L to 3L).foreach { id =>
      assert(out(id).getAs[Int]("n_grams") == 5)
      assert(out(id).getAs[Int]("n_rare") == 0)
      assert(out(id).getAs[Double]("boiler_score") == 3.0)
      assert(out(id).getAs[Double]("rare_frac") == 0.0)
    }
    // the unique doc: every gram is corpus-unique
    assert(out(4L).getAs[Double]("rare_frac") == 1.0)
    assert(out(4L).getAs[Double]("boiler_score") == 1.0)
  }
}

/** Relevance-scoring family: ordering/shape properties (exactness is
  * oracle-checked by q_tfidf / q_bm25). */
class RelevanceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tfidf emits k non-increasing scores per doc, favoring rarer terms") {
    val rows = graft.llm.TextOps.tfIdf(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val ordered = rs.sortBy(_.getAs[Int]("rnk"))
      assert(ordered.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length))
      val scores = ordered.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // a term every doc contains scores near the idf floor and cannot be
    // a top term anywhere unless its tf dominates — spot check: the
    // ubiquitous term 'a' never beats all others in every doc
    assert(!byDoc.values.forall(_.exists(r =>
      r.getString(1) == "a" && r.getAs[Int]("rnk") == 1)))
  }

  test("bm25 returns a deterministic non-increasing top-20 of query-term docs") {
    val out = graft.llm.TextOps.bm25(spark, sfDir)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    val rows = out.collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to 20))
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0.0))
    // every ranked doc really contains a query term
    val ids = rows.map(_.getLong(0)).toSet
    val withTerm = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(lower(col("text")).rlike("\\b(hash|join|window)\\b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm))
    // deterministic across evaluations
    val again = graft.llm.TextOps.bm25(spark, sfDir).collect()
    assert(again.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
