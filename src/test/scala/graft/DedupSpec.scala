package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Dedup

/** Unit guards for the dedup family that the sf-scale oracle queries can't
  * pin: prefix-filter losslessness under adversarial repeated k-grams, and
  * (via SkewSpec-style row guards) degenerate-corpus behavior. */
class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Brute-force reference: distinct k-word shingle sets, all-pairs Jaccard
    * within (lang, source) blocks. */
  private def bruteForce(docs: Seq[(Long, String, String, String)],
      threshold: Double, k: Int = 3): Set[(Long, Long)] = {
    def sh(text: String): Set[String] = {
      val toks = text.trim.split("\\s+").toSeq
      toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
    }
    val withSets = docs.map { case (id, text, lang, src) =>
      (id, sh(text), lang, src) }
    (for {
      (ia, sa, la, ca) <- withSets
      (ib, sb, lb, cb) <- withSets
      if ia < ib && la == lb && ca == cb
      inter = (sa intersect sb).size
      union = sa.size + sb.size - inter
      if union > 0 && inter.toDouble / union >= threshold
    } yield (ia, ib)).toSet
  }

  test("prefix filter is lossless with repeated rare shingles (ADVICE r2)") {
    import spark.implicits._
    // The adversarial shape from the advice: a doc where one rare shingle
    // region repeats many times while common singletons fill the suffix.
    // If n_sh were computed over MULTISET shingle rows, the prefix would
    // shrink below the ceil(t*|set|) bound and drop qualifying pairs.
    val repeatedRare = (("r1 r2 r3 " * 6) + "c1 c2 c3 c4 c5 c6 c7").trim
    val partner = "r1 r2 r3 x1 x2 c1 c2 c3 c4 c5 c6 c7"
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 12).map(i => s"w$i")
    val randomDocs = (10L to 25L).map { id =>
      val words = Seq.fill(10 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "), "en", "web")
    }
    val all = Seq(
      (1L, repeatedRare, "en", "web"),
      (2L, partner, "en", "web"),
      // same text, different block: must NOT pair with 1/2
      (3L, partner, "de", "web")) ++ randomDocs
    val docs = all.toDF("doc_id", "text", "lang", "source")
    for (t <- Seq(0.2, 0.4, 0.6)) {
      val got = Dedup.ngramJaccardPairsOf(docs, t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForce(all, t)
      assert(got == want, s"threshold $t: prefix-filtered pairs diverge " +
        s"from brute force (missing=${want -- got}, extra=${got -- want})")
    }
  }
}
