package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Classifier

/** Differential tests for the batch-perceptron quality classifier against a
  * plain-Scala reference run over the collected fixture. */
class ClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  private val stop = Set("the", "a", "of", "and", "to")

  /** Driver-side reference: features + full-batch perceptron rounds. */
  private def reference(): (Seq[(Long, Long, Array[Long])], Seq[Array[Long]]) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
    val feats = docs.map { r =>
      val toks = r.getString(1).trim.split("\\s+").toSeq
      val (nTok, nStop) = (toks.size.toLong, toks.count(stop).toLong)
      val y = if (nTok >= 25 && nStop * 5 <= nTok) 1L else -1L
      (r.getLong(0), y, Array(1L, nTok - 25, toks.distinct.size.toLong - 18,
        nStop - 2, r.getLong(3) - 140))
    }.sortBy(_._1).toSeq
    var w = Array.fill(5)(0L)
    val hist = (1 to 3).map { _ =>
      val err = feats.filter { case (_, y, x) =>
        y * (0 until 5).map(j => w(j) * x(j)).sum <= 0
      }
      w = (0 until 5).map(j => w(j) + err.map { case (_, y, x) => y * x(j) }.sum).toArray
      (err.size.toLong, w.clone())
    }
    (feats, hist.map { case (n, ws) => Array(n) ++ ws })
  }

  test("clfTrain trajectory matches the driver-side perceptron exactly") {
    val (_, hist) = reference()
    val got = Classifier.clfTrain(spark.read.parquet(s"$sfDir/documents.parquet"))
      .collect().sortBy(_.getInt(0))
    assert(got.length == 3)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i + 1)
      assert(r.getLong(1) == hist(i)(0), s"n_err round ${i + 1}")
      (0 until 5).foreach(j =>
        assert(r.getLong(2 + j) == hist(i)(1 + j), s"w$j round ${i + 1}"))
    }
    // training must actually learn: the error count collapses after the
    // first full-batch step (round 1 misclassifies everything by
    // construction, w = 0)
    assert(hist(1)(0) < hist(0)(0) / 10,
      s"n_err ${hist(0)(0)} -> ${hist(1)(0)} did not collapse")
  }

  test("clfScore applies the final weights; both labels occur") {
    val (feats, hist) = reference()
    val w = hist.last.drop(1)
    val expect = feats.map { case (id, _, x) =>
      id -> (0 until 5).map(j => w(j) * x(j)).sum
    }.toMap
    val got = Classifier.clfScore(spark.read.parquet(s"$sfDir/documents.parquet"))
      .collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val s = expect(r.getLong(0))
      assert(r.getLong(1) == s)
      assert(r.getString(2) == (if (s > 0) "keep" else "drop"))
    }
    assert(got.exists(_.getString(2) == "keep") &&
      got.exists(_.getString(2) == "drop"))
  }
}
