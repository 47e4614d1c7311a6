package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** In-cell embedding-audit family: kNN label-noise flags and
  * margin-based pair mining. Canary fixtures pin the semantics the
  * sf-scale oracle rows can't isolate (a planted mislabel IS flagged;
  * an aligned cross-side pair out-scores a hub). */
class EmbedAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  private def frame(rows: Seq[(Long, Seq[Float], Int, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label", "cid")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("planted mislabel is flagged; clean majority is not") {
    // one cell: 6 vectors tightly around e1 labeled 0, one vector ALSO
    // on e1 but labeled 1 (the planted mislabel), one far vector
    // labeled 1 on e2 (correctly labeled, but its in-cell neighbors
    // all disagree - kNN voting flags it too: the known behavior of a
    // minority class inside a cell)
    val near = (0 until 6).map { j =>
      (j.toLong, Seq(1.0f, 0.01f * j, 0f), 0, 0)
    }
    val planted = (6L, Seq(1.0f, 0.03f, 0f), 1, 0)
    val rows = Similarity.labelNoiseFrom(frame(near :+ planted), k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(rows(6L) == ((1, 0, 1)), rows) // mislabel: knn says 0, suspect
    near.foreach { case (id, _, _, _) =>
      val (_, knn, suspect) = rows(id)
      assert(knn == 0 && suspect == 0, s"clean vec $id got ${rows(id)}")
    }
  }

  test("label noise on sf data: verdict only for non-singleton cells, deterministic") {
    val got = Similarity.labelNoise(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, label, knnLabel, suspect) =>
      assert(suspect == (if (knnLabel != label) 1 else 0))
    }
    val again = Similarity.labelNoise(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == again.toSeq)
  }

  test("aligned cross-side pair out-margins a hub; sides are respected") {
    // side A (label 0): a1 aligned with b1; a2 a "hub" equally close to
    // every B vector. side B (label 5): three spread directions.
    val fixture = frame(Seq(
      (1L, Seq(0.999f, 0.0447f, 0f), 0, 0),     // a1 ~ b1
      (2L, Seq(0.577f, 0.577f, 0.577f), 0, 0),  // a2 hub
      (10L, Seq(1f, 0f, 0f), 5, 0),             // b1
      (11L, Seq(0f, 1f, 0f), 5, 0),             // b2
      (12L, Seq(0.7071f, 0.7071f, 0f), 5, 0)))  // b3
    val got = Similarity.marginPairsFrom(fixture, k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getInt(4))).toMap
    val (a1Best, a1Margin, a1Accept) = got(1L)
    val (_, a2Margin, _) = got(2L)
    assert(a1Best == 10L) // a1's mate is b1
    assert(a1Margin > a2Margin, s"$a1Margin !> $a2Margin")
    assert(a1Accept == 1)
  }

  test("margin pairs on sf data: one pair per A-query, flags match threshold") {
    val got = Similarity.marginPairs(spark, sfDir).collect()
    assert(got.nonEmpty)
    val ids = got.map(_.getLong(0))
    assert(ids.distinct.length == ids.length) // top-1 per A vector
    got.foreach { r =>
      assert(r.getInt(4) == (if (r.getDouble(3) >= 1.05) 1 else 0))
    }
  }
}
