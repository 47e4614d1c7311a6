package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** Differential + contract tests for weighted PageRank (the oracle row
  * pins engine-vs-engine values on the procurement graph; these pin the
  * math against an independent driver-side reference). */
class PageRankSpec extends AnyFunSuite {
  import SparkTestSession._

  private def edges(rows: (String, String, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  /** Driver-side reference: same formula, same ordered in-neighbor fold,
    * plain Scala maps. */
  private def ref(es: Seq[(String, String, Long)],
      iters: Int): Map[String, Double] = {
    val wout = es.groupBy(_._1).map { case (s2, g) =>
      s2 -> g.map(_._3).sum.toDouble }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var rank = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val in = es.groupBy(_._2)
      rank = nodes.map { n =>
        val s2 = in.getOrElse(n, Seq.empty).sortBy(_._1)
          .foldLeft(0.0) { case (acc, (src, _, w)) =>
            acc + rank(src) * w.toDouble / wout(src)
          }
        n -> (0.15 + 0.85 * s2)
      }.toMap
    }
    rank
  }

  private val tri = Seq( // weighted triangle plus a bidirectional spur
    ("a", "b", 2L), ("b", "a", 2L),
    ("b", "c", 1L), ("c", "b", 1L),
    ("c", "a", 3L), ("a", "c", 3L),
    ("c", "d", 1L), ("d", "c", 1L))

  test("matches the driver-side reference bit-for-bit") {
    val out = PageRank.pageRankOf(edges(tri: _*)).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    val want = ref(tri, 3)
    assert(out.keySet == want.keySet)
    want.foreach { case (n, r) =>
      assert(out(n) == r, s"node $n: got ${out(n)}, want $r")
    }
  }

  test("heavier-linked nodes rank higher; spur leaf ranks lowest") {
    val out = PageRank.pageRankOf(edges(tri: _*), iters = 5).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    // d hangs off the graph by one unit edge: strictly least central
    assert(out("d") < out("a") && out("d") < out("b") && out("d") < out("c"))
    // a and c share the heavy w=3 edge: both above b
    assert(out("a") > out("b") && out("c") > out("b"))
  }

  test("mass is conserved on an ergodic graph (Σrank ≈ N)") {
    val out = PageRank.pageRankOf(edges(tri: _*), iters = 4).collect()
    val total = out.map(_.getAs[Double]("rank")).sum
    assert(math.abs(total - out.length) < 1e-9)
  }

  test("the ordered fold makes ranks partition-independent") {
    val e = edges(tri: _*)
    val a = PageRank.pageRankOf(e.repartition(1)).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    val b = PageRank.pageRankOf(e.repartition(5)).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    assert(a == b)
  }
}
