package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** Differential + contract tests for weighted PageRank (the oracle row
  * pins engine-vs-engine values on the procurement graph; these pin the
  * math against an independent driver-side reference that replays the
  * same fixed-point quantization). */
class PageRankSpec extends AnyFunSuite {
  import SparkTestSession._

  private def edges(rows: (Long, Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  /** Driver-side reference: same formula, same 1e-9 floor quantization,
    * plain Scala maps — summation order is free BECAUSE the quantized
    * contributions are exact integers. */
  private def ref(es: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, Double] = {
    val wout = es.groupBy(_._1).map { case (s2, g) =>
      s2 -> g.map(_._3).sum.toDouble }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var rank = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val in = es.groupBy(_._2)
      rank = nodes.map { n =>
        val sq = in.getOrElse(n, Seq.empty)
          .map { case (src, _, w) =>
            math.floor(rank(src) * w.toDouble / wout(src) * 1e9).toLong
          }.sum
        n -> (0.15 + 0.85 * (sq.toDouble / 1e9))
      }.toMap
    }
    rank
  }

  private val tri = Seq( // weighted triangle plus a bidirectional spur
    (1L, 2L, 2L), (2L, 1L, 2L),
    (2L, 3L, 1L), (3L, 2L, 1L),
    (3L, 1L, 3L), (1L, 3L, 3L),
    (3L, 4L, 1L), (4L, 3L, 1L))

  test("matches the driver-side reference bit-for-bit") {
    val out = PageRank.pageRankOf(edges(tri: _*)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    val want = ref(tri, 3)
    assert(out.keySet == want.keySet)
    want.foreach { case (n, r) =>
      assert(out(n) == r, s"node $n: got ${out(n)}, want $r")
    }
  }

  test("heavier-linked nodes rank higher; spur leaf ranks lowest") {
    val out = PageRank.pageRankOf(edges(tri: _*), iters = 5).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    // node 4 hangs off the graph by one unit edge: strictly least central
    assert(out(4L) < out(1L) && out(4L) < out(2L) && out(4L) < out(3L))
    // 1 and 3 share the heavy w=3 edge: both above 2
    assert(out(1L) > out(2L) && out(3L) > out(2L))
  }

  test("mass is conserved on an ergodic graph up to quantization loss") {
    val out = PageRank.pageRankOf(edges(tri: _*), iters = 4).collect()
    val total = out.map(_.getAs[Double]("rank")).sum
    // each of the 8 edges loses < 1e-9 per round to the floor
    assert(math.abs(total - out.length) < 1e-6)
  }

  test("a zero-weight edge is no edge (no NaN leakage)") {
    val withZero = tri ++ Seq((4L, 5L, 0L)) // 5 only reachable via w=0
    val out = PageRank.pageRankOf(edges(withZero: _*)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    assert(!out.contains(5L)) // dropped edge -> node never enters the graph
    assert(out == ref(tri, 3).map { case (k, v) => k -> v }) // rest unchanged
    assert(out.values.forall(v => !v.isNaN))
  }

  test("random ergodic graphs match the reference (property sweep)") {
    // deterministic pseudo-random graphs (hash-derived, no RNG): n nodes,
    // each undirected edge (i, j) present iff md5(seed#i#j) is even,
    // weight 1 + hash % 5 — always including a ring so the graph is
    // connected/ergodic
    def graph(seed: Int, n: Int): Seq[(Long, Long, Long)] = {
      def h(s: String): Long = math.abs(
        java.util.UUID.nameUUIDFromBytes(s.getBytes).getLeastSignificantBits)
      val ring = (0 until n).flatMap { i =>
        val j = (i + 1) % n
        Seq((i.toLong, j.toLong, 1L), (j.toLong, i.toLong, 1L))
      }
      val extra = (for {
        i <- 0 until n; j <- (i + 2) until n
        if h(s"$seed#$i#$j") % 3 == 0
      } yield {
        val w = 1L + h(s"w$seed#$i#$j") % 5
        Seq((i.toLong, j.toLong, w), (j.toLong, i.toLong, w))
      }).flatten
      ring ++ extra
    }
    Seq((1, 9), (2, 14), (3, 20)).foreach { case (seed, n) =>
      val es = graph(seed, n)
      val out = PageRank.pageRankOf(edges(es: _*)).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
      val want = ref(es, 3)
      assert(out == want, s"seed=$seed n=$n")
    }
  }

  test("the quantized sum makes ranks partition-independent") {
    val e = edges(tri: _*)
    val a = PageRank.pageRankOf(e.repartition(1)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    val b = PageRank.pageRankOf(e.repartition(5)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    assert(a == b)
  }
}
