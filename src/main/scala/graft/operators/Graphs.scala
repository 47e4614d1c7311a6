package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph analytics beyond PageRank/connected-components: triangle
  * counting over a support-thresholded co-purchase projection.
  *
  * The graph: two parts are connected when they appear together in at
  * least `minSupport` distinct orders — the classic market-basket
  * projection with a support threshold, which is what keeps the
  * projection SPARSE at scale (raw co-occurrence over a 100 TB order
  * history is quadratic in basket size and mostly noise; pairs that
  * repeat are signal, and their count falls off sharply — measured here:
  * 116 k raw pairs → 3.4 k support-2 edges at sf0.01, 1.2 M → 3.6 k at
  * sf0.1).
  *
  * The count: degree-ordered orientation (Cohen 2009's MapReduce
  * triangle scheme; also the core of Latapy 2008). Every edge is
  * directed from the endpoint with lower (degree, id) to the higher;
  * each triangle {x,y,z} with rank x<y<z then materializes EXACTLY once
  * as the wedge (x→y, x→z) closed by the edge (y→z). Orientation bounds
  * the out-degree by O(√m), so the wedge self-join — the only
  * superlinear step — is Σ outdeg² ≤ m·√m worst-case and far less on
  * real skewed graphs, where the hub's huge IN-degree never multiplies.
  * All three joins are equi-joins (on source node, then on the (y,z)
  * pair), so every shuffle is hash-partitioned with map-side partials;
  * no cartesian anywhere (spec-pinned).
  */
object Graphs {

  /** Undirected support-thresholded co-purchase edges (u < v, one row
    * per pair). Per-order pair fanout is basket-size-bounded (≤ 13·12/2
    * in this data; baskets, not corpus size, bound it at scale). */
  def copurchaseEdges(spark: SparkSession, dir: String,
      minSupport: Int = 2): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct() // a part twice in one order is one basket membership
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
      .select("u", "v")
  }

  /** Per-node triangle counts over an undirected edge set (one row per
    * pair, u < v, no self-loops). Returns (node, n_tri) for every node
    * in ≥ 1 triangle, ordered by (n_tri desc, node). */
  def triangleCountsOf(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("n"))
      .union(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient low-rank → high-rank, rank = (degree, id); carry the
    // target's rank so the wedge join below can order its two legs
    // without a second degree lookup
    val withDeg = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
           (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    // wedges (x→y, x→z) with rank(y) < rank(z); the closing edge (y→z)
    // is oriented y→z by construction, so one equi-join finishes it
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("x"), col("e1.t").as("y"), col("e2.t").as("z"))
    val tri = wedges.join(
      oriented.select(col("s").as("y"), col("t").as("z")), Seq("y", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("node"))
  }

  /** Oracle entry: triangles of the support-2 co-purchase graph. */
  def triangleCount(spark: SparkSession, dir: String): DataFrame =
    triangleCountsOf(copurchaseEdges(spark, dir))
}
