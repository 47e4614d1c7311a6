package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Weighted PageRank — the second iterative-graph operator next to
  * [[ConnectedComponents]]: CC answers "which entities are the same
  * thing", PageRank answers "which entities matter" (lineage/usage
  * centrality over a metadata graph; node importance for curriculum or
  * dedup-survivor choice over a link graph in a training-data pipeline).
  *
  * Same execution shape as CC: the edge table is the only corpus-sized
  * state; each round runs two node-sized broadcast joins (ranks into
  * the edge scan; summed contributions back into the node table) around
  * ONE aggregation (by dst) with map-side partial sums — the round's
  * only shuffle. Rank state is node-sized. Rounds are UNROLLED (fixed
  * iteration count), the [[graft.llm.Similarity.ivfTrain]] pattern, so
  * the oracle replays the whole trajectory as CTEs.
  *
  * Determinism via FIXED-POINT QUANTIZATION, not ordered folds: each
  * contribution rank(src)·w/wout(src) is floor-quantized to 1e-9 units
  * as a 64-bit integer, so the per-node Σ is exact integer arithmetic —
  * order-independent, shuffle-safe, and bit-identical on any engine that
  * replays the same quantization (every upstream double op is a
  * correctly-rounded product/division of identical inputs). This keeps
  * the aggregation a native long sum with map-side combine — the ordered
  * double fold (collect_list + sort + per-element lambda) measured 4–7 s
  * PER ROUND on the sf0.1 graph and shipped every edge struct through
  * the shuffle uncombined. Cost: ≤ 1e-9 absolute error per edge per
  * round (≤ in-degree·1e-9 per rank), identically on both engines.
  * Bounds: quantized per-node sums stay < 2^53 up to ~9·10^6-node graph
  * mass·1e9 — ENFORCED by [[qscaleFor]], which drops the scale a decade
  * per 10× nodes beyond that (a loud precision step, never a silent
  * overflow; ADVICE r6). Contributions must be non-negative (floor is
  * not symmetric).
  *
  * Each directed edge (src, dst, w) contributes
  * rank(src)·w / wout(src); rank' = 0.15 + 0.85·Σ contributions (the
  * per-node-offset formulation — no global normalization pass, so no
  * extra corpus-wide aggregate per round). Nodes with no out-edges would
  * leak mass; callers supply a graph without sinks (the procurement
  * graph below is bidirectional, hence ergodic).
  */
object PageRank {

  private val QScale = 1e9

  /** Largest power-of-ten quantization scale whose worst-case per-node
    * sum stays exact in a long: total rank mass is n in round 1 (every
    * rank starts at 1.0) and ≤ 0.15·n + 0.85·n = n in every later round,
    * and in principle all of it could reach one hub — so the scale must
    * satisfy n·scale < 2^53. ≤ ~9·10^6 nodes keeps the full 1e9; each
    * further 10× of nodes drops one decade — the failure the bound
    * documents becomes a deliberate, LOUD precision step instead of a
    * silent overflow (ADVICE r6). Deterministic in n, so any
    * partitioning agrees on the scale. NOTE the oracle coupling: the
    * shared DuckDB round CTE pins 1000000000, so the oracle-checked
    * queries are exact mirrors precisely on graphs under the ~9·10^6
    * bound (test graphs are ≤ ~10^5 nodes); past it the engine's
    * documented precision step is engine-only. */
  private[graft] def qscaleFor(nNodes: Long): Double = {
    val mass = math.max(nNodes, 1L).toDouble
    var s = QScale
    while (s > 1.0 && mass * s >= 9.007199254740992e15) s /= 10.0
    require(mass * s < 9.007199254740992e15,
      s"pageRankOf: $nNodes nodes — rank mass overflows long quantization " +
        "even at scale 1; partition the graph or aggregate in decimal")
    s
  }

  /** Iterate `iters` rounds over `edges` (src, dst: long, w: long).
    * Returns (node: long, rank: double) for every node with at least one
    * in- or out-edge. Node ids are longs on purpose: integer join keys
    * and integer shuffle hashing — callers map to display names AFTER
    * the iterations, not inside them. */
  def pageRankOf(edges: DataFrame, iters: Int = 3): DataFrame = {
    // a zero/negative-weight edge is NO edge: dropping it here keeps
    // wout strictly positive, so rank·w/wout can never go NaN (floor
    // silently maps NaN to 0L while the oracle's BIGINT cast errors —
    // the one way the engines could disagree)
    val es = edges.filter(col("w") > 0)
    val wout = es.groupBy("src").agg(sum("w").cast("double").as("wout"))
    val e = es.join(wout, "src")
      .select(col("src"), col("dst"), col("w").cast("double").as("w"),
        col("wout"))
      .localCheckpoint(true) // reused every round; lineage must not stack
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    // the node count is already materialized (checkpoint) — counting it
    // to pick the safe quantization scale costs no extra scan
    val qs = qscaleFor(nodes.count())
    var rank = nodes.withColumn("rank", lit(1.0))
    (1 to iters).foreach { _ =>
      // each round's rank feeds the next broadcast; checkpoint keeps
      // the plan linear in iters, the CC discipline
      rank = rankRound(e, nodes, rank, qs).localCheckpoint(true)
    }
    rank
  }

  /** One un-materialized round (exposed so PlanSpec can pin the shape —
    * the eager checkpoints erase it from the final query's plan): ranks
    * are node-sized, so they broadcast into the edge scan, and the only
    * shuffle is the (dst, cq) partial-sum aggregation. */
  private[graft] def rankRound(e: DataFrame, nodes: DataFrame,
      rank: DataFrame, qs: Double = QScale): DataFrame = {
    val contrib = e.join(
        broadcast(rank.withColumnRenamed("node", "src")), "src")
      .select(col("dst"),
        floor(col("rank") * col("w") / col("wout") * lit(qs))
          .as("cq"))
    nodes.join(
        broadcast(contrib.groupBy("dst")
          .agg(sum("cq").as("sq"))
          .select(col("dst").as("node"),
            (col("sq").cast("double") / lit(qs)).as("s"))),
        Seq("node"), "left")
      .select(col("node"),
        (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"))
  }

  /** Driver-contract query: PageRank over the BIDIRECTIONAL procurement
    * graph — customer→supplier edges weighted by how many lineitems the
    * customer bought from the supplier, mirrored supplier→customer so the
    * chain is ergodic (the standard bipartite-importance construction).
    * Node ids are 2·custkey / 2·suppkey+1 through the iterations (the
    * two key spaces cannot collide); the display C…/S… names are a final
    * projection. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .join(t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey", "l_suppkey") // integer group keys, THEN ids
      .agg(count(lit(1)).as("w"))
      .select((col("o_custkey") * 2).as("cust"),
        (col("l_suppkey") * 2 + 1).as("supp"), col("w"))
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"),
        col("w"))
      .union(pairs.select(col("supp").as("src"), col("cust").as("dst"),
        col("w")))
    pageRankOf(edges)
      .select(
        when(col("node") % 2 === 0,
            concat(lit("C"), (col("node") / 2).cast("long")))
          .otherwise(concat(lit("S"), ((col("node") - 1) / 2).cast("long")))
          .as("node"),
        round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }
}
