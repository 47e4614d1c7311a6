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
  * state, each round is ONE equi-join (ranks ⋈ edges on src) plus ONE
  * aggregation (by dst), all-equi shuffles, rank state is node-sized.
  * Rounds are UNROLLED (fixed iteration count), the
  * [[graft.llm.Similarity.ivfTrain]] pattern, so the oracle replays the
  * whole trajectory as CTEs.
  *
  * Determinism: the per-node Σ of in-neighbor contributions is a double
  * sum, so it is replayed as an ORDERED fold over in-neighbors (sorted
  * by source node) — identical op sequence on both engines, the
  * `pcaPower` discipline. The fold list is bounded by a node's IN-DEGREE;
  * on power-law graphs where a celebrity node's list would not fit,
  * swap the fold for a plain `sum` and drop the bit-exact oracle to a
  * tolerance check — the contract traded is determinism, not correctness.
  *
  * Each directed edge (src, dst, w) contributes
  * rank(src)·w / wout(src); rank' = 0.15 + 0.85·Σ contributions (the
  * per-node-offset formulation — no global normalization pass, so no
  * extra corpus-wide aggregate per round). Nodes with no out-edges would
  * leak mass; callers supply a graph without sinks (the procurement
  * graph below is bidirectional, hence ergodic).
  */
object PageRank {

  /** Iterate `iters` rounds over `edges` (src, dst, w: long). Returns
    * (node, rank) for every node with at least one in- or out-edge. */
  def pageRankOf(edges: DataFrame, iters: Int = 3): DataFrame = {
    val spark = edges.sparkSession
    // out-weight per src — exact integers in doubles, bit-stable
    val wout = edges.groupBy("src").agg(sum("w").cast("double").as("wout"))
    val e = edges.join(wout, "src")
      .select(col("src"), col("dst"), col("w").cast("double").as("w"),
        col("wout"))
      .localCheckpoint(true) // reused every round; lineage must not stack
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var rank = nodes.withColumn("rank", lit(1.0))
    (1 to iters).foreach { _ =>
      val contrib = e.join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          col("src"), (col("rank") * col("w") / col("wout")).as("c"))
      rank = nodes.join(
          contrib.groupBy("dst")
            .agg(collect_list(struct(col("src"), col("c"))).as("cs"))
            .select(col("dst").as("node"),
              aggregate(array_sort(col("cs")), lit(0.0),
                (acc, x) => acc + x.getField("c")).as("s")),
          Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"))
        // each round's rank is read twice next round (join + the fold);
        // checkpoint keeps the plan linear in iters, the CC discipline
        .localCheckpoint(true)
    }
    rank
  }

  /** Driver-contract query: PageRank over the BIDIRECTIONAL procurement
    * graph — customer→supplier edges weighted by how many lineitems the
    * customer bought from the supplier, mirrored supplier→customer so the
    * chain is ergodic (the standard bipartite-importance construction).
    * Node ids are prefixed C/S so the two key spaces cannot collide. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .join(t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(
        concat(lit("C"), col("o_custkey")).as("cust"),
        concat(lit("S"), col("l_suppkey")).as("supp"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"),
        col("w"))
      .union(pairs.select(col("supp").as("src"), col("cust").as("dst"),
        col("w")))
    pageRankOf(edges)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }
}
