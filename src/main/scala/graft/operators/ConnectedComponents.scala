package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering step
  * a dedup pipeline needs AFTER pair generation. Near-dup PAIRS (MinHash/LSH,
  * ANN, n-gram Jaccard) only say "these two match"; dedup keeps one survivor
  * PER CLUSTER, and a cluster is the transitive closure of the pair relation
  * (a~b, b~c ⇒ {a,b,c} keep one).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — converges in
  * O(log² n) rounds, each round a constant number of equi-shuffles
  * (groupBy-min + re-emit) over a shrinking edge set, with no driver-side
  * state beyond the convergence flag. This is the algorithm production graph
  * libraries use at billion-edge scale; plain min-label propagation needs
  * O(diameter) rounds, which an adversarial duplicate CHAIN (a→b→c→…, the
  * shape crawl dedup actually produces for boilerplate drift) makes linear.
  *
  * Invariant: edges are kept canonical as (u, v) with u > v. At convergence
  * every component is a star centered on its minimum id, so the edge set IS
  * the (member, componentMin) mapping.
  */
object ConnectedComponents {

  /** One large-star round: every node u connects its strictly-larger
    * neighbors to m = min(Γ(u) ∪ {u}). Preserves connectivity; strictly
    * reduces the potential Σ height (paper, Lemma 1). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionAll(edges.select(col("v").as("a"), col("u").as("b")))
    val mins = sym.groupBy("a").agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    sym.join(mins, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round: every node u connects its smaller neighbors and
    * itself to m = min of that set. Operates on the canonical orientation
    * directly (all stored neighbors v of u satisfy v < u). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min(col("v")).as("m"))
    edges.join(mins, "u")
      .select(col("v").as("a"), col("m"))
      .filter(col("a") =!= col("m"))
      .unionAll(mins.select(col("u").as("a"), col("m")))
      .select(col("a").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Component mapping for every node that appears in `edges0` (columns
    * `u`, `v`, one orderable type): returns (id, component) rows for ALL
    * such nodes, component = minimum id reachable. Self-loops are dropped;
    * nodes not present in any edge are the caller's to default (they are
    * their own singleton component).
    *
    * Each iteration materializes the edge set (localCheckpoint) so round i
    * never re-derives rounds 1..i-1. Convergence = the edge set is a star
    * forest, checked directly: no node appears both as a member (`u`) and
    * as a center (`v`). All edges keep u > v, so a star's center is its
    * component minimum (the min node can never be a member — its edge
    * would need a smaller center from the same component). One semi-join
    * probe per round, and it detects the fixpoint on the round that
    * REACHES it — an exact set comparison needs one more round just to
    * observe no-change. */
  def components(edges0: DataFrame, maxIter: Int = 64): DataFrame =
    componentsWithRounds(edges0, maxIter)._1

  /** [[components]] plus the number of large+small-star rounds it took —
    * lets tests pin the O(log² n) convergence bound that makes this viable
    * at 100 TB (a regression to O(diameter) behavior would show up as a
    * round-count explosion long before a wall-clock one). */
  def componentsWithRounds(edges0: DataFrame, maxIter: Int = 64)
      : (DataFrame, Int) = {
    // a star forest needs BOTH: every member points to exactly one center
    // (edges are distinct, so count == distinct centers), AND no node is
    // both member and center (no chaining). Disjointness alone is NOT
    // enough: {(16,3),(16,6)} has disjoint u/v sets but components 3 and
    // 6 are unmerged — stopping there returns wrong clusters.
    def isStarForest(e: DataFrame): Boolean =
      e.groupBy("u").agg(count(lit(1)).as("nc"))
        .filter(col("nc") > 1).isEmpty &&
      e.select("u").join(e.select(col("v").as("u")), Seq("u"), "left_semi")
        .isEmpty
    var (edges, n) = graft.Materialize.checkpointCounted(
      edges0.select(
          greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    var converged = n == 0 || isStarForest(edges)
    var it = 0
    while (!converged && it < maxIter) {
      val (next, _) = graft.Materialize.checkpointCounted(
        smallStar(largeStar(edges)))
      converged = isStarForest(next)
      edges = next
      it += 1
    }
    if (!converged)
      sys.error(s"connected components did not converge in $maxIter rounds")
    // star forest: (member, center); centers map to themselves
    (edges.select(col("u").as("id"), col("v").as("component"))
      .unionByName(
        edges.select(col("v").as("id"), col("v").as("component")).distinct()),
      it)
  }
}
