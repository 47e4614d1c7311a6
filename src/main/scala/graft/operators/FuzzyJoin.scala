package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Blocked fuzzy entity resolution — the classic blocking + verify
  * shape (Christen 2012's survey; the same pattern the reference's
  * entity pipeline would need to merge near-identical glossary entries,
  * and a staple of training-data curation for merging near-identical
  * titles/records before dedup).
  *
  * Candidate generation NEVER compares all pairs: records are blocked
  * on a cheap deterministic key (here: the name's head noun + a size
  * band), and the quadratic verify step runs only WITHIN a block. The
  * within-block self-join is an equi-join on the block key, so it
  * shuffles hash-partitioned and AQE's skew split handles a hot block;
  * `levenshtein` is Spark's codegen'd built-in (integer result —
  * engine-portable, no float drift). Banding trades recall at the band
  * boundary for a hard bound on candidate pairs — the standard blocking
  * tradeoff, documented rather than hidden.
  *
  * Output is the per-record resolution summary (match count + best
  * match), not the raw pair list: the pair list is O(block²) rows and
  * exists only inside the shuffle, which is what keeps the result (and
  * any downstream sink) record-sized at 100 TB. Tie-break for "best" is
  * (distance, id) lexicographic, encoded as one bigint min — an
  * order-free aggregate, identical in any engine.
  */
object FuzzyJoin {

  /** Blocked records: (id, nm, p_size, blk) with blk = head noun +
    * size band — the ONE definition of the blocking key, shared by the
    * per-record summary and the ER clustering so the two cannot
    * disagree on candidate generation. */
  private def blocked(parts: DataFrame): DataFrame = parts.select(
    col("id"), col("nm"), col("p_size"),
    concat(regexp_extract(col("nm"), "(\\S+)$", 1), lit("#"),
      expr("CAST(floor(p_size / 8.0) AS INT)")).as("blk"))

  /** Equivalence classes of identical (nm, p_size) records, keyed with
    * their block: levenshtein(x, y) depends only on the NAMES, so the
    * verify step need run once per distinct class pair, not per record
    * pair — on a template-heavy corpus (sf0.1: 64 distinct names over
    * 20 k parts) that is the difference between ~10³ and ~10⁷ distance
    * calls. The exact-dup-collapse-before-fuzzy-match move every real
    * ER pipeline makes. cid = the class's min record id (its
    * representative), csize = member count. */
  private def classes(p: DataFrame): DataFrame =
    p.groupBy("blk", "nm", "p_size")
      .agg(min("id").as("cid"), count(lit(1)).as("csize"))

  /** Matched class pairs (unordered; a class pairs with ITSELF when it
    * has ≥ 2 members — identical records are distance-0 matches). The
    * levenshtein bound sits LAST in the join condition: conjuncts
    * evaluate in order inside the codegen'd join, so the cheap guards
    * short-circuit first (a separate `.filter` got its conjunct merged
    * in FRONT of them — measured 2.6× slower before the class
    * collapse). */
  private def classPairs(cls: DataFrame,
      maxDist: Int, maxSizeDiff: Int): DataFrame =
    cls.as("a").join(cls.as("b"),
        col("a.blk") === col("b.blk") && col("a.cid") <= col("b.cid") &&
          abs(col("a.p_size") - col("b.p_size")) <= maxSizeDiff &&
          levenshtein(col("a.nm"), col("b.nm")) <= maxDist)
      .filter(col("a.cid") < col("b.cid") || col("a.csize") >= 2)
      .select(col("a.blk").as("blk"),
        col("a.nm").as("nm_a"), col("a.p_size").as("ps_a"),
        col("a.cid").as("cid_a"),
        col("b.nm").as("nm_b"), col("b.p_size").as("ps_b"),
        col("b.cid").as("cid_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))

  /** Verified match pairs (id < other): [[classPairs]] expanded back to
    * record pairs through two hash joins on the class key — no distance
    * call ever touches a record pair. A self-pair (A, A) expands to
    * A's within-class pairs via id_a < id_b; a cross-pair (A, B)
    * expands to the full member cross product, orientation fixed by
    * least/greatest. */
  private def matchPairs(p: DataFrame,
      maxDist: Int, maxSizeDiff: Int): DataFrame = {
    val cp = classPairs(classes(p), maxDist, maxSizeDiff)
    val ma = p.select(col("blk"), col("nm").as("nm_a"),
      col("p_size").as("ps_a"), col("id").as("id_a"))
    val mb = p.select(col("blk"), col("nm").as("nm_b"),
      col("p_size").as("ps_b"), col("id").as("id_b"))
    cp.join(ma, Seq("blk", "nm_a", "ps_a"))
      .join(mb, Seq("blk", "nm_b", "ps_b"))
      .filter(col("cid_a") =!= col("cid_b") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id"),
        greatest(col("id_a"), col("id_b")).as("other"), col("dist"))
  }

  /** Per-record fuzzy-match summary over (id, nm, p_size) records:
    * (p_partkey, nm, n_match, best_id, best_dist); unmatched records
    * carry (0, -1, -1). */
  def fuzzyResolveOf(parts: DataFrame,
      maxDist: Int = 2, maxSizeDiff: Int = 3): DataFrame = {
    val p = blocked(parts)
    // the verify join is the expensive stage and BOTH union sides read
    // it — materialize once
    val pairs = matchPairs(p, maxDist, maxSizeDiff).localCheckpoint(true)
    // each surviving pair resolves BOTH records
    val sided = pairs.union(
      pairs.select(col("other").as("id"), col("id").as("other"),
        col("dist")))
    val summary = sided.groupBy("id").agg(
      count(lit(1)).as("n_match"),
      min(col("dist") * lit(1000000000L) + col("other")).as("bk"))
    p.select(col("id").as("p_partkey"), col("nm"))
      .join(summary.select(col("id").as("p_partkey"), col("n_match"),
        (col("bk") % 1000000000L).as("best_id"),
        expr("bk div 1000000000").as("best_dist")),
        Seq("p_partkey"), "left")
      .select(col("p_partkey"), col("nm"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        coalesce(col("best_id"), lit(-1L)).as("best_id"),
        coalesce(col("best_dist"), lit(-1L)).as("best_dist"))
      .orderBy("p_partkey")
  }

  def fuzzyResolve(spark: SparkSession, dir: String,
      maxDist: Int = 2, maxSizeDiff: Int = 3): DataFrame =
    fuzzyResolveOf(
      t(spark, dir, "part").select(col("p_partkey").as("id"),
        col("p_name").as("nm"), col("p_size")),
      maxDist, maxSizeDiff)

  /** Entity-resolution clusters: the transitive closure of the fuzzy
    * match relation — if A≈B and B≈C, all three are one entity even
    * when A and C miss each other's edit bound (the record-linkage
    * standard; Christen 2012 §6). Pairs come from the SAME blocked
    * [[matchPairs]] as the summary; the closure is
    * [[ConnectedComponents.components]] unchanged (alternating-star,
    * O(log² n) rounds), so every scale property proven for near-dup
    * clustering carries over. Per record: its cluster id (= cluster
    * min id), the cluster size, and whether it is the canonical
    * representative. */
  def erClustersOf(parts: DataFrame,
      maxDist: Int = 2, maxSizeDiff: Int = 3): DataFrame = {
    val p = blocked(parts)
    // CC never needs the EXPANDED pair relation: a class's members form
    // a clique, and a clique's connectivity is its star around the
    // representative — so the edge set is member→cid stars plus one
    // edge per matched class pair (~n + |class pairs| edges instead of
    // the record-pair relation, 587 k → 20 k at sf0.1). The component
    // minimum is unchanged: representatives ARE record ids and every
    // member is present. Materialized before iterating — CC's first
    // round reads the edge set more than once.
    val cls = classes(p).localCheckpoint(true)
    val memberEdges = p
      .join(cls.select(col("blk"), col("nm"), col("p_size"), col("cid")),
        Seq("blk", "nm", "p_size"))
      .filter(col("id") =!= col("cid"))
      .select(col("id").as("u"), col("cid").as("v"))
    val classEdges = classPairs(cls, maxDist, maxSizeDiff)
      .filter(col("cid_a") =!= col("cid_b"))
      .select(col("cid_a").as("u"), col("cid_b").as("v"))
    val pairs = memberEdges.union(classEdges).localCheckpoint(true)
    val cc = ConnectedComponents.components(pairs)
      .withColumnRenamed("id", "rid")
    val cid = p.select(col("id"))
      .join(cc, col("id") === col("rid"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("cluster_id"))
    val sizes = cid.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    cid.join(sizes, "cluster_id")
      .select(col("id").as("p_partkey"), col("cluster_id"),
        col("n_members"), (col("id") === col("cluster_id")).as("is_canonical"))
      .orderBy("p_partkey")
  }

  def erClusters(spark: SparkSession, dir: String): DataFrame =
    erClustersOf(t(spark, dir, "part").select(col("p_partkey").as("id"),
      col("p_name").as("nm"), col("p_size")))
}
