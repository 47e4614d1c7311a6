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

  /** Verified match pairs (id < other) within blocks. */
  private def matchPairs(p: DataFrame,
      maxDist: Int, maxSizeDiff: Int): DataFrame =
    p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(col("a.p_size") - col("b.p_size")) <= maxSizeDiff)
      .filter(levenshtein(col("a.nm"), col("b.nm")) <= maxDist)
      .select(col("a.id").as("id"), col("b.id").as("other"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))

  /** Per-record fuzzy-match summary over (id, nm, p_size) records:
    * (p_partkey, nm, n_match, best_id, best_dist); unmatched records
    * carry (0, -1, -1). */
  def fuzzyResolveOf(parts: DataFrame,
      maxDist: Int = 2, maxSizeDiff: Int = 3): DataFrame = {
    val p = blocked(parts)
    val pairs = matchPairs(p, maxDist, maxSizeDiff)
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
    val pairs = matchPairs(p, maxDist, maxSizeDiff)
      .select(col("id").as("u"), col("other").as("v"))
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
