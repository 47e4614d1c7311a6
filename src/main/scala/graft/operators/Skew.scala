package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation operators (the "Optimize for scale" checklist): salting
  * for hot keys where AQE's skew-join split isn't available (e.g. aggregations
  * over a dominant key, or pre-AQE shuffle plans).
  *
  * The reference never faces this (parallelism=1), but a metadata stream is
  * exactly where one guid (a hot entity type, a root domain) dominates.
  */
object Skew {

  /** Salted equi-join: the probe side scatters each row to one of `nSalts`
    * sub-keys; the build side replicates every row to ALL salts. The hot key
    * then occupies `nSalts` tasks instead of one. Equivalent to the plain
    * join only for fact-preserving join types — a dim-preserving outer join
    * would emit each unmatched dim row once per salt replica. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti").contains(joinType.toLowerCase),
      s"saltedJoin: dim side is replicated per salt — joinType $joinType " +
        "would duplicate unmatched dim rows")
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(nSalts)))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase (salted) distinct count per key: phase 1 dedupes on
    * (key, value) — the shuffle that would hotspot carries pre-deduped
    * partials; phase 2 counts per key. Equivalent to
    * countDistinct(value) per key. */
  def distinctCountSalted(df: DataFrame, key: String, value: String)
      : DataFrame =
    df.select(key, value)
      .filter(col(value).isNotNull) // countDistinct ignores NULLs; match it
      .distinct()
      .groupBy(key)
      .agg(count(lit(1)).as(s"n_distinct_$value"))

  /** Two-phase skewed aggregation: partial aggregate on (key, salt), final
    * on key. For algebraic aggregates Spark's own partial aggregation
    * already does this per partition; the explicit form helps when a single
    * post-shuffle key still overwhelms one reducer (extreme skew). */
  def saltedSum(df: DataFrame, key: String, value: String,
      nSalts: Int = 8): DataFrame =
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$value"))
}
