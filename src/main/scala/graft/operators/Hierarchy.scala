package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Hierarchy / breadcrumb algebra (SURVEY §2.5 G1/G8, §2.6 family 7).
  *
  * The reference maintains materialized ancestor paths ("breadcrumbs") on
  * every document (`synchronize_app_search.py:467-482`) and walks supertype
  * DAGs recursively per record (`:27-48`). Spark has no recursive CTE, so the
  * engine computes the closure as a driver-side iterative join fixpoint —
  * bounded by tree depth (≤3 in the reference's HierarchyMapping), each
  * iteration one broadcast-able join over the edge dimension. Hierarchy
  * dimensions stay small even at 100 TB fact scale, so the loop never touches
  * the fact tables.
  */
object Hierarchy {

  /** Iterative breadcrumb fixpoint over an edge table (child `id`, `parent`).
    * Returns (id, breadcrumb: ARRAY<STRING> root-first ancestor ids, depth).
    * Roots are nodes never appearing as a child. */
  def breadcrumbs(edges: DataFrame, maxDepth: Int = 10): DataFrame = {
    // hierarchy edges are a dimension: cache them, and materialize each
    // frontier (localCheckpoint) so iteration i doesn't recompute 1..i-1
    // and the emptiness probe is O(frontier)
    val e = edges.cache()
    val roots = e.select(col("parent").as("id")).distinct()
      .join(e.select(col("id")).distinct(), Seq("id"), "left_anti")
      .withColumn("breadcrumb", array().cast("array<string>"))
      .localCheckpoint(true)
    var done = roots
    var frontier = roots
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      // children of the current frontier inherit path ++ [parent]  (G8)
      frontier = e.as("ed")
        .join(frontier.as("p"), col("ed.parent") === col("p.id"))
        .select(col("ed.id").as("id"),
          concat(col("p.breadcrumb"), array(col("p.id"))).as("breadcrumb"))
        .localCheckpoint(true)
      if (!frontier.isEmpty) done = done.unionByName(frontier)
      depth += 1
    }
    if (depth == maxDepth && !frontier.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"breadcrumb fixpoint hit the depth cap ($maxDepth) with a " +
          "non-empty frontier — deeper nodes are omitted")
    e.unpersist()
    done.withColumn("depth", size(col("breadcrumb")))
  }

  /** Q-hierarchy: 3-level tree region→nation→customer, breadcrumbs for every
    * node. Oracle = DuckDB WITH RECURSIVE. */
  def treeBreadcrumbs(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val customer = t(spark, dir, "customer")
    val edges = nation.select(
        concat(lit("N"), col("n_nationkey").cast("string")).as("id"),
        concat(lit("R"), col("n_regionkey").cast("string")).as("parent"))
      .unionByName(customer.select(
        concat(lit("C"), col("c_custkey").cast("string")).as("id"),
        concat(lit("N"), col("c_nationkey").cast("string")).as("parent")))
    breadcrumbs(edges)
      .select(col("id").as("node_id"),
        array_join(col("breadcrumb"), "|").as("breadcrumb"), col("depth"))
      .orderBy("node_id")
  }

  /** G8 single-step breadcrumb derivation via parent join (J6): customer
    * inherits [region, nation] name path. */
  def breadcrumbNames(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("c_custkey"),
        concat(lit("N"), col("n_nationkey").cast("string")).as("parent_id"),
        array_join(array(col("r_name"), col("n_name")), "|")
          .as("breadcrumb_names"))
      .orderBy("c_custkey")
  }
}
