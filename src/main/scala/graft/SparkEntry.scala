package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator family from SURVEY §2.6; each has a
  * DuckDB-equivalent `oracleSql` unless the op is not SQL-expressible.
  * Column names are aligned on both sides (the driver sorts columns by name
  * and hashes values). All aggregated doubles route through low-scale
  * decimals (see [[Tables.dsum]]) so both engines produce bit-identical
  * doubles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.joinMulti(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map[String, Q](
    // family 1: scan / filter / project
    "q_filter_project" -> (Relational.filterProject _),
    "q_project_expr" -> (Relational.projectExpr _),
    // family 9: aggregates / grouping sets / sort-limit / set ops
    "q1_agg" -> (Relational.q1Agg _),
    "q_agg_having" -> (Relational.aggHaving _),
    "q_count_distinct" -> (Relational.countDistinct_ _),
    "q_rollup" -> (Relational.rollupAgg _),
    "q_cube" -> (Relational.cubeAgg _),
    "q_topk" -> (Relational.topK _),
    "q_set_intersect" -> (Relational.setIntersect _),
    "q_set_except" -> (Relational.setExcept _),
    "q_set_union" -> (Relational.setUnion _),
    // family 2: enrichment joins
    "q_join_inner" -> (Joins.joinInner _),
    "q_join_left" -> (Joins.joinLeft _),
    "q_join_semi" -> (Joins.joinSemi _),
    "q_join_anti" -> (Joins.joinAnti _),
    "q_join_multi" -> (Joins.joinMulti _),
    "q_join_range" -> (Joins.joinRange _),
    "q_join_full_outer" -> (Joins.joinFullOuter _),
    // families 3 + 5: as-of / last-wins / analytic windows
    "q_asof_lag" -> (Windows.asofLag _),
    "q_latest_per_key" -> (Windows.latestPerKey _),
    "q_top1_per_key" -> (Windows.top1PerKey _),
    "q_window_rank" -> (Windows.windowRank _),
    "q_window_running" -> (Windows.windowRunning _),
  )

  // DuckDB oracle equivalents. DECIMAL(12,4) round-trips keep double
  // aggregates bit-identical between engines (exact decimal math on both
  // sides, one final cast to double).
  private val D = "DECIMAL(14,2)"
  private val R = "DECIMAL(4,2)"
  private def dsum(c: String) = s"CAST(SUM(CAST($c AS $D)) AS DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag IN ('A','R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_project_expr" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  concat_ws('_', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR)) AS line_id,
         |  CAST(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $R)) AS DOUBLE) AS revenue
         |FROM lineitem WHERE l_returnflag = 'N'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $R))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $R)) * (1 + CAST(l_tax AS $R))) AS DOUBLE) AS sum_charge,
         |  ${dsum("l_quantity")} / COUNT(*) AS avg_qty,
         |  ${dsum("l_extendedprice")} / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${dsum("o_totalprice")} AS total_spent
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
         |ORDER BY o_custkey""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsum("l_quantity")} AS qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${dsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
        |ORDER BY custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q_set_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_join_inner" ->
      """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_join_left" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_acctbal
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_multi" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $R))) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_range" ->
      s"""SELECT p_brand, COUNT(*) AS n, ${dsum("l_quantity")} AS qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_full_outer" ->
      """SELECT nk, COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |USING (nk)
        |ORDER BY nk""".stripMargin,
    "q_asof_lag" ->
      s"""SELECT event_id, user_id, value, prev_value,
         |  CAST(CAST(value AS $D) - CAST(prev_value AS $D) AS DOUBLE) AS delta
         |FROM (SELECT event_id, user_id, value,
         |        lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
         |      FROM events)
         |ORDER BY user_id, event_id""".stripMargin,
    "q_latest_per_key" ->
      """SELECT user_id, event_id AS last_event_id, value AS last_value, n_events
        |FROM (SELECT user_id, event_id, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |        COUNT(*) OVER (PARTITION BY user_id) AS n_events
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_top1_per_key" ->
      """SELECT user_id, event_id, value
        |FROM (SELECT user_id, event_id, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_running" ->
      s"""SELECT user_id, event_id, value,
         |  CAST(SUM(CAST(value AS $D)) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         |FROM events ORDER BY user_id, event_id""".stripMargin,
  )
}
