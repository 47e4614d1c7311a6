package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Join surface (SURVEY §2.3). The reference's "joins" are per-record
  * external-store lookups (J1 `get_entity_job.py:41-43`, J2 `elastic.py:43-51`);
  * here each becomes a real relational join so Catalyst picks broadcast vs
  * shuffle and AQE handles skew at scale.
  */
object Joins {

  /** J1/J2: stream-to-dim enrichment as broadcast hash join. `customer` is a
    * dimension — explicitly broadcast so the 100 TB fact side never shuffles. */
  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val c = t(spark, dir, "customer")
    e.join(broadcast(c), e("user_id") === c("c_custkey"), "inner")
      .select("event_id", "user_id", "c_name", "c_mktsegment", "value")
      .orderBy("event_id")
  }

  /** Left outer with a pushed-down predicate on the build side. */
  def joinLeft(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer").filter(col("c_acctbal") > 5000)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_outer")
      .select("o_orderkey", "o_custkey", "c_name", "c_acctbal")
      .orderBy("o_orderkey")
  }

  /** Left semi (EXISTS): S7's "docs for a guid list" shape. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 100000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left anti (NOT EXISTS): G20 document-delete shape
    * (`synchronize_app_search.py:200-202`). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Multi-way star join (TPC-H Q5 shape): fact `lineitem` joins dim chain
    * customer→orders and supplier→nation→region. Dims broadcast; the only
    * shuffle at scale is lineitem⋈orders on orderkey (AQE-coalesced). */
  def joinMulti(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Theta/range join (declared in SURVEY §2.3 as absent-in-reference but
    * part of our general surface): equi key + range predicate on quantity. */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val li = t(spark, dir, "lineitem")
    li.join(broadcast(p),
        li("l_partkey") === p("p_partkey") &&
          li("l_quantity") >= p("p_size") - 5 &&
          li("l_quantity") <= p("p_size") + 5)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy("p_brand")
  }

  /** Full outer join on key sets (general surface). */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val s = t(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nk"), "full_outer")
      .select(col("nk"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nk")
  }
}
