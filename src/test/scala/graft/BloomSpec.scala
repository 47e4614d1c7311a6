package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Bloom, GraftBloom}

/** Bloom-filter contracts (exact verdicts are oracle-pinned by
  * q_bloom_filter). */
class BloomSpec extends AnyFunSuite {
  import SparkTestSession._

  test("byte-level h60 positions equal the relational md5 formulation") {
    val s = spark; import s.implicits._
    val vals = Seq("a", "key-17", "", "Ünïcode ✓", "4711")
    val relational = vals.toDF("v")
      .select(col("v"), graft.llm.Dedup.h60(concat(col("v"), lit("#"),
        lit("2"))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      val bytes = (v + "#2").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(GraftBloom.h60(bytes) == relational(v), s"h60 diverges on '$v'")
    }
  }

  test("no false negatives ever; false positives appear when m is tight") {
    val s = spark; import s.implicits._
    val keys = (1 to 50).map(i => s"k$i").toDF("k")
    val bits = Bloom.buildBits(keys, "k", nh = 2, m = 256)
    val probes = (1 to 2000).map(i => s"k$i").toDF("v")
      .withColumn("might", Bloom.mightContain(col("v"), bits, nh = 2, m = 256))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (1 to 50).foreach(i => assert(probes(s"k$i"), s"false negative on k$i"))
    val fps = (51 to 2000).count(i => probes(s"k$i"))
    assert(fps > 0, "tight fixture produced no false positives — vacuous")
    // fill ~ 100/256 bits, expected fpr ~ (fill)^2 ~ 15%; 30% is 2x slack
    assert(fps < 0.30 * 1950, s"$fps false positives of 1950 — filter broken")
  }

  test("null keys stay null through the verdict") {
    val s = spark; import s.implicits._
    val bits = Bloom.buildBits(Seq("x").toDF("k"), "k")
    val out = Seq(Some("x"), None).toDF("v")
      .select(Bloom.mightContain(col("v"), bits).as("might")).collect()
    assert(out(0).getBoolean(0))
    assert(out(1).isNullAt(0))
  }

  test("bloomSemiJoin equals the plain semi-join, prefilter in the plan") {
    val s = spark; import s.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val keys = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val composed = Bloom.bloomSemiJoin(orders, "o_custkey", keys, "c_custkey")
    val plain = orders.join(
      keys.select(col("c_custkey").as("o_custkey")).distinct(),
      Seq("o_custkey"), "left_semi")
    assert(composed.count() == plain.count())
    assert(composed.select("o_orderkey").except(plain.select("o_orderkey")).isEmpty)
    // the bloom probe sits in the scan-side filter, before any join
    val plan = composed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
  }
}
