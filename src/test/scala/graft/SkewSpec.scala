package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of fact rows share key 1 (hot key)
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 1 else i % 7 + 2, i.toLong)).toDF("k", "v")
    val dim = (1 to 10).map(i => (i, s"d$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("two-phase distinct count equals countDistinct") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 3, i % 37)).toDF("k", "v")
    val expected = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Skew.distinctCountSalted(df, "k", "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("salted sum equals plain sum under skew") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else "cold", i.toLong))
      .toDF("k", "v")
    val expected = df.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Skew.saltedSum(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
