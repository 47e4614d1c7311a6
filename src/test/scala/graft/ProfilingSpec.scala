package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

/** Skew-report and column-profile semantics on hand fixtures. */
class ProfilingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("skewReportOf: hot key dominates max_freq/top_share, uniform tail sets p50") {
    val s = spark; import s.implicits._
    // one key with 50 rows, 50 singleton keys → 100 rows, 51 keys
    val df = (Seq.fill(50)("hot") ++ (1 to 50).map(i => s"k$i")).toDF("k")
    val got = Profiling.skewReportOf(Seq(("t", df, "k"))).collect().head
    assert(got.getString(0) == "t.k")
    assert(got.getLong(1) == 100L) // n_rows
    assert(got.getLong(2) == 51L) // n_keys
    assert(got.getLong(3) == 50L) // max_freq
    assert(got.getDouble(4) == 1.0) // p50 of freq: 50 ones and one 50
    assert(got.getDouble(6) == 0.5) // top_share
  }

  test("columnProfileOf: nulls counted, distinct excludes null duplicates, min/max double") {
    val s = spark; import s.implicits._
    val df = Seq(Some(1.0), None, Some(2.0), Some(2.0), None)
      .toDF("x")
    val got = Profiling.columnProfileOf(df, Seq("x")).collect().head
    assert(got.getString(0) == "x")
    assert(got.getLong(1) == 5L) // n_rows
    assert(got.getLong(2) == 2L) // n_nulls
    assert(got.getLong(3) == 2L) // n_distinct (1.0, 2.0)
    assert(got.getDouble(4) == 1.0 && got.getDouble(5) == 2.0)
  }

  test("profile plan: each per-column scan reads only that column") {
    val p = Profiling.columnProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    // no scan may read the full lineitem width; ReadSchema carries ≤ 1 col
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.forall(r => !r.contains(",")), reads)
  }
}
