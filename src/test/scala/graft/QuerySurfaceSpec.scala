package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Smoke + invariants over the whole declared query surface. */
class QuerySurfaceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every query has an oracle — zero rows-only queries") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q_pipeline_e2e gained a full SQL reconstruction oracle in round 3
    // (the synthetic stream is deterministic arithmetic over events)
    assert(noOracle.isEmpty, s"queries missing oracle: $noOracle")
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }

  test("all queries run on sf0.001 and return a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("harness contract: no oracle query emits array/map/struct columns") {
    // The driver's DuckDB compare hashes scalar cells via a pandas
    // sort_values; a bare ARRAY/MAP/STRUCT column crashes it
    // ("unhashable type: numpy.ndarray" — the r7 q_inverted_index red
    // row). Complex outputs must serialize to '|'-joined canonical
    // strings (the q_array_agg discipline). This spec makes that
    // contract enforceable instead of conventional.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"oracle-checked queries with complex-typed columns: $offenders")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg groups are the returnflag/linestatus combos") {
    val rows = SparkEntry.queries("q1_agg")(spark, sfDir).collect()
    assert(rows.length >= 3)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("A", "N", "R")))
  }

  test("latest_per_key agrees with top1_per_key") {
    val a = SparkEntry.queries("q_latest_per_key")(spark, sfDir)
      .select("user_id", "last_event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = SparkEntry.queries("q_top1_per_key")(spark, sfDir)
      .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toMap == b.toMap)
  }
}
