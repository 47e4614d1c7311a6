package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ad-hoc stage profiler for slow queries (dev tool; body rotates to
  * whatever is under investigation). Current body: ER clustering under
  * 10× entity-catalog growth (stress/sf1/part10 from StressGen). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // data layout overridable per checkout (ADVICE r7): base dir from
    // the same env var Bench reads, stress path from its own override
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stressPath = sys.env.getOrElse("SPARK_GRAFT_STRESS_PATH",
      "/root/repo/stress/sf1/part10.parquet")
    val base = t(spark, sfDir, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("nm"),
        col("p_size"))
    val stress = spark.read
      .parquet(stressPath)
      .select(col("p_partkey").as("id"), col("p_name").as("nm"),
        col("p_size"))
    time("warm base") { base.count() }
    time("warm 10x") { stress.count() }
    for (p <- 1 to 2) {
      time(s"erClusters base $p") {
        graft.operators.FuzzyJoin.erClustersOf(base).count()
      }
      time(s"erClusters 10x $p") {
        graft.operators.FuzzyJoin.erClustersOf(stress).count()
      }
    }
    spark.stop()
  }
}
