package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (dev tool; body rotates to
  * whatever is under investigation). Current body (round 9): the third
  * 10× stress battery's non-oracle members — k-core decomposition
  * (spec-only, so it never appears in Bench) and the cold-vs-warm
  * ArtifactCache split of the co-purchase pair artifact (Bench's
  * per-query minima can't separate the publish pass from the serve
  * pass; this times them explicitly). */
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
    // the same env var Bench reads, stress dir from its own override
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stressDir = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR",
      "/root/repo/stress/sf1")
    time("warm base lineitem") {
      graft.Tables.t(spark, sfDir, "lineitem").count()
    }
    time("warm 10x lineitem") {
      graft.Tables.t(spark, stressDir, "lineitem").count()
    }
    // ArtifactCache: first touch of a dir publishes (compute + parquet
    // write), second serves from the parquet copy
    for (d <- Seq(sfDir -> "base", stressDir -> "10x")) {
      time(s"copurchase cold ${d._2}") {
        graft.operators.Graphs.copurchasePairs(spark, d._1).count()
      }
      time(s"copurchase warm ${d._2}") {
        graft.operators.Graphs.copurchasePairs(spark, d._1).count()
      }
    }
    // k-core over the (now warm) co-purchase edges, two reps each
    for (p <- 1 to 2) {
      time(s"kCore(3) base $p") {
        graft.operators.Graphs.kCoreOf(
          graft.operators.Graphs.copurchaseEdges(spark, sfDir), 3).count()
      }
      time(s"kCore(3) 10x $p") {
        graft.operators.Graphs.kCoreOf(
          graft.operators.Graphs.copurchaseEdges(spark, stressDir), 3).count()
      }
    }
    spark.stop()
  }
}
