package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler for the connected-components loop (dev tool). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions.col
    val pairs = time("minhash pairs") {
      graft.llm.Dedup.minhashLshOf(
        graft.Tables.t(spark, dir, "documents"))
        .select(col("id_a").as("u"), col("id_b").as("v"))
        .localCheckpoint(true)
    }
    println(s"pairs=${pairs.count()}")
    for (i <- 1 to 3) {
      val (comp, rounds) = time(s"components run $i") {
        graft.operators.ConnectedComponents.componentsWithRounds(pairs)
      }
      println(s"rounds=$rounds comps=${comp.count()}")
    }
    spark.stop()
  }
}
