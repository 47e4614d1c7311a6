package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ad-hoc stage profiler for slow queries (dev tool; body rotates to
  * whatever is under investigation). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val parts = t(spark, dir, "part").select(col("p_partkey").as("id"),
      col("p_name").as("nm"), col("p_size"))
    time("parts warm") { parts.count() }
    val blocked = parts.select(col("id"), col("nm"), col("p_size"),
      concat(regexp_extract(col("nm"), "(\\S+)$", 1), lit("#"),
        expr("CAST(floor(p_size / 8.0) AS INT)")).as("blk"))
    val pairsFilter = blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(col("a.p_size") - col("b.p_size")) <= 3)
      .filter(levenshtein(col("a.nm"), col("b.nm")) <= 2)
      .select(col("a.id").as("u"), col("b.id").as("v"))
    val pairsJoinCond = blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(col("a.p_size") - col("b.p_size")) <= 3 &&
          levenshtein(col("a.nm"), col("b.nm")) <= 2)
      .select(col("a.id").as("u"), col("b.id").as("v"))
    // old fuzzyResolveOf formulation, inlined for A/B
    def oldResolve(): Long = {
      val p = blocked
      val pairs = p.as("a").join(p.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
            abs(col("a.p_size") - col("b.p_size")) <= 3)
        .filter(levenshtein(col("a.nm"), col("b.nm")) <= 2)
        .select(col("a.id").as("id"), col("b.id").as("other"),
          levenshtein(col("a.nm"), col("b.nm")).as("dist"))
      val sided = pairs.union(
        pairs.select(col("other").as("id"), col("id").as("other"),
          col("dist")))
      val summary = sided.groupBy("id").agg(
        count(lit(1)).as("n_match"),
        min(col("dist") * lit(1000000000L) + col("other")).as("bk"))
      summary.count()
    }
    time("OLD resolve 1") { oldResolve() }
    time("NEW resolve 1") {
      graft.operators.FuzzyJoin.fuzzyResolveOf(parts).count() }
    time("OLD resolve 2") { oldResolve() }
    time("NEW resolve 2") {
      graft.operators.FuzzyJoin.fuzzyResolveOf(parts).count() }
    time("erClusters 1") {
      graft.operators.FuzzyJoin.erClustersOf(parts).count() }
    time("erClusters 2") {
      graft.operators.FuzzyJoin.erClustersOf(parts).count() }
    pairsFilter.count(); pairsJoinCond.count() // keep refs used
    spark.stop()
  }
}
