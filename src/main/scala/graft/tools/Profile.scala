package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.llm.Dedup

/** Ad-hoc stage profiler for slow queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val d = t(spark, dir, "documents")
    time("tokens") {
      d.select(split(trim(col("text")), "\\s+").as("t")).count()
    }
    time("shingles") {
      d.select(Dedup.shingles(col("text")).as("sh")).count()
    }
    time("shingle+h60 flat") {
      d.select(explode(Dedup.shingles(col("text"))).as("s"))
        .select(Dedup.h60(col("s"))).count()
    }
    time("signature") {
      d.select(col("doc_id"), Dedup.minhashSignature(col("text")).as("sig"))
        .count()
    }
    val sh = d.select(explode(Dedup.shingles(col("text"))).as("s"))
      .localCheckpoint(true)
    time("md5 only") { sh.select(md5(col("s")).as("h"))
      .agg(count(col("h"))).count() }
    time("md5+substr") { sh.select(substring(md5(col("s")), 1, 15).as("h"))
      .agg(count(col("h"))).count() }
    time("md5+substr+conv") { sh.select(Dedup.h60(col("s")).as("h"))
      .agg(sum(col("h"))).count() }
    time("xxhash64") { sh.select(xxhash64(col("s")).as("h"))
      .agg(sum(col("h"))).count() }
    time("8x h60 via explode") {
      sh.crossJoin(spark.range(8).toDF("j"))
        .select(Dedup.h60(concat(col("s"), lit("#"), col("j").cast("string")))
          .as("h")).agg(sum(col("h"))).count()
    }
    time("shingleTable explode") {
      Dedup.shingleTable(d).select(explode(col("sh")).as("s")).agg(count("s")).count()
    }
    time("hashed 2M") {
      Dedup.shingleTable(d).select(col("doc_id"), explode(col("sh")).as("s"))
        .crossJoin(broadcast(spark.range(8).toDF("j")))
        .select(col("doc_id"), col("j"), Dedup.h60(concat(col("s"), lit("#"), col("j").cast("string"))).as("h"))
        .agg(sum("h")).count()
    }
    time("signature staged") {
      Dedup.signatureTable(d).select(explode(col("sig"))).agg(sum("col")).count()
    }
    time("full lsh") { Dedup.minhashLsh(spark, dir).count() }
    time("ngram jaccard") { Dedup.ngramJaccardPairs(spark, dir).count() }
    time("simhash staged") { Dedup.simhash(spark, dir).count() }
    spark.stop()
  }
}
