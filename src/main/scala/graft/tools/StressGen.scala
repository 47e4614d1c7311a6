package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-stress corpus generator (VERDICT r6 #5): replicate the
  * sf0.1 tables `factor`× with DISJOINT key spaces, so the stressed
  * corpus is statistically `factor` independent copies of sf0.1 —
  * the growth shape of "more users / more crawl", not "same data
  * duplicated":
  *
  *   - events:    event_id and user_id shifted per replica → the
  *                entity/event graph becomes `factor` disjoint copies
  *                (cascade subtrees stay the same SIZE, there are just
  *                `factor`× more of them — the scaling claim under test).
  *   - documents: doc_id shifted; every word suffixed with the replica
  *                ordinal, so no shingle crosses replicas — the near-dup
  *                cluster structure is `factor` independent copies of
  *                sf0.1's (replicated identical text would instead weld
  *                every doc into one giant cluster and measure the star
  *                guard, not scaling).
  *   - orders/lineitem: order/customer/supplier keys shifted per replica
  *                → the PageRank graph is `factor` disjoint copies.
  *   - embeddings: vec_id shifted (vectors reused — ANN queries are not
  *                in the stress set).
  *   - dims (region..customer, part, supplier): copied unchanged (they
  *     are lookup sides; the stress queries don't scale with them).
  *
  * Output is a complete sfDir, so `graft.Bench` runs on it unmodified
  * (`SPARK_GRAFT_SF_DIR=<out>`). Deterministic — no RNG, shifts only.
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/stress/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    /** Union of `factor` per-replica transforms of `df`. */
    def replicate(df: DataFrame)(tr: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until factor).map(i => tr(df, i)).reduce(_ unionByName _)

    // key-shift strides: one past the source max, per key family
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    val ev = read("events")
    val (evStride, userStride) = (maxOf(ev, "event_id"), maxOf(ev, "user_id"))
    write(replicate(ev) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * evStride))
        .withColumn("user_id", col("user_id") + lit(i * userStride))
    }, "events")

    val docs = read("documents")
    val docStride = maxOf(docs, "doc_id")
    write(replicate(docs) { (d, i) =>
      val t = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + s"x$i")
      d.withColumn("doc_id", col("doc_id") + lit(i * docStride))
        .withColumn("text", t)
        // AFTER the text rewrite: length(t) here would re-resolve the
        // suffix regexp against the already-suffixed column and store
        // n_chars of a doubly-suffixed string (review r7 finding #1)
        .withColumn("n_chars", length(col("text")))
    }, "documents")

    val ord = read("orders")
    val li = read("lineitem")
    val ordStride = maxOf(ord, "o_orderkey")
    val custStride = maxOf(ord, "o_custkey")
    val suppStride = maxOf(li, "l_suppkey")
    write(replicate(ord) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordStride))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custStride))
    }, "orders")
    write(replicate(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppStride))
    }, "lineitem")

    val emb = read("embeddings")
    val vecStride = maxOf(emb, "vec_id")
    write(replicate(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * vecStride))
    }, "embeddings")

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(read(n), n))

    // ER stress variant: 10× the ENTITY catalog as `part10` — the
    // "more entities" growth shape. The last name token (the blocking
    // head noun) gets a per-replica suffix, so blocks are DISJOINT
    // across replicas (within-replica distances are unchanged: a
    // common suffix never moves levenshtein). The shared `part` stays
    // untouched as lineitem's referential dimension.
    val pt = read("part")
    val ptStride = maxOf(pt, "p_partkey")
    write(replicate(pt) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * ptStride))
        .withColumn("p_name",
          if (i == 0) col("p_name")
          else concat(col("p_name"), lit(s"_r$i")))
    }, "part10")

    Seq("events", "documents", "orders", "lineitem", "embeddings")
      .foreach { n =>
        println(s"[stress] $n -> " +
          spark.read.parquet(s"$out/$n.parquet").count())
      }
    spark.stop()
  }
}
