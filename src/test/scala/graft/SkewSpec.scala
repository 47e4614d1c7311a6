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

  test("LSH hot-bucket guard bounds a degenerate corpus to linear pair counts") {
    import spark.implicits._
    // 1000 identical docs + 1000 identical embeddings: every LSH bucket
    // collapses to one hot bucket. Unguarded, the self-join would emit
    // ~499,500 pairs; the star guard emits exactly B-1 hub pairs.
    val dir = java.nio.file.Files.createTempDirectory("graft-hot").toString
    val n = 1000
    (0 until n).map(i => (i.toLong, "the same text repeated in every doc",
        "en", "dup"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val vec = (0 until 64).map(_.toFloat / 64f)
    (0 until n).map(i => (i.toLong, vec, "c0"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val lsh = graft.llm.Dedup.minhashLsh(spark, dir, hotBucketCap = 64)
      .collect()
    assert(lsh.length == n - 1, s"expected ${n - 1} hub pairs, got ${lsh.length}")
    assert(lsh.forall(_.getAs[Long]("id_a") == 0L)) // all pair the min id
    assert(lsh.forall(_.getAs[Double]("est_sim") == 1.0))

    val ann = graft.llm.Similarity.annPairs(spark, dir, hotBucketCap = 64)
      .collect()
    assert(ann.length == n - 1, s"expected ${n - 1} hub pairs, got ${ann.length}")
    assert(ann.forall(_.getAs[Long]("id_a") == 0L))

    // the min-id-survivor dedup stays correct THROUGH the guard: every
    // duplicate is dropped, only the hub survives
    val kept = graft.llm.Similarity.embeddingDedup(spark, dir).collect()
    assert(kept.map(_.getAs[Long]("vec_id")).toSeq == Seq(0L))

    // normal corpora are untouched: default guard vs unguarded must agree
    val sf = "/root/testdata/sf0.001"
    val base = graft.llm.Dedup.minhashLsh(spark, sf).collect().toSeq
    val unguarded = graft.llm.Dedup
      .minhashLsh(spark, sf, hotBucketCap = Int.MaxValue).collect().toSeq
    assert(base.map(_.toString) == unguarded.map(_.toString))
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
