package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity search over embedding columns (ARRAY<FLOAT>): brute-force
  * cosine top-k as the exact baseline, and an IVF-style cell-pruned variant
  * as the scale path.
  *
  * Dot products are `zip_with` + `aggregate` folds in double — sequential
  * per-row accumulation, fully codegen'd, deterministic. At 100 TB the
  * brute-force form is a broadcast of the query vector over a single scan
  * (no shuffle until top-k merge, which TakeOrderedAndProject keeps at k
  * rows per partition).
  */
object Similarity {

  /** Sequential-fold dot product of two float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against the query vector (vec_id = qId). */
  def cosineTopK(spark: SparkSession, dir: String, qId: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === qId)
      .select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= qId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q_emb")), 9).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  /** IVF-style pruned search: probe only the query's coarse cell (here the
    * `label` column stands in for an IVF cell assignment). At scale this is
    * the partition-pruning path — cells map to partitions, so a probe reads
    * 1/nlist of the data. */
  def cosineTopKIvf(spark: SparkSession, dir: String, qId: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === qId)
      .select(col("embedding").as("q_emb"), col("label").as("q_label"))
    e.filter(col("vec_id") =!= qId)
      .join(broadcast(q), col("label") === col("q_label"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 9).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane table (nPlanes × dim):
    * p(j, i) = (h60("j#i") mod 2001 − 1000)/1000 — a small broadcast dim. */
  private def planeTable(spark: SparkSession, nPlanes: Int, dim: Int): DataFrame =
    spark.range(nPlanes).toDF("j")
      .crossJoin(spark.range(dim).toDF("i"))
      .select(col("j"), col("i"),
        (((Dedup.h60(concat(col("j").cast("string"), lit("#"),
          col("i").cast("string"))) % 2001L)
          .cast("double") - 1000.0) / 1000.0).as("w"))

  /** Sign-random-projection buckets, relationally: posexplode embeddings ⋈
    * broadcast plane weights → per-(vec, plane) dot sign → bucket string.
    * Whole-stage codegen; shuffles only (vec, plane) partial sums. (The
    * lambda formulation interprets md5 per element per plane.) */
  def signBucketTable(emb: DataFrame, nPlanes: Int = 8, dim: Int = 64)
      : DataFrame = {
    val planes = planeTable(emb.sparkSession, nPlanes, dim)
    emb
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .join(broadcast(planes), "i")
      .groupBy("vec_id", "j")
      .agg(sum(col("x").cast("double") * col("w")).as("proj"))
      .groupBy("vec_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("j"),
          when(col("proj") >= 0, "1").otherwise("0").as("s")))),
        x => x("s"))).as("bucket"))
  }

  /** Embedding-cosine near-dup DEDUP: keep-list over the ANN pair set —
    * a vector is dropped when a smaller-id near-neighbor exists (min-id
    * survivor rule, the same keep policy as exact dedup's MIN(doc_id)).
    * Candidate generation stays bucket-bounded (annPairs); the keep-list is
    * one anti-join. */
  def embeddingDedup(spark: SparkSession, dir: String,
      minSim: Double = 0.3): DataFrame = {
    val dropped = annPairs(spark, dir, minSim)
      .select(col("id_b").as("vec_id")).distinct()
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
      .join(dropped, Seq("vec_id"), "left_anti")
      .orderBy("vec_id")
  }

  /** All-pairs near neighbors via the sign-bucket LSH: vectors in the same
    * bucket get exact cosine. One shuffle on the bucket key — never an
    * all-pairs product. */
  def annPairs(spark: SparkSession, dir: String,
      minSim: Double = 0.3): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    // materialize buckets once — both join sides read them
    val e = signBucketTable(emb).join(emb, "vec_id").localCheckpoint(true)
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 9).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
      .orderBy("id_a", "id_b")
  }
}
