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

  /** All-pairs near neighbors via LSH bucketing on sign-random-projections
    * (hyperplanes = md5-derived pseudo-random but deterministic): docs in the
    * same sign-bucket get exact cosine. The scalable ANN candidate
    * generator: one shuffle on the bucket key. */
  def signBuckets(emb: Column, nPlanes: Int = 8): Column = {
    // deterministic "hyperplane" p_j[i] = (h60(j#i) mod 2001 - 1000)/1000
    concat_ws("", (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, i) =>
          x.cast("double") *
            ((conv(substring(md5(concat(lit(j.toString), lit("#"),
              i.cast("string"))), 1, 15), 16, 10).cast("long") % 2001L)
              .cast("double") - 1000.0) / 1000.0),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, "1").otherwise("0")
    }: _*)
  }

  def annPairs(spark: SparkSession, dir: String,
      minSim: Double = 0.3): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        signBuckets(col("embedding")).as("bucket"))
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
