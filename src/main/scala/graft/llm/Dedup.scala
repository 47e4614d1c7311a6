package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deduplication operators for training-data pipelines: exact (hash-groupBy),
  * n-gram Jaccard pairs, and MinHash+LSH near-dup detection.
  *
  * Hashing is md5-prefix based (portable across engines for the oracle, and
  * stable across Spark versions — not tied to murmur seeds). At 100 TB the
  * LSH path is the scalable one: signature computation is a projection,
  * candidate generation is an equi-shuffle on (band, bandhash) buckets —
  * never an all-pairs product.
  */
object Dedup {

  /** 60-bit portable hash: first 15 hex chars of md5, as a positive long. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact dedup: group identical texts, keep the min doc_id. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

  /** 3-word shingles of a text column (distinct, as array). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - k,
          concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))),
      s => s.isNotNull))
  }

  /** Pairwise n-gram Jaccard within cheap blocks (lang, source): the
    * exact-similarity baseline. Blocked so the join is equi (no cross
    * product); at scale the blocks bound pair counts. */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.2): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        shingles(col("text")).as("sh"))
    val a = d.as("a")
    val b = d.as("b")
    val inter = size(array_intersect(col("a.sh"), col("b.sh")))
    val union = size(array_union(col("a.sh"), col("b.sh")))
    val jac = inter.cast("double") / union
    a.join(b, col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** MinHash signature: for each of `n` hash functions, the min over
    * shingles of h60(shingle + "#" + i). */
  def minhashSignature(text: Column, n: Int = 8): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      array_min(transform(shingles(text), s =>
        h60(concat(s, lit("#"), i.cast("string"))))))

  /** MinHash + LSH near-dup candidates: 8-component signatures in 4 bands of
    * 2; docs sharing any band bucket become candidates; estimated similarity
    * = matching signature components / 8.
    *
    * Scale path: explode to (band, bandhash) → shuffle on the bucket →
    * within-bucket pairs. Bucket sizes are data-bounded (near-dups only);
    * no all-pairs join ever materializes. */
  def minhashLsh(spark: SparkSession, dir: String,
      minEstSim: Double = 0.5): DataFrame = {
    val bands = 4
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), minhashSignature(col("text")).as("sig"))
    val buckets = d.select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            concat_ws("_",
              element_at(col("sig"), b * 2 + 1).cast("string"),
              element_at(col("sig"), b * 2 + 2).cast("string"))
              .as("bh")))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.bh"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    val matches = size(filter(
      zip_with(col("a.sig"), col("b.sig"), (x, y) => (x === y).cast("int")),
      v => v === 1))
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (matches.cast("double") / 8).as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= minEstSim)
      .orderBy("id_a", "id_b")
  }

  /** SimHash (16-bit, md5-derived): per token take 16 bits of md5, majority
    * vote per bit position across tokens. Pure column algebra. */
  def simhashCol(text: Column): Column = {
    val toks = array_distinct(split(trim(text), "\\s+"))
    val th = transform(toks, w => conv(substring(md5(w), 1, 4), 16, 10).cast("long"))
    aggregate(
      sequence(lit(0), lit(15)),
      lit(0L),
      (acc, bit) => {
        val votes = aggregate(th, lit(0), (v, h) =>
          v + when(call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
        acc + when(votes > 0, call_function("shiftleft", lit(1L), bit))
          .otherwise(0L)
      })
  }

  def simhash(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))
      .orderBy("doc_id")
}
