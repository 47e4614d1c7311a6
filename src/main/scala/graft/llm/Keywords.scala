package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.PageRank

/** TextRank keyword extraction (Mihalcea & Tarau 2004): rank the
  * corpus vocabulary by PageRank over the word co-occurrence graph —
  * content words are vertices, an edge connects words ADJACENT in the
  * filtered token sequence, weighted by how often the pair co-occurs.
  * Pure composition: the graph build is the [[TextOps]] bigram
  * discipline (posexplode + per-doc lead window, one pass), the
  * iteration is [[PageRank.pageRankOf]] unchanged — same fixed-point
  * quantization, same broadcast-ranks/one-shuffle-per-round shape, so
  * every scale property proven there carries over.
  *
  * Node ids: words hash to 60-bit ids (`Dedup.h60`, md5-derived and
  * engine-portable) because pageRankOf iterates on integer keys by
  * design; the word names join back AFTER the iterations. Collisions
  * are 2^-60-improbable per pair over a vocabulary-sized node set —
  * and a collision would merge two words in BOTH engines identically.
  *
  * Scale: the graph is vocabulary-bounded (nodes) × corpus-bounded
  * (edge weights from one adjacency pass with map-side partials);
  * ranks broadcast per round exactly as in PageRank. The top-k head
  * is TakeOrderedAndProject, never a global sort. */
object Keywords {

  private val stop = Seq("the", "a", "of", "and", "to")

  /** (word, rank) — top `k` corpus keywords, rank rounded to 6 dp,
    * ties broken by word. */
  def textRankOf(docs: DataFrame, k: Int = 20, iters: Int = 3): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // content-word sequence: letters-only tokens, length ≥ 3, stopwords
    // dropped BEFORE adjacency (TextRank's syntactic filter), then
    // re-sequenced so adjacency means "adjacent surviving words"
    val tok = docs
      .select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
          lit(0))).as(Seq("pos", "t")))
      .filter(length(col("t")) >= 3 && !col("t").isInCollection(stop))
    val adj = tok
      .select(col("doc_id"), col("t"), lead(col("t"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull && col("t") =!= col("nxt"))
    // undirected: canonicalize the pair, count, then mirror
    val pw = adj
      .groupBy(least(col("t"), col("nxt")).as("wa"),
        greatest(col("t"), col("nxt")).as("wb"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(true) // feeds edges AND the id→word name table
    val ha = Dedup.h60(concat(lit("tr#"), col("wa")))
    val hb = Dedup.h60(concat(lit("tr#"), col("wb")))
    val edges = pw.select(ha.as("src"), hb.as("dst"), col("w"))
      .union(pw.select(hb.as("src"), ha.as("dst"), col("w")))
    val names = pw.select(col("wa").as("word"), ha.as("node"))
      .union(pw.select(col("wb").as("word"), hb.as("node")))
      .distinct()
    PageRank.pageRankOf(edges, iters)
      .join(names, "node")
      .select(col("word"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(k)
  }

  def textRank(spark: SparkSession, dir: String): DataFrame =
    textRankOf(t(spark, dir, "documents"))
}
