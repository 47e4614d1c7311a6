package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** SUBSTRING-level exact dedup — duplicated k-token span detection and
  * removal (Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better"): repeated spans inside otherwise-distinct documents
  * (license boilerplate, navigation chrome, quoted passages) survive
  * document-level exact AND near dedup, and the paper shows models
  * memorize exactly these. The paper builds a suffix array; the
  * distributed shape is sliding-window span hashing — every k-token
  * window is hashed, a span is DUPLICATED when its hash occurs ≥ 2 times
  * corpus-wide, and the scrub keeps only the canonical (first by
  * (doc_id, pos)) occurrence's text. A suffix array finds variable-length
  * repeats; fixed-k windows find every repeat of length ≥ k (any such
  * repeat contains a duplicated k-window) at the cost of missing shorter
  * ones — the standard large-scale approximation.
  *
  * Scale: span rows are one posexplode + lead-window pass per doc (the
  * [[Dedup.shingleRows]] discipline — whole-stage codegen, no HOF
  * lambdas), one map-side-partial aggregation on the 60-bit span hash
  * (narrow shuffle key, never the span text), and one equi-join back.
  * The duplicate-hash table is corpus-sized, so it is NOT broadcast —
  * both legs shuffle on `h`, and a boilerplate span repeated millions of
  * times is a single aggregation key with partial combine, not a window
  * partition (the groupBy+join formulation is chosen over
  * row_number-over-h precisely for map-side combine under skew).
  * Island merging windows partition by doc_id — doc-bounded, skew-free.
  */
object SpanDedup {

  /** Every k-token span occurrence: (doc_id, pos, h) where h is the
    * 60-bit hash of the space-joined window starting at token `pos`
    * (0-based). Multiset — positions matter; no distinct. */
  def spanRows(docs: DataFrame, k: Int = 8): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", (0 until k).map(j =>
          if (j == 0) col("tok") else lead(col("tok"), j).over(w)): _*)
          .as("s"),
        lead(col("tok"), k - 1).over(w).as("last"))
      .filter(col("last").isNotNull)
      .select(col("doc_id"), col("pos"),
        Dedup.h60(concat(lit("span#"), col("s"))).as("h"))
  }

  /** Occurrences of corpus-duplicated spans, flagged canonical:
    * (doc_id, pos, h, is_canon) where is_canon marks the global first
    * occurrence of `h` by (doc_id, pos). `sr` must be materialized by
    * the caller when reused (it feeds the aggregation AND the join). */
  def dupOccurrences(sr: DataFrame): DataFrame = {
    val dup = sr.groupBy("h")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("w"))
      .filter(col("c") >= 2)
      .select(col("h"), col("w.doc_id").as("cd"), col("w.pos").as("cp"))
    sr.join(dup, "h")
      .select(col("doc_id"), col("pos"), col("h"),
        (col("doc_id") === col("cd") && col("pos") === col("cp"))
          .cast("int").as("is_canon"))
  }

  /** Per-document duplicated-span profile: total spans, duplicated
    * occurrences, merged duplicated ISLANDS (overlapping dup spans
    * coalesced), and the token count those islands cover — the
    * "how much of this doc is boilerplate" datasheet row.
    * (doc_id, n_spans, n_dup, n_islands, n_dup_tokens). */
  def dupSpansOf(docs: DataFrame, k: Int = 8): DataFrame = {
    val sr = graft.Materialize.checkpoint(spanRows(docs, k))
    val occ = dupOccurrences(sr)
    // gaps-and-islands over each doc's dup-span starts: a new island
    // opens where this span starts past every earlier span's end
    val wPrev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = occ
      .withColumn("pme", max(col("pos") + lit(k - 1)).over(wPrev))
      .withColumn("ni",
        (col("pme").isNull || col("pos") > col("pme")).cast("int"))
      .withColumn("island", sum(col("ni")).over(wRun))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("start"),
        max(col("pos") + lit(k - 1)).as("end"),
        count(lit(1)).as("n_occ"))
    val perDoc = islands.groupBy("doc_id")
      .agg(sum(col("n_occ")).cast("int").as("n_dup"),
        count(lit(1)).cast("int").as("n_islands"),
        sum(col("end") - col("start") + 1).cast("int").as("n_dup_tokens"))
    // base on the docs frame: a doc shorter than k tokens has zero spans
    // but must still get its datasheet row
    docs.select("doc_id")
      .join(sr.groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_spans")), Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("n_dup"), lit(0)).as("n_dup"),
        coalesce(col("n_islands"), lit(0)).as("n_islands"),
        coalesce(col("n_dup_tokens"), lit(0)).as("n_dup_tokens"))
      .orderBy("doc_id")
  }

  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpansOf(t(spark, dir, "documents"))

  /** Scrub duplicated spans, keeping canonical text: a token is DROPPED
    * iff some duplicated span covers it and NO canonical occurrence
    * does — the global first occurrence of every repeated span keeps its
    * text, later occurrences lose theirs (keep-biased on overlap: a
    * token covered by both a canonical and a non-canonical span stays).
    * Docs shorter than k tokens pass through verbatim.
    * (doc_id, n_tokens, n_kept, text_scrub). */
  def spanScrubOf(docs: DataFrame, k: Int = 8): DataFrame = {
    val sr = graft.Materialize.checkpoint(spanRows(docs, k))
    // token positions covered by ≥1 dup occurrence, with max canonical
    // flag: k is small, so exploding each occurrence to its k positions
    // is a bounded ×k blow-up of the (already narrow) dup subset only
    val drops = dupOccurrences(sr)
      .select(col("doc_id"), col("is_canon"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("p"))
      .groupBy("doc_id", "p")
      .agg(max(col("is_canon")).as("canon_any"))
      .filter(col("canon_any") === 0)
      .select(col("doc_id"), col("p"))
    val toks = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
    val kept = toks
      .join(drops.withColumnRenamed("p", "pos"),
        Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s("tok"))).as("text_scrub"))
    toks.groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_scrub"), lit("")).as("text_scrub"))
      .orderBy("doc_id")
  }

  def spanScrub(spark: SparkSession, dir: String): DataFrame =
    spanScrubOf(t(spark, dir, "documents"))
}
