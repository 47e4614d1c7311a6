package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-curation operators beyond dedup: the C4/Gopher-style cleanup
  * passes a training-data pipeline runs between crawling and tokenization.
  *
  *  - [[lineDedup]]: global line-level exact dedup (C4 removed any
  *    three-sentence span occurring more than once; the unit here is a
  *    fixed 8-word chunk because the synthetic corpus has no sentence
  *    punctuation — the operator shape is identical for any line splitter).
  *  - [[repetitionStats]]: Gopher-style repetition signals (Rae et al.
  *    2021, "Scaling Language Models" §A1.1): documents dominated by a few
  *    repeated n-grams or duplicate lines are boilerplate/spam.
  *  - [[sequencePack]]: greedy sequential packing of documents into
  *    fixed-token training sequences, sharded so the packing window never
  *    becomes a global single-partition sort.
  *  - [[piiRedact]]: regex PII scrubbing (emails, phone numbers) with
  *    per-doc redaction counts.
  *
  * All four are single-shuffle (or shuffle-free) relational plans — no
  * interpreted lambdas on the hot path (window `lead`/`sum` instead of
  * higher-order functions, see Dedup's PERF NOTE).
  */
object TextCuration {

  private val LineWords = 8

  /** (doc_id, line_idx, line) — text segmented into fixed LineWords-word
    * chunks. Whole-stage codegen: posexplode + one per-doc window. */
  private def lineRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("line_idx", (col("pos") / LineWords).cast("int"))
      .groupBy("doc_id", "line_idx")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s("tok"))).as("line"))

  /** C4-style GLOBAL line dedup: a line (8-word chunk) is kept only at its
    * first occurrence corpus-wide — first = smallest (doc_id, line_idx).
    * Returns per doc: total lines, kept lines, and the reassembled
    * deduplicated text.
    *
    * Scale: the first-occurrence winner per line is a `min_by` AGGREGATE,
    * not a window — partial aggregation collapses a hot line (the classic
    * "enable javascript" banner, duplicated millions of times) to one row
    * per map task BEFORE the shuffle, where a window formulation would
    * sort every occurrence on a single partition. Total: one aggregate
    * shuffle on the line, one per-doc aggregate, one per-doc join. */
  def lineDedup(spark: SparkSession, dir: String): DataFrame =
    lineDedupOf(t(spark, dir, "documents"))

  def lineDedupOf(docs: DataFrame): DataFrame = {
    val lr = lineRows(docs)
    // corpus-wide winner per distinct line, carrying its text: map-side
    // partial min_by means the reducer sees one candidate per partition,
    // whatever the line's multiplicity
    val winners = lr.groupBy("line")
      .agg(min(struct(col("doc_id"), col("line_idx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.line_idx").as("line_idx"),
        col("line"))
    val kept = winners.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          s => s("line"))).as("text_dedup"))
    lr.groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_lines"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
      .orderBy("doc_id")
  }

  /** Gopher repetition signals per document:
    *  - top_bigram_frac: occurrences of the most frequent word bigram /
    *    total bigrams (high = "buy now buy now ..." spam);
    *  - dup_line_frac: 1 − distinct/total 8-word chunks;
    *  - flagged: either signal above its threshold.
    * Zero-HOF: bigrams come from a `lead` window over the exploded token
    * stream (multiset — repetition is the point, no distinct). One shuffle
    * on doc_id; the (doc, bigram) counts aggregate with map-side partials. */
  def repetitionStats(spark: SparkSession, dir: String,
      topBigramMax: Double = 0.10, dupLineMax: Double = 0.05): DataFrame =
    repetitionStatsOf(t(spark, dir, "documents"), topBigramMax, dupLineMax)

  def repetitionStatsOf(docs: DataFrame,
      topBigramMax: Double = 0.10, dupLineMax: Double = 0.05): DataFrame = {
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), lead(col("tok"), 1).over(wd)).as("bg"),
        lead(col("tok"), 1).over(wd).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((max(col("c")).cast("double") / sum(col("c")))
        .as("top_bigram_frac"))
    val lines = lineRows(docs)
      .groupBy("doc_id")
      .agg((lit(1.0) - countDistinct(col("line")).cast("double") /
        count(lit(1))).as("dup_line_frac"))
    bigrams.join(lines, "doc_id")
      .select(col("doc_id"),
        round(col("top_bigram_frac"), 9).as("top_bigram_frac"),
        round(col("dup_line_frac"), 9).as("dup_line_frac"),
        (col("top_bigram_frac") > topBigramMax ||
          col("dup_line_frac") > dupLineMax).cast("int").as("flagged"))
      .orderBy("doc_id")
  }

  /** Greedy sequential packing: shard docs by hash, then within each shard
    * assign every doc the training sequence its first token falls into at
    * `seqLen` tokens per sequence (cumulative token count over the shard's
    * doc_id order). Emits (doc_id, shard, n_tokens, seq_id, seq_offset).
    *
    * Scale: packing is a running sum — inherently sequential — so it runs
    * PER SHARD (the window partitions by shard), never as one global
    * single-partition sort; shards pack independently on their executors,
    * exactly how a distributed tokenizer writes training shards. */
  def sequencePack(spark: SparkSession, dir: String, seqLen: Int = 2048,
      nShards: Int = 8): DataFrame =
    sequencePackOf(t(spark, dir, "documents"), seqLen, nShards)

  def sequencePackOf(docs: DataFrame, seqLen: Int = 2048,
      nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start_tok div $seqLen").as("seq_id"),
        expr(s"start_tok % $seqLen").as("seq_offset"))
      .orderBy("doc_id")
  }

  /** The FULL Gopher quality-rule battery (Rae et al. 2021, §A1.1) — the
    * document-shape gates run before any model-based filter: word-count
    * bounds, mean-word-length band, symbol-to-word ratio (# / …),
    * bullet-start and ellipsis-end line fractions, alphabetic-word
    * fraction, and the ≥2-distinct-stopwords test. EVERY rule is pure
    * integer arithmetic via cross-multiplication (10·n_sym ≤ n_words
    * instead of ratios), so the row is bit-exact on any engine with no
    * rounding argument at all.
    *
    * The synthetic corpus has no bullets/ellipses/hashes, so
    * deterministic slices are AUGMENTED (the [[piiRedact]] fabrication
    * discipline): %13 docs gain 10 bullet lines, %17 docs gain 4
    * ellipsis-terminated lines, %19 docs gain 8 hash symbols — each rule
    * fires for real in both engines.
    *
    * Scale: ONE zero-shuffle projection over the scan; the per-doc
    * HOF filters run on arrays bounded by document length (the
    * qualityScore precedent), everything else is codegen'd string/regex
    * work. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(t(spark, dir, "documents"))

  def gopherRulesOf(docs: DataFrame): DataFrame = {
    val bullets = (1 to 10).map(i => s"• item $i").mkString("\n", "\n", "")
    val ells = (1 to 4).map(i => s"to be continued$i ...").mkString("\n", "\n", "")
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val aug = concat(col("text"),
      when(col("doc_id") % 13 === 0, lit(bullets)).otherwise(lit("")),
      when(col("doc_id") % 17 === 0, lit(ells)).otherwise(lit("")),
      when(col("doc_id") % 19 === 0, lit(" # # # # # # # #"))
        .otherwise(lit("")))
    docs
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        split(trim(col("aug")), "\\s+").as("toks"),
        split(col("aug"), "\n").as("lines"),
        length(regexp_replace(trim(col("aug")), "\\s+", "")).as("sum_len"),
        (regexp_count(col("aug"), lit("#")) +
          regexp_count(col("aug"), lit("\\.\\.\\."))).as("n_sym"))
      .select(col("doc_id"),
        size(col("toks")).as("n_words"),
        col("sum_len"),
        size(col("lines")).as("n_lines"),
        col("n_sym"),
        size(filter(col("toks"), t => t.rlike("[a-z]"))).as("n_alpha"),
        size(array_intersect(array_distinct(col("toks")),
          typedlit(stops))).as("n_stop"),
        size(filter(col("lines"), l => l.startsWith("• "))).as("n_bullet"),
        size(filter(col("lines"), l => l.endsWith("..."))).as("n_ell"))
      .select(col("doc_id"), col("n_words"), col("n_lines"),
        (col("n_words") >= 50 && col("n_words") <= 100000)
          .cast("int").as("r_word_count"),
        (lit(3) * col("n_words") <= col("sum_len") &&
          col("sum_len") <= lit(10) * col("n_words"))
          .cast("int").as("r_mean_len"),
        (lit(10) * col("n_sym") <= col("n_words")).cast("int").as("r_symbol"),
        (lit(10) * col("n_bullet") <= lit(9) * col("n_lines"))
          .cast("int").as("r_bullet"),
        (lit(10) * col("n_ell") <= lit(3) * col("n_lines"))
          .cast("int").as("r_ellipsis"),
        (lit(5) * col("n_alpha") >= lit(4) * col("n_words"))
          .cast("int").as("r_alpha"),
        (col("n_stop") >= 2).cast("int").as("r_stop"))
      .withColumn("keep",
        (col("r_word_count") === 1 && col("r_mean_len") === 1 &&
          col("r_symbol") === 1 && col("r_bullet") === 1 &&
          col("r_ellipsis") === 1 && col("r_alpha") === 1 &&
          col("r_stop") === 1).cast("int"))
      .orderBy("doc_id")
  }

  /** C4 cleanup heuristics (Raffel et al. 2020, §2.2) at the line level:
    * keep lines ending in terminal punctuation, drop lines mentioning
    * javascript, drop whole documents with fewer than 3 sentences or
    * containing "lorem ipsum" or curly braces. Lines are the same 8-word
    * chunks as [[lineDedup]] (the corpus has no sentence punctuation, so
    * terminal punctuation is FABRICATED deterministically: a chunk ends
    * with '.' unless (doc_id + line_idx) % 3 = 0 — both engines replay
    * the mangle, so the punctuation gate filters for real); %23 docs get
    * "javascript" injected into line 1, %29 docs get a lorem-ipsum
    * prefix on line 0, %31 docs a curly brace.
    *
    * Scale: the [[lineDedup]] shape — one chunk aggregation, one per-doc
    * aggregation, everything keyed by doc; no corpus-wide state beyond
    * the scan. */
  def c4Rules(spark: SparkSession, dir: String): DataFrame =
    c4RulesOf(t(spark, dir, "documents"))

  def c4RulesOf(docs: DataFrame): DataFrame = {
    val ln = lineRows(docs)
    val mangled = ln
      .withColumn("line0",
        when(col("doc_id") % 29 === 0 && col("line_idx") === 0,
          concat(lit("lorem ipsum "), col("line")))
          .otherwise(col("line")))
      .withColumn("line1",
        when(col("doc_id") % 23 === 0 && col("line_idx") === 1,
          concat(col("line0"), lit(" javascript"))).otherwise(col("line0")))
      .withColumn("line2",
        when(col("doc_id") % 31 === 0 && col("line_idx") === 0,
          concat(col("line1"), lit(" {"))).otherwise(col("line1")))
      .select(col("doc_id"), col("line_idx"),
        concat(col("line2"),
          when((col("doc_id") + col("line_idx")) % 3 =!= 0, lit("."))
            .otherwise(lit(""))).as("line"))
    val flagged = mangled
      .withColumn("ends_punct", col("line").endsWith("."))
      .withColumn("has_js", col("line").contains("javascript"))
      .withColumn("kept", col("ends_punct") && !col("has_js"))
    flagged.groupBy("doc_id").agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("int").as("n_kept"),
        sum(when(col("ends_punct"), 1L).otherwise(0L)).cast("int")
          .as("n_sent"),
        max(col("line").contains("lorem ipsum").cast("int")).as("has_lorem"),
        max((col("line").contains("{") || col("line").contains("}"))
          .cast("int")).as("has_brace"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("line_idx"), col("line"))))),
          s => s("line"))).as("kept_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("n_sent"),
        col("has_lorem"), col("has_brace"),
        (col("n_sent") >= 3 && col("has_lorem") === 0 &&
          col("has_brace") === 0).cast("int").as("doc_keep"),
        col("kept_text"))
      .orderBy("doc_id")
  }

  /** Regex PII redaction: emails → [EMAIL], NNN-NNNN phones → [PHONE],
    * with per-doc match counts. The synthetic corpus contains no PII, so a
    * deterministic slice (doc_id % 7 == 0) is AUGMENTED with a fabricated
    * email + phone — the regexes are exercised on real matches in both
    * engines, not vacuously green on zero matches.
    *
    * Scale: pure projection — codegen'd regex per row, no shuffle; the
    * patterns avoid catastrophic backtracking (character classes only). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{4}"
    val aug = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id"),
          lit("@example.com or call 555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
        .otherwise(lit("")))
    t(spark, dir, "documents")
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(email)).cast("int").as("n_emails"),
        regexp_count(col("aug"), lit(phone)).cast("int").as("n_phones"),
        regexp_replace(regexp_replace(col("aug"), email, "[EMAIL]"),
          phone, "[PHONE]").as("redacted"))
      .orderBy("doc_id")
  }
}
