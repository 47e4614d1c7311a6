package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for training-data pipelines: token stats, quality
  * scoring, language-ID heuristic, document fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) — at 100 TB these run as a single
  * projection over the scan with zero shuffles.
  */
object TextOps {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish pre-tokenization pattern (GPT-2 shape, RE2-safe — no
    * lookahead, so the same pattern runs in Spark's java.util.regex and
    * DuckDB's RE2): contractions, space-prefixed letter runs, digit runs,
    * punctuation runs, residual whitespace. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish pre-tokens of a text column (ARRAY<STRING>). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Token counting under both tokenizers + the first pre-tokens, so the
    * oracle checks actual token boundaries, not just counts. */
  def tokenBpe(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bpe", bpeTokens(col("text")))
      .select(
        col("doc_id"),
        size(col("bpe")).as("n_bpe_tokens"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        array_join(slice(col("bpe"), 1, 5), "|").as("first5"))
      .orderBy("doc_id")

  /** Token counting + uniqueness + mean token length. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq_tokens"),
        (aggregate(transform(col("toks"), w => length(w)), lit(0),
          (acc, x) => acc + x).cast("double") / size(col("toks")))
          .as("avg_token_len"))
      .orderBy("doc_id")

  private[llm] val stopwords = Seq("the", "a", "of", "and", "to")

  /** Stopword count over a token array — ONE definition shared by the
    * heuristic quality gate ([[qualityScore]]) and the classifier that
    * distills it ([[Classifier]]); a matching change (e.g. case folding)
    * must reach both or the distillation target silently drifts. */
  private[llm] def stopwordCount(toks: Column): Column =
    size(filter(toks, w =>
      array_contains(array(stopwords.map(lit): _*), w)))

  /** The heuristic KEEP gate (enough tokens AND stopword ratio ≤ 1/5) —
    * ONE definition shared by the classifier's distillation label
    * ([[Classifier.featureFrame]]) and the data card's
    * quality_keep_frac, so a threshold change reaches every consumer or
    * none. */
  private[llm] def qualityGate(toks: Column): Column = {
    val nTok = size(toks).cast("long")
    nTok >= 25 && stopwordCount(toks).cast("long") * 5 <= nTok
  }

  /** Quality scoring: stopword ratio, uniqueness ratio, and a CASE label —
    * the shape of heuristic quality filters in pretraining pipelines. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = stopwordCount(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        (nStop.cast("double") / nTok).as("stopword_ratio"),
        uniqRatio.as("uniq_ratio"),
        when(nStop.cast("double") / nTok > 0.2, "low")
          .when(nTok >= 12, "ok")
          .otherwise("short").as("quality"))
      .orderBy("doc_id")
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "das"))

  /** Language-ID n-gram/stopword heuristic: score each language by marker
    * hits, argmax with deterministic tie-break order en > es > de. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    def score(ws: Seq[String]): Column =
      size(filter(toks, w => array_contains(array(ws.map(lit): _*), w)))
    val Seq(en, es, de) = langMarkers.map { case (_, ws) => score(ws) }
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("declared_lang"),
        en.as("score_en"), es.as("score_es"), de.as("score_de"),
        when(en >= es && en >= de, "en")
          .when(es >= de, "es")
          .otherwise("de").as("predicted_lang"))
      .orderBy("doc_id")
  }

  /** LEARNED BPE merge-table training (Sennrich et al., ACL 2016): start
    * from characters, repeatedly count adjacent symbol pairs weighted by
    * word frequency and merge the most frequent pair (ties break
    * lexicographically). Returns the merge table
    * (step, left_sym, right_sym, freq) — the artifact a tokenizer ships.
    *
    * Representation: a word is its symbols joined by TWO spaces with
    * single-space sentinels (" h  e  y "). One literal
    * `regexp_replace(w, " a  b ", " ab ")` pass then implements EXACT
    * greedy leftmost-first merging: each match consumes one boundary
    * space on each side, so back-to-back occurrences keep a boundary and
    * all merge in one pass, while overlapping runs ("a a a") merge
    * leftmost-first — the single-space encoding gets both wrong without
    * lookaround, which DuckDB's RE2 lacks. The same literal pattern runs
    * identically in java.util.regex and RE2, so the oracle can unroll the
    * identical rounds. Words are lowercase [a-z]+ pre-tokens, so symbols
    * never contain regex metacharacters.
    *
    * Scale: after ONE corpus-wide aggregation the working set is the
    * VOCABULARY (distinct word, count) — bounded by language, not corpus.
    * Each round is a map-side pair explode + one aggregation; the argmax
    * is a 1-row driver fetch (the same per-round round-trip as the CC
    * convergence gate) and the merge application is a codegen regex
    * projection with no shuffle. The vocab frame is checkpointed per
    * round so round r never re-derives rounds 1..r−1 — the `ivfTrain`
    * pattern. */
  /** Lowercase letter-run pre-tokens of a text column. */
  private def letterWords(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** A word as its two-space-joined symbol string (" h  e  y "). */
  private def spacedWord(word: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** The literal merge-application pattern/replacement for pair (a, b). */
  private def applyMerge(w: Column, a: String, b: String): Column =
    regexp_replace(w,
      java.util.regex.Pattern.quote(s" $a  $b "), s" $a$b ")

  /** The training loop proper: the learned merge list in order, plus the
    * fully-merged vocabulary (word, w, cnt) — encode reuses the latter
    * instead of re-deriving the word table and replaying every merge. */
  private def trainLoop(docs: DataFrame,
      merges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = graft.Materialize.checkpoint(docs
      .select(explode(letterWords(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), spacedWord(col("word")).as("w"), col("cnt")))
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val syms = split(trim(col("w")), "  ")
      val best = vocab
        .select(explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"), col("cnt"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("cnt"))
        .groupBy("a", "b").agg(sum("cnt").as("freq"))
        .orderBy(desc("freq"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        out += ((step, a, b, best(0).getLong(2)))
        vocab = graft.Materialize.checkpoint(vocab.select(col("word"),
          applyMerge(col("w"), a, b).as("w"), col("cnt")))
        step += 1
      }
    }
    (out.toSeq, vocab)
  }

  /** The learned merge list, in order. */
  def trainMerges(docs: DataFrame,
      merges: Int): Seq[(Int, String, String, Long)] =
    trainLoop(docs, merges)._1

  def bpeTrain(docs: DataFrame, merges: Int = 8): DataFrame =
    docs.sparkSession.createDataFrame(trainMerges(docs, merges))
      .toDF("step", "left_sym", "right_sym", "freq")
      .orderBy("step")

  /** Driver-contract form of [[bpeTrain]]. */
  def bpeTrainQuery(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(t(spark, dir, "documents"))

  /** ENCODE with the learned merges — the tokenizer the merge table
    * exists for: train on the corpus, then apply the merge list in order
    * to every distinct word and count each document's learned tokens.
    * Returns (doc_id, n_words, n_learned_tokens).
    *
    * Scale: merges apply to the DISTINCT-WORD table, not the corpus —
    * the `merges` stacked literal-regex projections fold into one
    * codegen stage over vocabulary-sized input; documents then join the
    * (word → token count) map on the word key. Train-then-encode is the
    * same composition shape as `knnJoinTrained` (train → assign →
    * probe). */
  /** (doc_id, word, n_toks) rows under the learned merge table — the ONE
    * derivation [[bpeEncode]] and [[bpeCoverage]] both consume, so the
    * symbol-separator encoding and tokenization cannot drift apart. */
  private def encodedWordRows(docs: DataFrame, merges: Int): DataFrame =
    encodedWordRowsWith(docs, trainLoop(docs, merges)._2)

  /** The encode body against an EXPLICIT vocabulary frame (word, w, cnt)
    * — shared by the train-inline path and the persisted-tokenizer path,
    * so serving from the store replays the identical join. */
  private def encodedWordRowsWith(docs: DataFrame,
      vocab: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(letterWords(col("text"))).as("word"))
    val toks = vocab
      .select(col("word"), size(split(trim(col("w")), "  ")).as("n_toks"))
    words.join(toks, "word")
  }

  /** Persist the learned tokenizer (VERDICT r6 #1): "merges" is the
    * ordered merge list (the artifact a tokenizer RELEASE ships —
    * sufficient to re-encode any text), "vocab" the fully-merged word
    * table (the corpus-word fast path [[bpeEncodePersisted]] serves
    * from, exactly as the in-line encoder consumes it). Returns the
    * store version. */
  def bpeSave(docs: DataFrame, store: graft.store.ModelStore,
      merges: Int = 8): Long = {
    val (ms, vocab) = trainLoop(docs, merges)
    store.save(Map(
      "merges" -> docs.sparkSession.createDataFrame(ms)
        .toDF("step", "left_sym", "right_sym", "freq"),
      "vocab" -> vocab))
  }

  /** Encode with a PERSISTED tokenizer — zero training jobs: the merges
    * were learned once ([[bpeSave]]); encoding is the vocabulary join.
    * Bit-identical to [[bpeEncode]] over the training corpus. */
  def bpeEncodePersisted(docs: DataFrame,
      store: graft.store.ModelStore): DataFrame =
    encodedWordRowsWith(docs, store.load("vocab"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_toks").as("n_learned_tokens"))
      .orderBy("doc_id")

  /** Oracle row: train into a scratch store, encode FROM the store,
    * hash-match `q_bpe_encode`'s oracle — persisted == in-query. */
  def bpePersistedQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.store.ModelStore.scratch(spark, "bpe") { store =>
      bpeSave(docs, store)
      bpeEncodePersisted(docs, store)
    }
  }

  def bpeEncode(docs: DataFrame, merges: Int = 8): DataFrame =
    encodedWordRows(docs, merges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_toks").as("n_learned_tokens"))
      .orderBy("doc_id")

  /** The process-shared trained tokenizer for `dir`'s documents table
    * ([[graft.store.ModelStore.shared]]): trained once per (corpus
    * fingerprint, merge budget), served by every tokenizer consumer
    * after that. `q_bpe_train` stays the measured build row and
    * `q_bpe_persisted` the scratch persisted==inline gate, so the
    * serve-from-cache rows are hash-pinned equal to their train-inline
    * definitions. */
  private def sharedBpe(spark: SparkSession,
      dir: String): graft.store.ModelStore =
    graft.store.ModelStore.shared(spark, Seq("bpe",
      graft.store.ArtifactCache.tableFingerprint(dir, "documents"),
      "merges=8")) { store =>
      bpeSave(t(spark, dir, "documents"), store); ()
    }

  /** Driver-contract form of [[bpeEncode]] — serves from the
    * process-shared tokenizer (zero training jobs when any tokenizer
    * row already built it). */
  def bpeEncodeQuery(spark: SparkSession, dir: String): DataFrame =
    bpeEncodePersisted(t(spark, dir, "documents"), sharedBpe(spark, dir))

  /** Tokenizer COVERAGE report for the learned merge table: corpus-level
    * compression (tokens per word) and the occurrence-weighted share of
    * words the vocabulary encodes as ONE token — the metrics a tokenizer
    * release ships to justify its merge budget. Same train + encode
    * machinery as [[bpeEncode]], collapsed to a (metric, value) card;
    * counts exact, fractions single correctly-rounded divisions. */
  def bpeCoverage(docs: DataFrame, merges: Int = 8): DataFrame =
    coverageOf(encodedWordRows(docs, merges))

  /** The coverage aggregation over (doc_id, word, n_toks) rows — ONE
    * body consumed by the train-inline and shared-tokenizer paths. */
  private def coverageOf(rows: DataFrame): DataFrame = {
    rows.agg(
        count(lit(1)).cast("double").as("n_words"),
        sum("n_toks").cast("double").as("n_tokens"),
        sum(when(col("n_toks") === 1, 1L).otherwise(0L)).cast("double")
          .as("n_single"))
      .select(col("n_words"), col("n_tokens"),
        round(col("n_tokens") / col("n_words"), 6).as("tokens_per_word"),
        round(col("n_single") / col("n_words"), 6).as("single_token_frac"))
      .selectExpr(
        """stack(4,
          |  'n_words', n_words,
          |  'n_tokens', n_tokens,
          |  'tokens_per_word', tokens_per_word,
          |  'single_token_frac', single_token_frac) AS (metric, value)"""
          .stripMargin)
      .orderBy("metric")
  }

  /** Per-language tokenizer FERTILITY audit over the learned merge
    * table: tokens-per-word and single-token share BY LANGUAGE — the
    * read that shows which languages the tokenizer under-serves (a
    * tokenizer trained on one language fragments the others; fertility
    * is the standard multilingual-tokenizer metric). Same
    * shared-tokenizer encode pass as [[bpeEncodeQuery]] (zero training
    * jobs), one extra doc_id equi-join for the language, |langs|-row
    * state. */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    encodedWordRowsWith(docs, sharedBpe(spark, dir).load("vocab"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("n_toks").as("n_tokens"),
        round(sum("n_toks").cast("double") / count(lit(1)), 6)
          .as("tokens_per_word"),
        round(sum(when(col("n_toks") === 1, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("single_token_frac"))
      .orderBy("lang")
  }

  /** Driver-contract form of [[bpeCoverage]] — the coverage card over
    * the process-shared tokenizer's vocabulary (the same
    * `encodedWordRowsWith` body the persisted==inline gate pins). */
  def bpeCoverageQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    coverageOf(encodedWordRowsWith(docs,
      sharedBpe(spark, dir).load("vocab")))
  }

  /** Term frequencies over lowercase letter-run terms: (doc_id, term, tf)
    * — the shared first stage of the relevance-scoring family. One
    * explode + one aggregation with map-side partials; everything
    * downstream operates on (doc × distinct-term) rows, never the raw
    * token stream. */
  private def termFreq(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(letterWords(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** TF-IDF top-k terms per document (the "what is this document about"
    * signal quality/relevance filters key on), with the RATIONAL idf
    * (N − df + 0.5)/(df + 0.5) — BM25's idf ratio without the log.
    * Math.log is not correctly-rounded and differs from DuckDB's libm in
    * the last ulp, so the oracle-exact formulation stays in IEEE-exact
    * +/×/÷; the ratio is strictly decreasing in df exactly like log-idf,
    * so top-k per doc is the same ranking semantics.
    *
    * Scale: the df side of the join is vocabulary-sized (broadcastable),
    * the corpus size is a 1-row broadcast, and the top-k window
    * partitions by doc_id — nothing global. */
  def tfIdf(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val tf = termFreq(t(spark, dir, "documents"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = t(spark, dir, "documents").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        ((col("n") - col("df") + 0.5) / (col("df") + 0.5)), 9))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("rnk"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** BM25 ranking of the corpus against a fixed query-term set
    * (Robertson/Sparck Jones; k1/b defaults per the literature), with the
    * rational idf above. Per (doc, term) there is exactly ONE tf row, so
    * the per-term contributions pivot into columns via a conditional max
    * and the final score adds them in FIXED order — a floating-point sum
    * whose order cannot drift between partitions or engines (a plain
    * sum() over doubles is combine-order-dependent and would flake the
    * bit-exact oracle).
    *
    * Scale: query-term df and the (N, avgdl) stats are 1-to-few-row
    * broadcasts; the tf scan is pre-filtered to query terms before any
    * join; the only wide operation is the final top-k, which
    * TakeOrderedAndProject keeps at k rows per partition. Docs containing
    * no query term score nothing and are absent, as in a posting-list
    * engine. */
  def bm25(spark: SparkSession, dir: String,
      query: Seq[String] = Seq("hash", "join", "window"),
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val tf = termFreq(t(spark, dir, "documents"))
    val len = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = len.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val qtf = tf.filter(col("term").isin(query: _*))
    val qdf = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val per = qtf
      .join(broadcast(qdf), "term")
      .join(len, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n") - col("df") + 0.5) / (col("df") + 0.5))
      .withColumn("tfn", (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("contrib", col("idf") * col("tfn"))
    val aggCols = query.map(q =>
      max(when(col("term") === q, col("contrib"))).as("c_" + q))
    val scored = per.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
      .withColumn("bm25", round(
        query.map(q => coalesce(col("c_" + q), lit(0.0))).reduce(_ + _), 9))
    // top-k FIRST (TakeOrderedAndProject: k rows per partition, no global
    // sort), then number the k survivors — a global row_number window
    // would single-partition-sort every scored doc
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("bm25"), asc("doc_id"))
    scored.orderBy(desc("bm25"), asc("doc_id")).limit(topK)
      .withColumn("rnk", row_number().over(w))
      .select(col("doc_id"), col("bm25"), col("rnk"))
      .orderBy("rnk")
  }

  /** Corpus-wide n-gram statistics: the topK most frequent word n-grams
    * (contamination screening, memorization analysis, boilerplate
    * discovery — the corpus-level complement of the per-doc Gopher
    * repetition stats). One explode + one count aggregation with
    * map-side partials; the top-k goes through orderBy+limit
    * (TakeOrderedAndProject), never a global sort of the n-gram table.
    * Ties on the cut boundary break lexicographically, so the returned
    * SET is deterministic. */
  def ngramStats(spark: SparkSession, dir: String, n: Int = 3,
      topK: Int = 50): DataFrame =
    ngramStatsOf(t(spark, dir, "documents"), n, topK)

  /** Non-distinct word n-gram ROWS (doc_id, gram): posexplode the word
    * stream, window `lead` stitches each gram — whole-stage codegen end
    * to end, [[Dedup.shingleRows]]'s rationale (a transform/slice lambda
    * evaluates interpreted per element on the corpus-scan hot path).
    * Unlike shingleRows this keeps the MULTISET — occurrence counts are
    * the point of the stats/profile consumers — and tokenizes with
    * [[letterWords]]. Docs with fewer than n words emit nothing. */
  private[llm] def gramRows(docs: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"),
        posexplode(letterWords(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", (0 until n).map(j =>
          if (j == 0) col("tok") else lead(col("tok"), j).over(w)): _*)
          .as("gram"),
        lead(col("tok"), n - 1).over(w).as("last"))
      .filter(col("last").isNotNull)
      .select(col("doc_id"), col("gram"))
  }

  /** DataFrame-level [[ngramStats]] (fixture-testable). */
  def ngramStatsOf(docs: DataFrame, n: Int = 3, topK: Int = 50): DataFrame =
    gramRows(docs, n)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("gram")).limit(topK)

  /** Per-document corpus-informed n-gram profile — the deterministic
    * stand-in for an LM-perplexity quality filter (CCNet-style): a doc
    * whose n-grams are corpus-RARE is unusual text (possible noise), one
    * whose n-grams are corpus-HOT is boilerplate. Both signals are pure
    * integer arithmetic (occurrence counts, one final division), so the
    * score is bit-reproducible across engines — unlike log-probability,
    * whose ln() is not correctly rounded anywhere.
    *
    * Emits per doc: n_grams, n_rare (occurrences whose corpus count ≤
    * rareMax), rare_frac, and boiler_score (mean corpus count of the
    * doc's grams). Shape: the gram table is materialized ONCE and feeds
    * both the corpus model and the join-back (the Curation shared-pass
    * discipline); all three shuffles are equi-keyed.
    *
    * Run at n = L (e.g. 8–50) with rareMax = 1, `1 − rare_frac` IS the
    * exact-substring duplication fraction of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better"): the
    * share of the doc's L-token windows whose exact text occurs more
    * than once in the corpus — window occurrence counting replaces the
    * suffix array, which has no good distributed formulation. */
  def ngramDocScore(spark: SparkSession, dir: String, n: Int = 3,
      rareMax: Int = 1): DataFrame =
    ngramDocScoreOf(t(spark, dir, "documents"), n, rareMax)

  /** DataFrame-level [[ngramDocScore]] (fixture-testable). */
  def ngramDocScoreOf(docs: DataFrame, n: Int = 3,
      rareMax: Int = 1): DataFrame = {
    val grams = gramRows(docs, n)
      .localCheckpoint(true) // shingled once, read by model AND join-back
    val counts = grams.groupBy("gram").agg(count(lit(1)).as("c"))
    grams.join(counts, Seq("gram"))
      .groupBy("doc_id").agg(
        count(lit(1)).cast("int").as("n_grams"),
        sum(when(col("c") <= rareMax, 1L).otherwise(0L)).cast("int")
          .as("n_rare"),
        sum(col("c")).as("sum_c"))
      .select(col("doc_id"), col("n_grams"), col("n_rare"),
        round(col("n_rare").cast("double") / col("n_grams").cast("double"), 6)
          .as("rare_frac"),
        round(col("sum_c").cast("double") / col("n_grams").cast("double"), 6)
          .as("boiler_score"))
      .orderBy("doc_id")
  }

  /** Consecutive letter-run token pairs (doc_id, lang, pos, a, b) —
    * [[gramRows]]'s shape but keeping BOTH tokens and the position, so the
    * LM scorer can left-join model counts per pair and replay the per-doc
    * log-prob sum in document order. Docs with fewer than two tokens emit
    * nothing. */
  private def bigramRows(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), col("lang"),
        posexplode(letterWords(col("text"))).as(Seq("pos", "a")))
      .select(col("doc_id"), col("lang"), col("pos"), col("a"),
        lead(col("a"), 1).over(w).as("b"))
      .filter(col("b").isNotNull)
  }

  /** Add-one-smoothed bigram counts over a training slice: the pair table
    * `c_ab`, the context table `c_a` (= Σ_b c_ab), and the one-row context
    * vocabulary size V. All three are vocabulary-bounded aggregations with
    * map-side partials — model size is O(distinct bigrams), never corpus-
    * sized, which is what makes the scoring join broadcast-able in
    * practice. */
  private def lmCounts(train: DataFrame): (DataFrame, DataFrame, DataFrame) = (
    train.groupBy("a", "b").agg(count(lit(1)).as("c_ab")),
    train.groupBy("a").agg(count(lit(1)).as("c_a")),
    train.agg(countDistinct(col("a")).cast("double").as("v")))

  /** The smoothed conditional probability p(b|a) = (c_ab + 1)/(c_a + V).
    * Both operands are exact small integers in doubles, so the single
    * division is correctly rounded and therefore bit-identical across
    * engines — the model table needs no ulp-margin argument at all. */
  private def lmProb(cab: Column, ca: Column, v: Column): Column =
    (coalesce(cab, lit(0L)) + lit(1.0)) / (coalesce(ca, lit(0L)) + v)

  /** TRAINED bigram language model (the artifact): every bigram of the
    * `trainLang` slice with its counts and add-one-smoothed probability.
    * This is the distributed-friendly core of the CCNet quality filter
    * (Wenzek et al., LREC 2020): CCNet ranks crawl text by KenLM
    * perplexity under a model trained on trusted text; a bigram table IS
    * that model at n = 2, and unlike a KenLM binary it trains as two
    * vocabulary-bounded aggregations. The reference's record gates are
    * fixed predicates over entity fields; a trained corpus-level gate is
    * the 100 TB-pipeline extension of that idea. [[lmPerplexityOf]]
    * applies the model. */
  def lmModelOf(docs: DataFrame, trainLang: String = "en"): DataFrame = {
    // the three count aggregations share ONE materialized bigram pass —
    // without the checkpoint each would re-run the corpus shingle scan
    val bg = bigramRows(docs.filter(col("lang") === trainLang))
      .localCheckpoint(true)
    val (cab, ca, v) = lmCounts(bg)
    cab.join(ca, "a").crossJoin(broadcast(v))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"),
        round(lmProb(col("c_ab"), col("c_a"), col("v")), 9).as("p"))
      .orderBy("a", "b")
  }

  def lmModel(spark: SparkSession, dir: String): DataFrame =
    lmModelOf(t(spark, dir, "documents"))

  /** LM cross-entropy scoring — the REAL log-probability version of the
    * quality signal [[ngramDocScoreOf]] approximates with integer counts:
    * train the [[lmModelOf]] bigram model on the `trainLang` slice, then
    * score EVERY document by per-token cross-entropy −mean ln p(b|a).
    * High xent = text the trusted-language model finds surprising (noise,
    * wrong language, gibberish); low = fluent-under-the-model (CCNet
    * keeps the low-perplexity head). Unseen context backs off to the
    * uniform 1/V via the same smoothing formula (c_ab = c_a = 0); a doc
    * too short to form a bigram scores the uniform-model ceiling ln V
    * with n_bigrams = 0, so every input doc gets a row.
    *
    * Determinism: ln() is within-1-ulp (not bit-identical) across
    * engines, so the per-doc sum is replayed as an ORDERED fold —
    * collect the (pos, lp) pairs, sort by position, left-fold — exactly
    * the [[graft.llm.Similarity.pcaPower]] oracle discipline. Identical
    * op sequence on both engines bounds the drift to ~n·ulp ≈ 1e-13,
    * orders of magnitude inside the round(...,6) margin.
    *
    * Scale: ONE shingle pass ([[Curation]] shared-pass discipline — the
    * bigram table is checkpointed and feeds model AND scorer), two
    * vocabulary-keyed equi-joins (model side is vocabulary-bounded →
    * broadcast in practice), one per-doc aggregation whose state is the
    * doc's own bigram list (bounded by doc length), no global sort
    * except the output contract's ORDER BY. */
  def lmPerplexityOf(docs: DataFrame, trainLang: String = "en"): DataFrame =
    lmCrossPerplexity(docs, docs, trainLang)

  /** [[lmPerplexityOf]] with the TRAIN corpus decoupled from the scored
    * one — the actual CCNet shape: the model learns from the trusted
    * reference text, then scores candidate documents that may be a
    * filtered subset (or a different corpus entirely). When both frames
    * are the same object the bigram pass is shared, not recomputed. */
  def lmCrossPerplexity(docs: DataFrame, train: DataFrame,
      trainLang: String = "en"): DataFrame = {
    val bg = bigramRows(docs).localCheckpoint(true) // feeds model AND scorer
    // a DISTINCT train frame's bigram derivation feeds three count
    // aggregations plus the V probe — checkpoint it like the shared-frame
    // branch, or the shingle scan re-runs up to 4× (ADVICE r6)
    val trainBg = if (train eq docs) bg
      else bigramRows(train.filter(col("lang") === trainLang))
        .localCheckpoint(true)
    val (cab, ca, v) = lmCounts(trainBg.filter(col("lang") === trainLang))
    lmScoreWith(docs, bg, cab, ca, v, trainLang)
  }

  /** The scoring body against EXPLICIT model frames — shared by the
    * train-inline path and the persisted-model path ([[lmSave]] /
    * [[lmPerplexityPersisted]]), so serving from the store replays the
    * identical joins and fold. `bg` is the scored corpus's (checkpointed)
    * bigram table. */
  private def lmScoreWith(docs: DataFrame, bg: DataFrame, cab: DataFrame,
      ca: DataFrame, v: DataFrame, trainLang: String): DataFrame =
    lmScoreRows(docs, bg, cab, ca, v, trainLang)
      .select("doc_id", "n_bigrams", "xent")
      .orderBy("doc_id")

  /** The UNORDERED scoring frame (doc_id, lang, n_bigrams, xent) —
    * consumers that aggregate or window next ([[ccnetBuckets]]) read
    * this directly so they don't pay [[lmScoreWith]]'s output-contract
    * global sort or a second documents scan for the language. */
  private def lmScoreRows(docs: DataFrame, bg: DataFrame, cab: DataFrame,
      ca: DataFrame, v: DataFrame, trainLang: String): DataFrame = {
    // an empty training slice means V = 0 → every lp/xent NULL → a
    // downstream gate would silently drop the whole corpus; a trained
    // model with no training data must fail LOUD instead
    val vRows = v.limit(1).collect()
    require(vRows.nonEmpty && vRows(0).getDouble(0) > 0,
      s"lmPerplexityOf: no '$trainLang' bigrams to train on — " +
        "the model is undefined; pass a trainLang present in the corpus")
    val scored = bg.join(cab, Seq("a", "b"), "left")
      .join(ca, Seq("a"), "left")
      .crossJoin(broadcast(v))
      .withColumn("lp", -log(lmProb(col("c_ab"), col("c_a"), col("v"))))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos"), col("lp"))).as("lps"))
      .select(col("doc_id"),
        size(col("lps")).as("n_bigrams"),
        round(
          aggregate(array_sort(col("lps")), lit(0.0),
            (acc, x) => acc + x.getField("lp")) /
            size(col("lps")).cast("double"),
          6).as("xent"))
    // a doc too short to form a bigram (empty, one word, all digits)
    // must not silently vanish from a quality gate: score it at the
    // uniform-model ceiling ln V — the exact value fully-UNSEEN text
    // gets — with n_bigrams = 0 marking it unscorable-by-content
    docs.select("doc_id", "lang")
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("xent"), round(log(col("v")), 6)).as("xent"))
  }

  /** The process-shared trained bigram LM for `dir`'s documents table
    * (counterpart of [[sharedBpe]]): `q_lm_model` stays the measured
    * build row, `q_lm_persisted` the scratch persisted==inline gate. */
  private def sharedLm(spark: SparkSession,
      dir: String): graft.store.ModelStore =
    graft.store.ModelStore.shared(spark, Seq("lm",
      graft.store.ArtifactCache.tableFingerprint(dir, "documents"),
      "trainLang=en")) { store =>
      lmSave(t(spark, dir, "documents"), store); ()
    }

  def lmPerplexity(spark: SparkSession, dir: String): DataFrame =
    lmPerplexityPersisted(t(spark, dir, "documents"), sharedLm(spark, dir))

  /** CCNet-style quality bucketing (Wenzek et al. 2020): score every
    * document with the trained bigram LM (the [[lmScoreRows]] body served
    * from the process-shared model — zero extra training jobs, no
    * output-contract sort, lang carried through the one scan), then split each
    * LANGUAGE into perplexity tertiles — `head` (most fluent under the
    * trusted-language model), `middle`, `tail` — exactly the partition
    * CCNet keeps/samples/drops. Output is the per-(lang, bucket) ledger:
    * doc count and xent mean/min/max. Tertile assignment is ntile(3)
    * over (xent, doc_id) — the rounded score plus the id tie-break make
    * the bucket boundary engine-deterministic.
    *
    * Scale: the LM score is the lmPerplexity plan verbatim; the ntile
    * window partitions by language (bounded fan-out, skew bounded by the
    * largest language — at production scale swap ntile for per-lang
    * approx xent quantile cut points, one aggregation, no per-lang
    * sort). Final state is |langs|×3 rows. */
  /** (doc_id, lang, n_bigrams, xent, b): the scored frame with its
    * per-language perplexity tertile — the ONE gate body
    * [[ccnetBuckets]] aggregates and [[corpusRelease]] filters, so the
    * tertile tie-break and the serve path cannot diverge between them.
    * The model serves from the process-shared store for `dir`; `docs`
    * may be a filtered subset (per-doc scores depend only on the doc's
    * own bigrams + the model). */
  private def ccnetScoredRows(spark: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val store = sharedLm(spark, dir)
    perLangTertiles(
      lmScoreRows(docs, bigramRows(docs).localCheckpoint(true),
        store.load("bigrams"), store.load("contexts"),
        store.load("vsize"), "en"))
  }

  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    ccnetScoredRows(spark, dir, t(spark, dir, "documents"))
      .groupBy(col("lang"), col("b"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("xent")), 6).as("avg_xent"),
        min(col("xent")).as("min_xent"),
        max(col("xent")).as("max_xent"))
      .select(col("lang"),
        when(col("b") === 1, "head").when(col("b") === 2, "middle")
          .otherwise("tail").as("bucket"),
        col("n_docs"), col("avg_xent"), col("min_xent"), col("max_xent"))
      .orderBy("lang", "bucket")
  }

  /** Corpus RELEASE composition — the end-to-end curation plan a
    * release pipeline runs, as ONE declarative DataFrame graph:
    * exact-dedup keep-one (min doc_id per text hash) → CCNet gate
    * (keep each language's head+middle perplexity tertiles under the
    * process-shared bigram LM — zero training jobs) → token-balanced
    * output-shard ledger ([[graft.llm.Fusion.globalRank]]'s two-phase
    * rank dealt round-robin, the [[graft.llm.Sampling.shardPlan]]
    * discipline over the survivors). Per-doc LM scores depend only on
    * the doc's own bigrams + the model, so scoring the survivor subset
    * equals scoring everything and filtering — the oracle does the
    * latter over the shared `lmScoreCte` chain.
    *
    * Scale: the dedup keep is one hash aggregation + equi-join; the
    * gate is the lmPerplexity serve plan plus a per-lang ntile; the
    * only global structure is the bucketed shard rank (driver sees the
    * token histogram only). */
  def corpusRelease(spark: SparkSession, dir: String,
      shards: Int = 8): DataFrame = {
    val docs = t(spark, dir, "documents")
    val survivors = docs
      .join(graft.llm.Dedup.keepOneIds(docs), Seq("doc_id"))
      .select("doc_id", "lang", "text").localCheckpoint(true)
    val scored = lmScoreRowsPersisted(survivors, sharedLm(spark, dir))
      .join(survivors.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tok")),
        Seq("doc_id"))
    releaseManifestFrom(scored, shards)
  }

  /** The tertile gate + token-balanced shard ledger over a SCORED
    * survivor frame (doc_id, lang, xent, n_tok) — the ONE
    * release-manifest body shared by the batch composition
    * ([[corpusRelease]]) and the incremental ledger
    * ([[graft.streaming.StreamingRelease.releaseManifest]]), so the
    * tertile tie-break and the shard deal cannot diverge between them.
    * The tertile is a GLOBAL per-language rank — the one release step
    * that cannot be computed per increment — which is exactly why the
    * incremental design stores per-doc scores and defers only this
    * aggregation to release time. */
  private[graft] def releaseManifestFrom(scored: DataFrame,
      shards: Int): DataFrame = {
    val gated = tertileKeep(scored).select("doc_id", "n_tok")
    Fusion.globalRank(gated, col("n_tok"), col("doc_id"),
        col("n_tok"), "rk")
      .withColumn("shard", ((col("rk") - 1) % shards).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("tot_tokens"))
      .orderBy("shard")
  }

  /** The head+middle tertile survivors — [[perLangTertiles]] filtered
    * to b ≤ 2. Bit-equal to the ntile(3) ≤ 2 gate the release oracle
    * replays (q_corpus_release / q_corpus_release_inc hash-pin it). */
  private def tertileKeep(scored: DataFrame): DataFrame =
    perLangTertiles(scored).filter(col("b") <= 2).drop("b")

  /** The doc_ids the release SHIPS from a scored survivor frame — the
    * tertile gate's membership, exposed so
    * [[graft.streaming.StreamingRelease.releaseMembers]] reports what
    * the manifest actually releases rather than raw ledger membership
    * (ADVICE r13: the diff otherwise reported tertile-rejected docs as
    * added/removed). */
  private[graft] def releaseKeptIds(scored: DataFrame): DataFrame =
    tertileKeep(scored).select("doc_id")

  /** Per-language perplexity tertile assignment — ntile(3) over
    * (xent, doc_id) per lang — WITHOUT a per-language global sort: the
    * budgetSelect two-phase discipline keyed on the score itself (the
    * scale path the round-9 ccnetBuckets note called for; at 100 TB
    * with a dominant language the per-lang ntile window is a
    * single-partition killer).
    *
    *   1. Histogram per (lang, ⌊xent·64⌋) — floor is order-aligned
    *      with the rank key and xent ties share a bucket, so cumulative
    *      counts place every BUCKET's rank span exactly; the driver
    *      sees |langs|·O(ln V·64) narrow rows, never documents.
    *   2. ntile's front-loaded sizes give exact cut RANKS per lang
    *      (cut1 = ⌊n/3⌋ + [n mod 3 ≥ 1], cut2 = 2⌊n/3⌋ + [≥1] + [≥2]).
    *      A bucket whose whole rank span sits inside one tertile takes
    *      its label with a FILTER + literal; only the ≤ 2 buckets per
    *      language that STRADDLE a cut are window-ranked, each
    *      partition ≈ n_l/buckets rows.
    *
    * Worst case — a language whose scores all quantize into one bucket
    * (uniform-score degeneracy) — falls back to exactly the old per-lang
    * sort and no worse. Output (scored columns + b) is bit-equal to the
    * ntile form: q_ccnet_buckets' per-bucket avg/min/max hash-pins the
    * assignment, the release rows pin the b ≤ 2 gate. */
  private def perLangTertiles(scored: DataFrame): DataFrame = {
    val d = scored.withColumn("bq",
      floor(col("xent") * 64).cast("long")).localCheckpoint(true)
    val hist = d.groupBy("lang", "bq").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plans = hist.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      val nl = rows.map(_._3).sum
      val q3 = nl / 3; val r3 = nl % 3
      val cut1 = q3 + (if (r3 >= 1) 1L else 0L)
      val cut2 = cut1 + q3 + (if (r3 >= 2) 1L else 0L)
      def bOf(pos: Long): Int =
        if (pos <= cut1) 1 else if (pos <= cut2) 2 else 3
      var acc = 0L
      rows.sortBy(_._2).map { case (_, bq, n) =>
        val bFirst = bOf(acc + 1); val bLast = bOf(acc + n)
        val row = (lang, bq, acc,
          if (bFirst == bLast) bFirst else 0, cut1, cut2)
        acc += n
        row
      }
    }
    val spark = scored.sparkSession
    import spark.implicits._
    val planDf = broadcast(
      plans.toDF("lang", "bq", "base", "uniform", "cut1", "cut2"))
    val joined = d.join(planDf, Seq("lang", "bq"))
    val uniform = joined.filter(col("uniform") > 0)
      .withColumn("b", col("uniform"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "bq").orderBy(col("xent"), col("doc_id"))
    val straddle = joined.filter(col("uniform") === 0)
      .withColumn("__pos", col("base") + row_number().over(wb))
      .withColumn("b", when(col("__pos") <= col("cut1"), 1)
        .when(col("__pos") <= col("cut2"), 2).otherwise(3))
      .drop("__pos")
    uniform.unionByName(straddle)
      .drop("bq", "base", "uniform", "cut1", "cut2")
  }

  /** Per-doc LM scores (doc_id, lang, n_bigrams, xent) against a
    * PERSISTED model, unsorted — the pointwise scoring body the
    * incremental release ingests each microbatch through (a doc's
    * score depends only on its own bigrams + the frozen model, so
    * scoring increments separately IS scoring their union). */
  private[graft] def lmScoreRowsPersisted(docs: DataFrame,
      store: graft.store.ModelStore, trainLang: String = "en"): DataFrame =
    lmScoreRows(docs, bigramRows(docs).localCheckpoint(true),
      store.load("bigrams"), store.load("contexts"), store.load("vsize"),
      trainLang)

  /** Public handle on the process-shared LM for `dir` — the frozen
    * model the incremental release's driver-contract query scores
    * against (its batch parity target [[corpusRelease]] serves from the
    * same store, so the two rows share one training job). */
  private[graft] def sharedLmFor(spark: SparkSession,
      dir: String): graft.store.ModelStore = sharedLm(spark, dir)

  /** Persist the trained bigram LM (VERDICT r6 #1): "bigrams" (a, b,
    * c_ab), "contexts" (a, c_a), "vsize" (v) — the three count frames
    * [[lmCounts]] derives, i.e. exactly the model state the scorer
    * joins. Integer counts + one exact double round-trip bit-exactly
    * through parquet. Returns the store version. */
  def lmSave(docs: DataFrame, store: graft.store.ModelStore,
      trainLang: String = "en"): Long = {
    val bg = bigramRows(docs.filter(col("lang") === trainLang))
      .localCheckpoint(true)
    val (cab, ca, v) = lmCounts(bg)
    store.save(Map("bigrams" -> cab, "contexts" -> ca, "vsize" -> v))
  }

  /** Score a corpus against a PERSISTED LM — zero training jobs: the
    * model tables load from the store and broadcast into the scorer.
    * Bit-identical to [[lmPerplexityOf]] when the store was trained on
    * the same corpus ([[lmScoreWith]] is the one scoring body). */
  def lmPerplexityPersisted(docs: DataFrame, store: graft.store.ModelStore,
      trainLang: String = "en"): DataFrame =
    lmScoreWith(docs, bigramRows(docs).localCheckpoint(true),
      store.load("bigrams"), store.load("contexts"), store.load("vsize"),
      trainLang)

  /** Oracle row: train into a scratch store, score FROM the store,
    * hash-match `q_lm_perplexity`'s oracle — persisted == in-query. */
  def lmPersistedQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.store.ModelStore.scratch(spark, "lm") { store =>
      lmSave(docs, store)
      lmPerplexityPersisted(docs, store)
    }
  }

  /** Feature-hashing text embeddings (the "hashing trick", Weinberger et
    * al., ICML 2009): each letter-run token hashes to a dimension
    * j = h60(t) mod dim with a ±1 sign from an independent hash bit;
    * the doc's vector is the signed token-count histogram, L2-normalized.
    * No trained model, no vocabulary table — the embedder a pipeline can
    * run on day one, and the BRIDGE from the text family into the
    * embedding family: the output feeds [[Similarity.annPairsOf]] /
    * k-NN / PQ unchanged (see [[textEmbedVectors]]).
    *
    * Determinism: components are exact integer sums; the norm is ONE
    * IEEE sqrt of an exact integer (correctly rounded everywhere) and
    * each division is correctly rounded — bit-exact cross-engine with
    * no ordered-fold machinery.
    *
    * Scale: one explode + one map-side-combinable aggregation (the
    * conditional-sum pivot keeps reduce state at dim longs per doc),
    * zero joins. */
  def embedTextOf(docs: DataFrame, dim: Int = 16): DataFrame = {
    val h = docs
      .select(col("doc_id"),
        explode(letterWords(col("text"))).as("t"))
      .select(col("doc_id"),
        pmod(Dedup.h60(concat(lit("emb#"), col("t"))), lit(dim)).as("j"),
        when(pmod(Dedup.h60hi(concat(lit("emb#"), col("t"))), lit(2)) === 0,
          lit(1L)).otherwise(lit(-1L)).as("sgn"))
    val sums = (0 until dim).map(k =>
      coalesce(sum(when(col("j") === k, col("sgn"))), lit(0L)).as(s"e$k"))
    val p = h.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val ssq = (0 until dim).map(k => col(s"e$k") * col(s"e$k"))
      .reduce(_ + _)
    val norm = sqrt(ssq.cast("double"))
    val out = (0 until dim).map(k =>
      round(when(ssq === 0, lit(0.0))
        .otherwise(col(s"e$k").cast("double") / norm), 9).as(s"e$k"))
    p.select(col("doc_id") +: out: _*).orderBy("doc_id")
  }

  def embedText(spark: SparkSession, dir: String): DataFrame =
    embedTextOf(t(spark, dir, "documents"))

  /** [[embedTextOf]] reshaped to the embeddings-table contract
    * (vec_id, embedding: ARRAY<FLOAT>) so every ANN/dedup/PQ operator
    * consumes derived text vectors exactly like stored ones. */
  def textEmbedVectors(docs: DataFrame, dim: Int = 16): DataFrame = {
    val e = embedTextOf(docs, dim)
    e.select(col("doc_id").as("vec_id"),
      array((0 until dim).map(k => col(s"e$k").cast("float")): _*)
        .as("embedding"))
  }

  /** Character-entropy quality signal over the corpus via the native
    * [[graft.functions.CharEntropy]] expression: bits per codepoint,
    * flagging base64/hex/binary-ish blobs (high) and repeated-character
    * spam (low) that token-level stats miss. A single whole-stage-codegen
    * projection over the scan — zero shuffles, the [[tokenStats]]
    * posture. The flag thresholds bracket the natural-language band. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).as("n_cp"),
        round(graft.functions.CharEntropy.char_entropy(col("text")), 6)
          .as("ent"))
      .withColumn("flag",
        when(col("ent") < 2.0, "low_entropy")
          .when(col("ent") > 5.2, "high_entropy")
          .otherwise("ok"))
      .orderBy("doc_id")

  /** Corpus DATA CARD ("Datasheets for Datasets", Gebru et al. 2021): the
    * one-row-per-metric composition summary a dataset release ships —
    * sizes, language/source breadth, exact-duplicate fraction, heuristic
    * quality keep rate, mean document length. ONE logical aggregation
    * over the scan; `stack` pivots the row to (metric, value). Honest
    * cost note: the three EXACT count-distincts plan via Expand (one
    * row replica per distinct aggregate — ~3× the scan through the
    * first shuffle, with the md5 distinct shuffling every text hash);
    * that is the price of exact breadth metrics on a release card run
    * once per dataset — at 100 TB swap in approx_count_distinct (HLL)
    * if 2% error is acceptable. Counts are exact integers in doubles;
    * fractions are single correctly-rounded divisions — bit-exact with
    * no ordered-fold machinery. */
  def dataCard(spark: SparkSession, dir: String): DataFrame =
    dataCardOf(t(spark, dir, "documents"))

  def dataCardOf(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val agg1 = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(tokens(col("text")))).cast("double").as("n_tokens"),
      countDistinct(col("lang")).cast("double").as("n_langs"),
      countDistinct(col("source")).cast("double").as("n_sources"),
      countDistinct(md5(col("text"))).cast("double").as("n_uniq_text"),
      sum(when(qualityGate(toks), 1L).otherwise(0L))
        .cast("double").as("n_quality"))
    agg1.select(
      round(col("n_tokens") / col("n_docs"), 6).as("mean_doc_tokens"),
      round(lit(1.0) - col("n_uniq_text") / col("n_docs"), 6)
        .as("exact_dup_frac"),
      round(col("n_quality") / col("n_docs"), 6).as("quality_keep_frac"),
      col("n_docs"), col("n_tokens"), col("n_langs"), col("n_sources"))
      .selectExpr(
        """stack(7,
          |  'n_docs', n_docs,
          |  'n_tokens', n_tokens,
          |  'n_langs', n_langs,
          |  'n_sources', n_sources,
          |  'mean_doc_tokens', mean_doc_tokens,
          |  'exact_dup_frac', exact_dup_frac,
          |  'quality_keep_frac', quality_keep_frac) AS (metric, value)"""
          .stripMargin)
      .orderBy("metric")
  }

  /** Deterministic document fingerprint: polynomial rolling hash
    * h = fold(h*31 + codepoint) mod 1e9+7 over characters. Portable across
    * engines (no murmur dependence). */
  def fingerprintCol(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), fingerprintCol(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Unicode NFC normalization over the corpus via the native
    * [[graft.functions.UnicodeNormalize]] expression — the cleanup pass a
    * crawl pipeline runs so decomposed and precomposed spellings share one
    * token/shingle/dedup key. The fixture text is ASCII, so the query
    * FABRICATES real matches (the PII-redaction pattern): a combining
    * grave (U+0300) is injected after every 'a', which NFC recomposes to
    * 'à' — the codepoint counts before/after prove actual recomposition
    * rather than a vacuous pass-through. */
  def unicodeNorm(spark: SparkSession, dir: String): DataFrame = {
    val mangled = regexp_replace(col("text"), "a", "a\u0300")
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(mangled).as("len_raw"),
        graft.functions.UnicodeNormalize.unicode_normalize(mangled, "NFC")
          .as("norm_text"))
      .withColumn("len_nfc", length(col("norm_text")))
      .orderBy("doc_id")
  }

  /** Inverted index build: term \u2192 document frequency + the first
    * `cap` postings (sorted doc_ids) \u2014 the physical artifact behind
    * [[tfidf]]/[[bm25]] serving (a keyword-search engine reads posting
    * blocks, not a scan). One distinct (term, doc) shuffle, then a
    * vocabulary-cardinality aggregate; postings are CAPPED per term so
    * a stopword-like term can't materialize a corpus-sized array in one
    * row (real indexes chunk postings into fixed blocks for the same
    * reason \u2014 this emits the first block). df stays exact and uncapped. */
  def invertedIndexOf(docs: DataFrame, cap: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(letterWords(col("text"))).as("term"))
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        slice(sort_array(collect_set(col("doc_id"))), 1, cap).as("postings"))
      .orderBy("term")

  /** Oracle-facing serving shape of [[invertedIndexOf]]: the postings
    * block serializes to a '|'-joined string (the driver's compare
    * hashes scalar cells; bare arrays crash its pandas sort — same
    * discipline as q_array_agg). The typed-array artifact stays
    * available via [[invertedIndexOf]]. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndexOf(t(spark, dir, "documents"))
      .withColumn("postings",
        concat_ws("|", transform(col("postings"), _.cast("string"))))
}
