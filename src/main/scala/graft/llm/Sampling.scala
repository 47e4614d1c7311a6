package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deterministic dataset splitting for training pipelines.
  *
  * Train/val/test assignment must be a pure function of a STABLE key —
  * reproducible across runs, engines, partition layouts, and incremental
  * re-ingests. `rand()`/`sample()` fail all four (they reseed per task and
  * change under repartition); hashing the document id fails none. The same
  * rule lets two independent pipelines agree on the split without sharing
  * state — exactly what a 100 TB corpus rebuilt incrementally needs.
  */
object Sampling {

  /** THE split rule, defined once: bucket = h60(md5 of the id) mod 100.
    * Every consumer (standalone hashSplit, the curation composition) must
    * route through these two expressions, or two pipelines could silently
    * disagree on train/val/test membership. */
  def splitBucket(docId: Column): Column =
    Dedup.h60(docId.cast("string")) % 100

  /** train < 80 ≤ val < 90 ≤ test over a [[splitBucket]] value. */
  def splitName(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** 80/10/10 split by md5 of the doc id. A pure projection — zero
    * shuffle, embarrassingly parallel, and the parquet scan reads only
    * `doc_id`. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), splitBucket(col("doc_id")).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        splitName(col("bucket")).as("split"))
      .orderBy("doc_id")

  /** Exactly-k-per-stratum deterministic sample ("10k eval docs per
    * language"): rank docs inside each stratum by md5 of the id (a
    * uniform, reproducible shuffle order) and keep the first k.
    *
    * Skew note for 100 TB: a naive per-stratum window puts ALL of a hot
    * stratum ('en' is most of a web corpus) through one partition. This
    * runs two phases: phase 1 takes the top-k per (stratum, salt) over 32
    * salts — bounding any partition at 1/32nd of the stratum — and phase 2
    * re-ranks the ≤ 32·k phase-1 survivors per stratum. Identical result,
    * worst partition 32× smaller; increase salts with cluster width. */
  def stratifiedSample(spark: SparkSession, dir: String,
      k: Int = 20, salts: Int = 32): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("r"))
      .withColumn("salt", Dedup.h60(concat(lit("s#"),
        col("doc_id").cast("string"))) % salts)
    val w1 = Window.partitionBy("lang", "salt").orderBy("r", "doc_id")
    val w2 = Window.partitionBy("lang").orderBy("r", "doc_id")
    docs
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
      .withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
      .select(col("doc_id"), col("lang"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  /** Source-weighted data MIXING: keep a deterministic fraction of each
    * source ("web 25%, curated 100%" — the mixture step before training).
    * Membership is a pure function of the stable id — [[splitBucket]]'s
    * rule over a mix-specific salt, so the mix is reproducible across
    * runs/engines/partition layouts AND independent of the train/val/test
    * split (different salt ⇒ uncorrelated bucket). Fractions are in
    * integer percent; unlisted sources default to 0 (dropped).
    *
    * Scale: a pure projection + filter — zero shuffle, and the scan reads
    * only (doc_id, source). */
  def sourceMix(spark: SparkSession, dir: String,
      pctBySource: Map[String, Int] = Map(
        "src0" -> 100, "src1" -> 50, "src2" -> 25)): DataFrame = {
    val pct = pctBySource.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col("source") === s, lit(p)).otherwise(acc)
    }
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (Dedup.h60(concat(lit("mix#"), col("doc_id").cast("string"))) % 100)
          .as("mix_bucket"))
      .withColumn("keep_pct", pct)
      .filter(col("mix_bucket") < col("keep_pct"))
      .select(col("doc_id"), col("source"), col("mix_bucket"))
      .orderBy("doc_id")
  }

  /** Temperature-flattened LANGUAGE mixing — the mT5/XLM-R α-sampling
    * rule (Xue et al. 2021; Conneau et al. 2020): with α ∈ [0, 1] the
    * keep rate per language is r_l = (n_min / n_l)^(1−α) — α = 1 keeps
    * the natural distribution, α = 0 downsamples every language to the
    * rarest one, values between flatten the head without erasing it.
    * Membership is the [[sourceMix]] rule: a salted hash bucket under an
    * integer ppm threshold, reproducible across runs/engines/layouts.
    *
    * Determinism: at the α = 0.5 default the rate is an IEEE `sqrt` —
    * CORRECTLY ROUNDED on every engine (unlike `pow`, which is only
    * within-1-ulp), so floor(r·1e6) is bit-exact cross-engine with no
    * tolerance argument; other α values take the pow path and carry the
    * 1-ulp caveat (a 1-in-10⁶-per-doc threshold flip risk an oracle-gated
    * pipeline should not take).
    *
    * Scale: the language histogram is a handful of rows (map-side
    * partials), broadcast back; the corpus pass is a zero-shuffle
    * projection + filter. */
  def temperatureMixOf(docs: DataFrame, alpha: Double = 0.5,
      salt: String = "tmix"): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val nmin = counts.agg(min("n_l").as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_l").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1 - alpha))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(nmin))
      .withColumn("rate_ppm", floor(rate * lit(1e6)).cast("long"))
      .withColumn("bucket",
        Dedup.h60(concat(lit(s"$salt#"), col("doc_id").cast("string")))
          % 1000000L)
      .filter(col("bucket") < col("rate_ppm"))
      .select(col("doc_id"), col("lang"), col("bucket"), col("rate_ppm"))
      .orderBy("doc_id")
  }

  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMixOf(t(spark, dir, "documents"))

  /** Token-BUDGET data selection: keep the best documents — ranked by the
    * TRAINED quality classifier ([[Classifier.clfScore]]), ties to the
    * smaller doc_id — until the corpus token budget is spent (the
    * "select N tokens of the best data" step between scoring and
    * training). The kept set is exactly the prefix of the
    * (score DESC, doc_id ASC) order whose running token sum stays ≤
    * budget.
    *
    * Scale: the naive formulation is a GLOBAL running-sum window — one
    * partition sorting the corpus. This is TWO-PHASE instead: per-score
    * token totals (integer scores → a small histogram with map-side
    * partials) come to the driver, which finds the boundary score and
    * the remaining budget; whole score-groups above the boundary pass
    * with a filter, and only the boundary GROUP runs a running-sum
    * window (partitioned by its score — never the corpus). The
    * [[stratifiedSample]] two-phase discipline, proven equivalent to the
    * naive window by spec. */
  def budgetSelectOf(docs: DataFrame, budget: Long = 10000L): DataFrame = {
    // n_tok comes off the classifier's checkpointed feature frame
    // (x1 + 25) — re-tokenizing the corpus here would be a second full
    // scan plus a join for a number the features already hold
    val scored = Classifier.scoredTokens(docs)
      .localCheckpoint(true) // histogram AND selection read it
    val hist = scored.groupBy("score").agg(sum("n_tok").as("stok"))
      .collect()
      .map(r => r.getAs[Long]("score") -> r.getAs[Long]("stok"))
      .sortBy { case (s, _) => -s }
    var acc = 0L
    var boundary: Option[(Long, Long)] = None // (score, remaining budget)
    var fullMin = Long.MaxValue // lowest score whose group is FULLY kept
    hist.takeWhile { case (s, st) =>
      if (acc + st <= budget) { acc += st; fullMin = s; true }
      else { boundary = Some((s, budget - acc)); false }
    }
    val above =
      if (fullMin == Long.MaxValue) scored.filter(lit(false))
      else scored.filter(col("score") >= fullMin)
    val atBoundary = boundary match {
      case None => scored.filter(lit(false))
      case Some((bs, rem)) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("score").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        scored.filter(col("score") === bs)
          .withColumn("cum", sum("n_tok").over(w))
          .filter(col("cum") <= rem)
          .drop("cum")
    }
    above.unionByName(atBoundary).orderBy("doc_id")
  }

  def budgetSelect(spark: SparkSession, dir: String): DataFrame =
    budgetSelectOf(t(spark, dir, "documents"))

  /** Deterministic epoch shuffle: every doc gets a reproducible
    * (shard, pos) training order — a pure function of (salt, doc_id), so
    * a rerun, a different engine, or a resumed job all read the corpus
    * in the same pseudo-random order, and a new salt is a fresh epoch.
    * The sort is PER SHARD (row_number within shard over the hash),
    * never a global single-partition sort; shards are the parallel read
    * units a trainer consumes. */
  def globalShuffleOf(docs: DataFrame, salt: String = "ep0",
      nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    docs.select(col("doc_id"),
        Dedup.h60(concat(lit(s"shuf#$salt#"),
          col("doc_id").cast("string"))).as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "shard", "pos")
  }

  def globalShuffle(spark: SparkSession, dir: String): DataFrame =
    globalShuffleOf(t(spark, dir, "documents")).orderBy("shard", "pos")

  /** Deterministic contrastive NEGATIVE sampling: k negatives per doc,
    * drawn from the doc's shuffle shard at fixed strides — uniform with
    * respect to content (the shuffle hash is content-blind), fully
    * reproducible, and pure equi-joins: explode k, add j·stride to the
    * doc's position mod the shard size, join the position table back.
    * No RNG, no cartesian, no global sort. Self-pairs (tiny shards
    * wrapping onto themselves) are filtered; j disambiguates the rare
    * duplicate negative when k·stride wraps. */
  def negativePairsOf(docs: DataFrame, k: Int = 2, salt: String = "neg",
      nShards: Int = 4): DataFrame = {
    val shuf = globalShuffleOf(docs, salt, nShards).localCheckpoint(true)
    val sizes = shuf.groupBy("shard").agg(count(lit(1)).cast("int").as("sz"))
    val stride = greatest(floor(col("sz") / lit(k + 1.0)).cast("int"), lit(1))
    val targets = shuf.join(broadcast(sizes), Seq("shard"))
      .select(col("doc_id"), col("shard"), col("pos"), col("sz"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("tpos",
        ((col("pos") - 1 + col("j") * stride) % col("sz")) + 1)
    targets.join(shuf.select(col("shard"), col("pos").as("tpos"),
        col("doc_id").as("neg_id")), Seq("shard", "tpos"))
      .filter(col("neg_id") =!= col("doc_id"))
      .select("doc_id", "j", "neg_id")
      .orderBy("doc_id", "j")
  }

  def negativePairs(spark: SparkSession, dir: String): DataFrame =
    negativePairsOf(t(spark, dir, "documents"))

  /** Epoch plan under a token budget — the data-constrained-scaling
    * recipe (Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models"): when the training budget exceeds the unique
    * corpus, REPEAT sources, but cap the repeats (returns on a 5th+
    * epoch of the same data decay to ~zero in the paper), and spread
    * the budget across sources by a tempered weight so small sources
    * aren't drowned (the [[temperatureMixOf]] α = 0.5 flattening, here
    * applied to token mass).
    *
    *   w_s      = √A_s / Σ√A_s     (A_s = available tokens of source s)
    *   epochs_s = min(maxEpochs, B·w_s / A_s)
    *   realized = epochs_s · A_s
    *
    * Scale: one token-count aggregation (map-side partials; the only
    * corpus pass), then source-cardinality-bounded arithmetic. The
    * √-weight normalizer is a SUM OF DOUBLES across sources — made
    * order-free by fixed-point quantization (⌊√A·10⁶⌋ summed as
    * integers, the [[graft.operators.PageRank]] discipline), so the
    * plan is bit-identical in any engine and under any shuffle order.
    */
  def epochPlanOf(docs: DataFrame, budgetFactor: Double = 2.0,
      maxEpochs: Double = 4.0): DataFrame = {
    val avail = docs
      .select(col("source"), size(TextOps.tokens(col("text"))).as("nt"))
      .groupBy("source").agg(sum(col("nt").cast("long")).as("avail_tok"))
    // quantized √-weights: exact integer sum, then one double division
    val q = avail.withColumn("q",
      floor(sqrt(col("avail_tok").cast("double")) * lit(1e6)).cast("long"))
    val tot = q.agg(sum("q").as("qtot"), sum("avail_tok").as("atot"))
    q.crossJoin(broadcast(tot))
      .withColumn("weight",
        col("q").cast("double") / col("qtot").cast("double"))
      .withColumn("epochs",
        least(lit(maxEpochs),
          lit(budgetFactor) * col("atot").cast("double") * col("weight") /
            col("avail_tok").cast("double")))
      .select(col("source"), col("avail_tok"), col("weight"), col("epochs"),
        floor(col("epochs") * col("avail_tok").cast("double")).cast("long")
          .as("realized_tok"))
      .orderBy("source")
  }

  def epochPlan(spark: SparkSession, dir: String): DataFrame =
    epochPlanOf(t(spark, dir, "documents"))

  /** Weighted sampling without replacement, derandomized: A-ES
    * (Efraimidis & Spirtakis 2006) keeps the k items with the largest
    * u^(1/w) for uniform u — equivalently the largest ln(u)/w, which is
    * what we rank on (ln is engine-portable where pow is not). The
    * uniform draw is the md5-hash of the id mapped into (0, 1] — the
    * engine-wide no-RNG rule — so the sample is a pure function of
    * (id, weight): reproducible across runs, engines, partition
    * layouts, and incremental re-ingests, exactly like [[hashSplit]].
    *
    * Scale: one projection + a TakeOrdered head — no global sort, no
    * state. Weighting by n_chars gives the standard length-proportional
    * document draw. */
  def weightedSampleOf(docs: DataFrame, k: Int = 100,
      salt: String = "ws"): DataFrame = {
    val u = (Dedup.h60(concat(lit(s"$salt#"), col("doc_id").cast("string")))
      .cast("double") + lit(1.0)) / lit((1L << 60).toDouble)
    // the key is RANKED on but not EMITTED: ln differs by 1 ulp between
    // engines on some inputs (the LM family's known caveat), which is
    // harmless to the top-k selection (distinct documents' keys are far
    // more than 1 ulp apart) but would fail a bit-exact value compare
    docs
      .select(col("doc_id"), col("n_chars").cast("double").as("w"),
        (log(u) / col("n_chars").cast("double")).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "w")
      .orderBy("doc_id")
  }

  /** Temperature mixing on EFFECTIVE corpus mass: sampling weights from
    * the soft-dedup ledger's effective char counts
    * ([[graft.llm.Dedup.softDedup]] — each n-duplicate cluster carries
    * total mass 1), flattened with the alpha=0.5 temperature exponent —
    * so duplicates cannot buy their source extra sampling weight (raw
    * counts over-sample boilerplate-heavy sources; cf. the multilingual
    * alpha-mixing recipe of XLM-R / mC4 applied to effective mass).
    * Determinism: the ledger's eff_chars is an already-rounded decimal
    * (hash-pinned row), the flatten is ONE IEEE sqrt, and the shares
    * round to 6 against sub-ulp sum noise.
    * Scale: the softDedup plan + a |sources|-row broadcast total. */
  def mixLedger(spark: SparkSession, dir: String): DataFrame = {
    val ledger = graft.llm.Dedup.softDedup(spark, dir)
      .select(col("source"), col("eff_chars"))
      .withColumn("w", sqrt(col("eff_chars")))
    val tot = ledger.agg(sum("w").as("tw"), sum("eff_chars").as("te"))
    ledger.crossJoin(broadcast(tot))
      .select(col("source"), col("eff_chars"),
        round(col("eff_chars") / col("te"), 6).as("p_raw"),
        round(col("w") / col("tw"), 6).as("p_mix"))
      .orderBy("source")
  }

  /** Balanced output-shard plan: docs sorted by token count descending
    * are dealt round-robin over `shards` writers, so every shard's
    * token total lands within ONE max-document of every other
    * (sorted-descending round-robin telescopes: total_i − total_j ≤
    * the largest item) — the write-side bin packing that keeps output
    * files uniform for the next reader, without a driver-side packer.
    * Output is the per-shard ledger (docs, token totals, size range).
    *
    * Scale: the global order uses [[Fusion.globalRank]]'s two-phase
    * bucket discipline (driver sees only the token-count histogram,
    * never rows; within-bucket ranks are distributed) — no
    * SinglePartition window. */
  def shardPlan(spark: SparkSession, dir: String,
      shards: Int = 8): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tok"))
    Fusion.globalRank(docs, col("n_tok"), col("doc_id"),
        col("n_tok"), "rk")
      .withColumn("shard", ((col("rk") - 1) % shards).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("tot_tokens"),
        min("n_tok").as("min_tok"), max("n_tok").as("max_tok"))
      .orderBy("shard")
  }

  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSampleOf(t(spark, dir, "documents"))

  /** Split-leakage AUDIT: how much eval data is secretly training data?
    * Under the doc-id-keyed 80/10/10 split ([[hashSplit]]), an
    * exact-duplicate cluster that spans the boundary leaks its content
    * into eval — the classic train/test contamination a web corpus
    * exhibits by default (near-30% of common eval sets per Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better").
    * Reports, per eval split, the fraction of docs whose exact text hash
    * also appears in train. [[contentSplit]] / [[neardupSplit]] are the
    * fixes this row motivates.
    *
    * Scale: one projection (doc_id, md5(text)), a distinct over the
    * train hashes, one equi-join on the hash, a 2-row roll-up — the
    * exact-dedup shuffle class, nothing new. The train side is ~80% of
    * the corpus so the join shuffles both sides on h; no broadcast. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"),
        splitName(splitBucket(col("doc_id"))).as("split"))
    val trainH = d.filter(col("split") === "train").select("h").distinct()
      .withColumn("in_train", lit(1))
    d.filter(col("split") =!= "train")
      .join(trainH, Seq("h"), "left")
      .withColumn("leak", coalesce(col("in_train"), lit(0)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("leak")).cast("bigint").as("n_leaked"),
        round(avg(col("leak").cast("double")), 6).as("leak_rate"))
      .orderBy("split")
  }

  /** CONTENT-keyed split: the [[splitBucket]] rule over the text itself
    * instead of the id, so every byte-identical copy of a document lands
    * in the same split by construction — exact-dup leakage
    * ([[splitLeakage]]) is structurally zero, with no join against a
    * cluster table. The standard fix when only exact duplication matters.
    *
    * Scale: a pure projection (one md5 per row) — zero shuffle, and the
    * scan reads only (doc_id, text). */
  def contentSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), splitBucket(col("text")).as("bucket"))
      .withColumn("split", splitName(col("bucket")))
      .orderBy("doc_id")

  /** Proportional SOURCE-frequency cap (the C4/RefinedWeb hot-domain
    * guard): no source may exceed `pct`% of the released corpus. Kept
    * docs per source are the first floor(pct%·N) in the deterministic
    * md5-of-id order — a reproducible "random" draw, the engine-wide
    * no-RNG rule. Sources under the cap pass whole.
    *
    * Scale: the naive form is a per-source window rank over the FULL
    * source — a hot domain (most of a web crawl) through one partition.
    * This is the [[budgetSelectOf]] two-phase discipline keyed on the
    * hash itself: the rank order is (h, doc_id) and the first two hex
    * chars of h (256 buckets) are ORDER-ALIGNED with it, so a per-(source, hex-prefix)
    * histogram (|sources|·256 rows to the driver) locates each source's
    * boundary bucket; full buckets pass with a filter and only the
    * boundary BUCKET is window-ranked — partition bounded by n_s/256
    * (longer prefixes at larger scale). Spec + oracle pin it equal to
    * the naive window. */
  def sourceCapOf(docs: DataFrame, pct: Int = 3): DataFrame = {
    val d = docs
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("b", substring(col("h"), 1, 2))
      .localCheckpoint(true) // histogram AND both keep paths read it
    val total = d.count()
    val cap = (total * pct) / 100 // floor(pct% · N): ints, exact
    val hist = d.groupBy("source", "b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // per source: the first bucket where cumulative count crosses cap
    // ("g" > every hex char = no boundary, source passes whole)
    val plans = hist.groupBy(_._1).map { case (src, rows) =>
      var acc = 0L; var boundary = "g"; var rem = 0L
      rows.sortBy(_._2).foreach { case (_, b, n) =>
        if (boundary == "g") {
          if (acc + n > cap) { boundary = b; rem = cap - acc }
          else acc += n
        }
      }
      (src, boundary, rem)
    }.toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val planDf = broadcast(plans.toDF("source", "boundary", "rem"))
    val joined = d.join(planDf, Seq("source"))
    val full = joined.filter(col("b") < col("boundary"))
    val wb = Window.partitionBy("source").orderBy("h", "doc_id")
    val atBoundary = joined.filter(col("b") === col("boundary"))
      .withColumn("rk", row_number().over(wb))
      .filter(col("rk") <= col("rem"))
      .drop("rk")
    full.unionByName(atBoundary)
      .select("doc_id", "source").orderBy("doc_id")
  }

  def sourceCap(spark: SparkSession, dir: String): DataFrame =
    sourceCapOf(t(spark, dir, "documents"))

  /** NEAR-dup-cluster-keyed split: the [[splitBucket]] rule over the LSH
    * near-duplicate cluster id ([[Dedup.dupClusters]]'s min-id
    * component), so a document and ALL its near-duplicates — not just
    * byte-identical copies — land in the same split. This is the split
    * real eval hygiene needs: a paraphrased or whitespace-perturbed
    * train doc cannot sit in test ([[contentSplit]] would separate
    * them; the cluster key cannot).
    *
    * Scale: serves the persisted cluster artifact (computed once per
    * corpus version by the dedup pass — the ArtifactCache path), then a
    * zero-shuffle projection. The split adds NO work beyond the dedup
    * the pipeline already runs. */
  def neardupSplit(spark: SparkSession, dir: String): DataFrame =
    Dedup.clusterArtifact(spark, dir, 0.5)
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("split", splitName(splitBucket(col("cluster_id"))))
      .orderBy("doc_id")
}
