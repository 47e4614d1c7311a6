package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.llm.Dedup.h60

/** Fixed-size probabilistic sketches — the profiling layer a 100 TB
  * pipeline runs BEFORE committing to exact shuffles (how many distinct
  * users? how hot is this key?). Both sketches here are deterministic
  * (md5-derived hashing, no RNG), so results are reproducible across
  * runs, engines, and partition layouts, and the DuckDB oracle pins them
  * exactly — unlike approx_count_distinct, whose HLL buckets are not
  * portable.
  *
  * Scale posture: sketch STATE is bounded by construction — k hashes per
  * group (KMV), d·w counters total (Count-Min) — so the reduce side never
  * grows with the corpus, only with the parameter choice.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimate per group
    * (Bar-Yossef et al. 2002): hash each value to a uniform 60-bit
    * integer, keep the k smallest distinct hashes per group, and
    * estimate |D| = (k−1) · 2⁶⁰ / h_k from the kth minimum. Groups with
    * fewer than k distinct values report the exact count (their kth
    * minimum does not exist — the sketch degrades to exact, never to
    * garbage).
    *
    * Shape: one (g, h) distinct shuffle, then the salted two-phase k-min
    * ([[graft.llm.Sampling.stratifiedSample]]'s skew rationale): phase 1
    * ranks within (g, salt) so a hot group's hashes spread over `salts`
    * partitions, phase 2 re-ranks the ≤ salts·k survivors. No window
    * ever sorts a whole group. */
  def kmvDistinct(df: DataFrame, keyCol: String, valCol: String,
      k: Int = 64, salts: Int = 32): DataFrame = {
    // null values are excluded, matching COUNT(DISTINCT) SQL semantics —
    // a null hash would also rank NULLS FIRST here but NULLS LAST in
    // DuckDB, silently displacing a real minimum from the sketch
    val hashes = df
      .filter(col(valCol).isNotNull)
      .select(col(keyCol).as("g"), h60(col(valCol).cast("string")).as("h"))
      .distinct()
    val w1 = Window.partitionBy("g", "salt").orderBy("h")
    val w2 = Window.partitionBy("g").orderBy("h")
    val kmin = hashes
      .withColumn("salt",
        h60(concat(lit("kmv#"), col("h").cast("string"))) % salts)
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
    kmin.groupBy("g").agg(
        count(lit(1)).cast("int").as("n_kept"),
        max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("g"), col("n_kept"),
        kmvEstimateCol(col("n_kept"), col("hk"), k).as("est_distinct"))
  }

  /** The KMV estimate rule as a column expression — the ONE batch-side
    * definition ([[kmvDistinct]] uses it): below k the sketch IS the
    * exact count; at k, (k−1)·2⁶⁰/h_k rounded to 6 places. (k−1)·2⁶⁰
    * has ≤ 6 significant bits past the power — the double product is
    * exact, so the whole estimate is one exact product and one
    * division in both engines. */
  private[graft] def kmvEstimateCol(nKept: Column, hk: Column, k: Int): Column = {
    val scale = lit((k - 1).toDouble) * lit(math.pow(2.0, 60))
    when(nKept < k, nKept.cast("double"))
      .otherwise(round(scale / hk.cast("double"), 6))
  }

  /** Scalar form of the KMV estimate rule for the streaming maintenance
    * job ([[graft.streaming.StreamingSketch.kmvStream]]): the same
    * arithmetic as [[kmvEstimateCol]], with Spark's `round` spelled out
    * (`BigDecimal.valueOf` + HALF_UP). Column expression and scalar
    * cannot be one definition, so SketchesSpec pins them equal over an
    * adversarial (nKept, hk) grid — edit both together. */
  private[graft] def kmvEstimate(nKept: Int, hk: Long, k: Int): Double =
    if (nKept < k) nKept.toDouble
    else java.math.BigDecimal
      .valueOf((k - 1).toDouble * math.pow(2.0, 60) / hk.toDouble)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (j, b) bucket rows of a value column — the map-side d-fold
    * expansion shared by the batch sketch and the streaming maintenance
    * job ([[graft.streaming.StreamingSketch]]), so the two cannot
    * disagree on hashing. */
  private[graft] def bucketRows(df: DataFrame, valCol: String, d: Int,
      w: Int): DataFrame = {
    require(w > 0 && (w & (w - 1)) == 0, s"w=$w must be a power of two")
    def bucket(v: Column, j: Column): Column =
      h60(concat(v, lit("#"), j.cast("string"))) % w
    df.select(col(valCol).cast("string").as("v"))
      .select(col("v"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .select(col("v"), col("j"), bucket(col("v"), col("j")).as("b"))
  }

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005): d hash
    * rows × w counters; an item's frequency estimate is the MIN of its d
    * counters, which never under-counts (est ≥ exact always — collisions
    * only inflate). Returns (v, est) for the probe set.
    *
    * Shape: building the sketch is a map-side d-fold expansion of the
    * value column into (row, bucket) pairs and ONE count aggregation
    * bounded at d·w output rows; probing joins the BROADCAST sketch
    * (fixed size by construction, never corpus-sized) against the probe
    * items. 2⁶⁰ is divisible by any power-of-two w, so the modulo is
    * exactly uniform. */
  def countMinEst(df: DataFrame, valCol: String, probes: DataFrame,
      probeCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    val sketch = bucketRows(df, valCol, d, w)
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    // LEFT join: a probe whose buckets are all empty is a real answer
    // (est = 0, the item definitely never occurred), not a dropped row
    bucketRows(probes.select(col(probeCol)).distinct(), probeCol, d, w)
      .join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy("v").agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** HyperLogLog distinct-count estimate per group (Flajolet, Fusy,
    * Gandouet & Meunier 2007), m = 64 registers: the 60-bit md5 hash
    * splits into register j = h mod 64 and a 54-bit word w; each
    * register keeps M_j = max ρ(w), where ρ = leading-zero rank
    * = 55 − bitlength(w) (via `bin()` string length — identical
    * minimal-binary semantics in both engines, no float log2). The
    * harmonic denominator is kept INTEGER-exact: Z·2⁵⁵ = Σ 2^(55−M_j)
    * (empty registers contribute 2⁵⁵ each) is ≤ 2⁶¹, a plain Long sum —
    * so the estimate is literal-folded-constant / one exact integer
    * cast, never an order-dependent float sum. Small-range (linear
    * counting) correction applies below 2.5·m when empty registers
    * exist, with its single ln() rounded at 6 places (the engine-wide
    * ln-is-1-ulp caveat; the argument takes only 63 possible values).
    *
    * KMV ([[kmvDistinct]]) answers the same question; HLL's state is
    * 64 registers ≈ fixed bytes per group vs KMV's k hashes, and
    * registers merge by max — the natural streaming/partition-parallel
    * sketch ([[graft.streaming.StreamingSketch.hllStream]] maintains
    * exactly this state incrementally). */
  def hllDistinct(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val two55 = 36028797018963968L // 2^55
    val rows = df
      .filter(col(valCol).isNotNull)
      .select(col(keyCol).as("g"), h60(col(valCol).cast("string")).as("h"))
      .select(col("g"), (col("h") % 64).as("j"), expr("h DIV 64").as("w"))
      .select(col("g"), col("j"), when(col("w") === 0, lit(55))
        .otherwise(lit(55) - length(bin(col("w")))).as("rho"))
    val regs = rows.groupBy("g", "j").agg(max("rho").as("mj"))
    regs.groupBy("g").agg(
        count(lit(1)).as("n_regs"),
        sum(pow(lit(2.0), lit(55) - col("mj")).cast("long")).as("zp"))
      .select(col("g"), col("n_regs"),
        (col("zp") + (lit(64L) - col("n_regs")) * two55).as("z"))
      .select(col("g"), col("n_regs"), col("z"),
        hllEstimateCol(col("z"), col("n_regs")).as("est_distinct"))
  }

  /** The HLL estimate rule: raw = α·m²·2⁵⁵ / Z (the numerator is one
    * literal-folded constant — identical literal text on the oracle
    * side, so the folded double is bit-identical), linear counting
    * m·ln(m/V) when raw ≤ 2.5·m and V = 64 − n_regs > 0. */
  private[graft] def hllEstimateCol(z: Column, nRegs: Column): Column = {
    val num = lit(0.709) * lit(4096) * lit(36028797018963968.0)
    val raw = num / z.cast("double")
    val v = lit(64L) - nRegs
    when(raw <= lit(2.5) * lit(64) && v > 0,
      round(lit(64.0) * log(lit(64.0) / v.cast("double")), 6))
      .otherwise(round(raw, 6))
  }

  /** Scalar twin of [[hllEstimateCol]] for the streaming maintenance job
    * ([[graft.streaming.StreamingSketch.hllStream]]) — same arithmetic,
    * Spark's `round` spelled out (the [[kmvEstimate]] discipline;
    * SketchesSpec pins the two equal over a (z, nRegs) grid). */
  private[graft] def hllEstimate(z: Long, nRegs: Int): Double = {
    val raw = 0.709 * 4096 * 36028797018963968.0 / z.toDouble
    val v = 64 - nRegs
    val est =
      if (raw <= 2.5 * 64 && v > 0) 64.0 * math.log(64.0 / v) else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** The register-update rule shared conceptually with the stream: for a
    * 60-bit hash h, register j = h mod 64 and ρ = nlz(h div 64) − 9 —
    * equal to 55 − bitlength(w) for w > 0 and 55 at w = 0, i.e. exactly
    * the batch `bin()`-length column rule (SketchesSpec pins the two
    * equal over a hash grid). */
  private[graft] def hllRho(w: Long): Int =
    java.lang.Long.numberOfLeadingZeros(w) - 9

  /** Oracle query: HLL distinct users per event type — the same
    * question as [[kmvQuery]] through the other classic sketch, so the
    * two estimates can be compared side by side. At sf0.001 (≈15 true
    * distinct per group) the linear-counting branch fires; at
    * sf0.01/0.1 (≈150) the raw harmonic path does — the oracle
    * exercises both regimes across the SF sweep. */
  def hllQuery(spark: SparkSession, dir: String): DataFrame =
    hllDistinct(t(spark, dir, "events"), "event_type", "user_id")
      .select(col("g").as("event_type"), col("n_regs"), col("z"),
        col("est_distinct"))
      .orderBy("event_type")

  /** Oracle query: KMV distinct users per event type (k = 64 against 150
    * true distinct — a real estimation regime, not the exact fallback). */
  def kmvQuery(spark: SparkSession, dir: String): DataFrame =
    kmvDistinct(t(spark, dir, "events"), "event_type", "user_id")
      .select(col("g").as("event_type"), col("n_kept"), col("est_distinct"))
      .orderBy("event_type")

  /** Oracle query: Count-Min per-user event-count estimates for a fixed
    * probe set, alongside the exact counts (the spec asserts est ≥ exact
    * — the sketch's one-sided error guarantee). */
  def cmsQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val probes = ev.filter(col("user_id") < 20).select("user_id").distinct()
    val exact = ev.filter(col("user_id") < 20)
      .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    countMinEst(ev, "user_id", probes, "user_id")
      .select(col("v").cast("long").as("user_id"), col("est"))
      .join(exact, Seq("user_id"))
      .orderBy("user_id")
  }

  /** KMV sketch ALGEBRA (Beyer et al. 2007): union and intersection
    * cardinality estimates from two bottom-k hash sketches — the
    * pre-join profiling question ("how many keys would this join/union
    * produce?") answered without materializing either side. The union
    * sketch is the bottom-k of the merged hash sets (exactly mergeable,
    * the KMV property); |A∪B| comes from the union sketch's kth
    * minimum; |A∩B| = (overlap/k)·|A∪B|, where overlap counts union-
    * sketch hashes present in BOTH sets — the k smallest union hashes
    * are a uniform sample of the union. Below k everything degrades to
    * exact. All arithmetic: the shared [[kmvEstimateCol]] rule plus one
    * product/division pair, rounded at 6.
    *
    * Shape: each side is one distinct-hash pass; sketches are ≤ k rows
    * (TakeOrdered, never a sort); membership tests are k-row broadcast
    * semi-joins against the hash sets. */
  def kmvSetEstimates(a: DataFrame, b: DataFrame, k: Int = 64): DataFrame = {
    def bottomK(df: DataFrame) = df.orderBy("h").limit(k)
    def estOf(sk: DataFrame, name: String) =
      sk.agg(count(lit(1)).cast("int").as("nk"), max("h").as("hk"))
        .select(kmvEstimateCol(col("nk"),
          when(col("nk") === k, col("hk")), k).as(name))
    val u = a.union(b).distinct().localCheckpoint(true)
    val ku = bottomK(u).localCheckpoint(true) // feeds est + both semi-joins
    val overlap = ku
      .join(a, Seq("h"), "left_semi").join(b, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("overlap"))
    val exact = u.agg(count(lit(1)).as("exact_union")).crossJoin(
      a.join(b, Seq("h"), "left_semi").agg(count(lit(1)).as("exact_intersect")))
    // the intersection sample size is the union SKETCH size (= k only
    // once the union exceeds k; below k the sketch is the whole union
    // and overlap/nk_u·est_union degrades to the exact intersection)
    val uagg = ku.agg(count(lit(1)).cast("int").as("nk_u"),
      max("h").as("hk_u"))
    estOf(bottomK(a), "est_a")
      .crossJoin(estOf(bottomK(b), "est_b"))
      .crossJoin(broadcast(uagg))
      .crossJoin(broadcast(overlap))
      .crossJoin(broadcast(exact))
      .withColumn("est_union", kmvEstimateCol(col("nk_u"),
        when(col("nk_u") === k, col("hk_u")), k))
      .select(col("est_a"), col("est_b"), col("est_union"),
        when(col("nk_u") > 0,
          round(col("overlap").cast("double") * col("est_union") /
            col("nk_u").cast("double"), 6))
          .otherwise(lit(0.0)).as("est_intersect"),
        col("exact_union"), col("exact_intersect"))
  }

  /** Oracle query: distinct-user set algebra of 'view' vs 'click'
    * events — sketch estimates next to the exact answers. */
  def kmvSetOpsQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def hs(tp: String) = ev
      .filter(col("event_type") === tp && col("user_id").isNotNull)
      .select(h60(col("user_id").cast("string")).as("h")).distinct()
      .localCheckpoint(true) // feeds bottom-k + membership semi-joins
    kmvSetEstimates(hs("view"), hs("click"))
  }

  /** Bottom-k quantile sketch: a deterministic uniform sample — the k
    * rows whose md5-derived hash of the ROW ID is smallest (bottom-k /
    * min-wise sampling, Cohen & Kaplan 2007) — with quantiles
    * interpolated over the sample. The hash plays the role RNG plays in
    * reservoir sampling, so the sketch is reproducible across runs,
    * engines, and partition layouts, and MERGEABLE exactly: bottom-k of
    * a union is the bottom-k of the unions' bottom-ks (spec pins
    * sketch(b1 ∪ b2) == merge(sketch(b1), sketch(b2)) — the property
    * that lets every partition/microbatch sketch independently and a
    * k-row reduce combine them, the KMV state-bound argument applied to
    * quantiles). */
  def bottomKSample(df: DataFrame, idCol: String, valCol: String,
      k: Int = 256, salt: String = "qsk"): DataFrame =
    df.select(col(idCol).as("id"), col(valCol).as("v"),
        h60(concat(lit(s"$salt#"), col(idCol).cast("string"))).as("h"))
      .orderBy("h", "id") // TakeOrdered k — never a full sort
      .limit(k)

  /** (q, est) quantile estimates from a [[bottomKSample]]. */
  def quantileEstimates(sample: DataFrame,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame =
    sample.agg(expr(
        s"percentile(v, array(${qs.mkString(", ")}))").as("est"))
      .select(posexplode(col("est")).as(Seq("i", "est")))
      .select(element_at(typedLit(qs), col("i") + 1).as("q"), col("est"))
      .orderBy("q")

  /** Oracle query: quantiles of events.value from a 256-row bottom-k
    * sample next to the exact quantiles (the spec bounds the error).
    * ONE quantile list drives both sides through the SAME
    * [[quantileEstimates]] expansion — a list edited in one place
    * cannot silently drop rows through the join. */
  def quantileSketchQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val est = quantileEstimates(bottomKSample(ev, "event_id", "value"), qs)
    val exact = quantileEstimates(ev.select(col("value").as("v")), qs)
      .withColumnRenamed("est", "exact")
    est.join(exact, Seq("q")).orderBy("q")
  }
}
