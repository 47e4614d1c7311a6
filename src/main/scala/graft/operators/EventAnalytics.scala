package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Product-analytics operators over the event stream table: ordered
  * conversion funnels and cohort retention — the two queries every
  * event-warehouse user runs weekly, and the batch mirrors of what the
  * reference's per-event jobs would feed a dashboard.
  *
  * Both are built on per-user aggregation only: every shuffle is an
  * equi-shuffle on `user_id` (or on the small cohort key) with map-side
  * partial aggregation, so the plans are user-cardinality-bounded, not
  * event-cardinality-bounded — 10¹¹ events over 10⁸ users shuffle 10⁸
  * aggregate rows. Timestamps stay Long nanoseconds throughout (the
  * engine-wide exact-ts contract); day/week bucketing is integer
  * division, never a float or calendar op.
  */
object EventAnalytics {

  /** Strictly-ordered conversion funnel: for each user, step 1 is the
    * FIRST `steps(0)` event, step k is the first `steps(k-1)` event
    * AFTER the user's step-(k-1) time. One row per step:
    * (step, event_type, n_users, conv) where conv = n_users / step-1
    * users (1.0 for the first step, 0.0 when the previous step is
    * empty).
    *
    * Shape: one per-user conditional-min aggregation per step — step
    * k's filter needs step k-1's per-user time, so the dependency chain
    * is k−1 equi-joins on user_id over user-sized frames (AQE
    * broadcasts the shrinking side), never a window over the raw
    * events; the whole chain stays declarative and collapses into one
    * summary aggregation (zero driver-side loops). */
  def funnelOf(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val totals = funnelTotals(events, steps, window = None)
    val stepRows = steps.zipWithIndex.map { case (name, i) =>
      val n = col(s"n${i + 1}")
      val conv =
        if (i == 0) when(n > 0, lit(1.0)).otherwise(lit(0.0))
        else when(col(s"n$i") > 0,
          n.cast("double") / col(s"n$i").cast("double"))
          .otherwise(lit(0.0))
      struct(lit(i + 1).as("step"), lit(name).as("event_type"),
        n.as("n_users"), conv.as("conv"))
    }
    totals.select(explode(array(stepRows: _*)).as("s"))
      .select(col("s.step"), col("s.event_type"), col("s.n_users"),
        col("s.conv"))
      .orderBy("step")
  }

  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(t(spark, dir, "events"))

  /** THE funnel chain, defined once (review r7b finding #3): one row
    * per step-1 user, t_k null until the user reaches step k; with a
    * conversion `window`, a deadline (= t1 + window) is carried through
    * the chain and every later step must land at or before it. */
  private def funnelUsers(events: DataFrame, steps: Seq[String],
      window: Option[Long]): DataFrame = {
    require(steps.nonEmpty && window.forall(_ > 0))
    val base = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val first = window.fold(base)(w =>
      base.withColumn("deadline", col("t1") + lit(w)))
    val carry = Seq(col("user_id")) ++ window.map(_ => col("deadline"))
    steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val inWindow = window.map(_ => col("ts") <= col("deadline"))
          .getOrElse(lit(true))
        val reached = events.filter(col("event_type") === step)
          .join(prev.select(carry :+ col(s"t$i"): _*), "user_id")
          .filter(col("ts") > col(s"t$i") && inWindow)
          .groupBy("user_id").agg(min("ts").as(s"t${i + 1}"))
        prev.join(reached, Seq("user_id"), "left")
    }
  }

  /** One-row totals (n1..nK) over [[funnelUsers]]. */
  private def funnelTotals(events: DataFrame, steps: Seq[String],
      window: Option[Long]): DataFrame = {
    val perUser = funnelUsers(events, steps, window)
    val aggCols = steps.indices
      .map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    perUser.agg(aggCols.head, aggCols.tail: _*)
  }

  /** Time-to-convert per funnel step: for users who reached step i+1,
    * the count and p50/p90 of (t_{i+1} − t_i) — the "how long does a
    * click take after the view" latency distribution, over the SAME
    * [[funnelUsers]] chain as the conversion counts so latency and
    * conversion can never disagree about who converted. Latencies stay
    * Long nanos into the shared exact-percentile convention; the
    * per-user frame is user-bounded and checkpointed once for the K−1
    * step aggregates. */
  def funnelLatencyOf(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val pu = funnelUsers(events, steps, None).localCheckpoint(true)
    val rows = steps.zipWithIndex.drop(1).map { case (name, i) =>
      pu.filter(col(s"t${i + 1}").isNotNull)
        .agg(count(lit(1)).as("n_conv"),
          expr(s"percentile(t${i + 1} - t$i, 0.5)").as("p50_ns"),
          expr(s"percentile(t${i + 1} - t$i, 0.9)").as("p90_ns"))
        .select(lit(i).as("step_from"), lit(name).as("to_type"),
          col("n_conv"), col("p50_ns"), col("p90_ns"))
    }
    rows.reduce(_ unionByName _).orderBy("step_from")
  }

  def funnelLatency(spark: SparkSession, dir: String): DataFrame =
    funnelLatencyOf(t(spark, dir, "events"))

  /** Ordered behavior co-occurrence: for every event-type pair (first,
    * then), how many users did `first` and LATER did `then` — not
    * necessarily adjacently (the funnel asks about a fixed path; this
    * asks about every path at once). "A then A" counts repeat behavior.
    * ∃ a before b ⟺ min(ts_first) < max(ts_then), so the whole matrix
    * needs only the per-(user, type) min/max aggregate — the self-join
    * is over a ≤ |types| rows/user frame, equi-keyed on user, output
    * |types|²-bounded. */
  def seqPairsOf(events: DataFrame): DataFrame = {
    val ut = events.groupBy("user_id", "event_type")
      .agg(min("ts").as("t_min"), max("ts").as("t_max"))
      .localCheckpoint(true) // both self-join sides read it
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.t_min") < col("b.t_max"))
      .groupBy(col("a.event_type").as("first_type"),
        col("b.event_type").as("then_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("first_type", "then_type")
  }

  def seqPairs(spark: SparkSession, dir: String): DataFrame =
    seqPairsOf(t(spark, dir, "events"))

  /** Per-user behavioral entropy over event types: H = Σ (n_i/N)·
    * ln(N/n_i) — 0 for a one-track user, ln K for a uniform one. The
    * Shannon diversity of each user's behavior profile, the per-user
    * twin of the corpus [[graft.functions.CharEntropy]]. Terms fold in
    * event-type order (collect → sort → aggregate — the LM xent
    * ordered-fold discipline), each term two exact divisions, one
    * multiply and one ln; rounded at 6 (the engine-wide ln caveat). */
  def userEntropyOf(events: DataFrame): DataFrame = {
    val c = events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // user×type-bounded; totals AND join read it
    val tot = c.groupBy("user_id")
      .agg(sum("n").as("n_events"), count(lit(1)).as("k_types"))
    c.join(tot, "user_id")
      .withColumn("term",
        (col("n").cast("double") / col("n_events").cast("double")) *
          log(col("n_events").cast("double") / col("n").cast("double")))
      .groupBy("user_id")
      .agg(first("n_events").as("n_events"), first("k_types").as("k_types"),
        collect_list(struct(col("event_type"), col("term"))).as("terms"))
      .select(col("user_id"), col("n_events"), col("k_types"),
        round(aggregate(array_sort(col("terms")), lit(0.0),
          (acc, x) => acc + x.getField("term")), 6).as("entropy"))
      .orderBy("user_id")
  }

  def userEntropy(spark: SparkSession, dir: String): DataFrame =
    userEntropyOf(t(spark, dir, "events"))

  /** Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    * day-slopes of the daily count series (Theil 1950 / Sen 1968) — up
    * to ~29% of days can be corrupted (outages, spikes) without moving
    * the estimate, where least squares ([[Relational.linregAgg]]) bends
    * toward every outlier; the robust-statistics family's trend member
    * next to [[anomalyFlagsOf]]'s MAD. Each slope is ONE exact integer-
    * difference division; the median is the shared exact-percentile
    * convention. Day pairs are O(days²) per type — calendar-bounded,
    * independent of event volume. */
  def theilSenOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("d"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // both pair-join sides read it
    daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.d") - col("a.d")).cast("double")).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("slope_med"))
      .orderBy("event_type")
  }

  def theilSen(spark: SparkSession, dir: String): DataFrame =
    theilSenOf(t(spark, dir, "events"))

  /** Two-proportion A/B test on conversion: users split 50/50 by the
    * engine's deterministic hash-split rule (md5-derived — the same
    * reproducibility contract as [[graft.llm.Sampling.splitBucket]]),
    * converted = did `convType` at least once; z is the standard
    * pooled two-proportion statistic, every input an exact integer and
    * the float sequence written identically in both engines. NULL when
    * degenerate (nobody or everybody converted — se = 0, where the
    * engines disagree on x/0). */
  def abTestOf(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("conv"))
      .select(col("conv"),
        when(graft.llm.Dedup.h60(
          concat(lit("ab#"), col("user_id").cast("string"))) % 2 === 0,
          "A").otherwise("B").as("grp"))
    val g = users.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val a = g.filter(col("grp") === "A")
      .select(col("n").as("n_a"), col("c").as("conv_a"))
    val b = g.filter(col("grp") === "B")
      .select(col("n").as("n_b"), col("c").as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a").cast("double")
    val pB = col("conv_b").cast("double") / col("n_b").cast("double")
    val cTot = col("conv_a") + col("conv_b")
    val nTot = col("n_a") + col("n_b")
    val pp = cTot.cast("double") / nTot.cast("double")
    val se = sqrt(pp * (lit(1) - pp) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    a.crossJoin(b).select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      pA.as("rate_a"), pB.as("rate_b"),
      when(cTot > 0 && cTot < nTot, round((pA - pB) / se, 6)).as("z"))
  }

  def abTest(spark: SparkSession, dir: String): DataFrame =
    abTestOf(t(spark, dir, "events"))

  /** Exact audience overlap between event types: |users(A) ∩ users(B)|
    * and the Jaccard, for every type pair — the segment-overlap matrix
    * a campaign tool draws, and the EXACT twin of the KMV estimates in
    * [[Sketches.kmvSetEstimates]] (at sketch-scale you'd use those;
    * the exact form is one distinct + one user-equi self-join over the
    * (type, user) table, |types|²-bounded output). */
  def typeOverlapOf(events: DataFrame): DataFrame = {
    val tu = events.select("event_type", "user_id").distinct()
      .localCheckpoint(true) // sizes + both self-join sides read it
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
    tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("inter"), col("n_a"),
        col("n_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  def typeOverlap(spark: SparkSession, dir: String): DataFrame =
    typeOverlapOf(t(spark, dir, "events"))

  /** Daily percentile series of the value column — the p50/p90 band
    * every latency/revenue dashboard draws; grouped exact percentiles
    * over the day partition (map-side partials into a day-bounded
    * aggregate). */
  def dailyPercentilesOf(events: DataFrame): DataFrame =
    events
      .groupBy(expr("ts DIV 86400000000000").as("d"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .orderBy("d")

  def dailyPercentiles(spark: SparkSession, dir: String): DataFrame =
    dailyPercentilesOf(t(spark, dir, "events"))

  /** Funnel with a conversion window: step k must land strictly after
    * step k−1 AND within `windowNs` of step 1 — the "converted within
    * 7 days" business rule. Shares [[funnelTotals]] with [[funnelOf]],
    * so the step semantics cannot drift between the two. */
  def funnelWindowedOf(events: DataFrame, windowNs: Long,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val totals = funnelTotals(events, steps, Some(windowNs))
    val stepRows = steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).as("step"), lit(name).as("event_type"),
        col(s"n${i + 1}").as("n_users"))
    }
    totals.select(explode(array(stepRows: _*)).as("s"))
      .select(col("s.step"), col("s.event_type"), col("s.n_users"))
      .orderBy("step")
  }

  def funnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnelWindowedOf(t(spark, dir, "events"), 3L * 86400000000000L) // 3 days

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event (any type); each (cohort_week, week_offset) cell counts
    * the distinct users of that cohort active in that later week. Weeks
    * are epoch-aligned 7-day buckets of the Long-nanos timestamp —
    * integer division end to end. */
  def cohortRetentionOf(events: DataFrame): DataFrame = {
    val day = expr("ts DIV 86400000000000") // ns → epoch day
    val ev = events.select(col("user_id"), day.as("d"))
    val firstDay = ev.groupBy("user_id").agg(min("d").as("d0"))
    ev.join(firstDay, "user_id")
      .select(col("user_id"), expr("d0 DIV 7").as("cohort_week"),
        expr("(d - d0) DIV 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortRetentionOf(t(spark, dir, "events"))

  /** RFM customer segmentation (Hughes 1994's classic recency/
    * frequency/monetary scoring): one per-customer aggregate, then each
    * dimension quintile-scored 5 (best) … 1 by GLOBAL rank. The ranks
    * reuse [[graft.llm.Fusion.globalRank]] — the two-phase bucket
    * discipline — so scoring a 10⁸-customer base never plans a
    * SinglePartition window; quintile arithmetic is integer end to end.
    * Monetary sums route through [[graft.Tables.dsum]] (exact decimal),
    * so ranks can't flip on float summation order. */
  def rfmSegmentsOf(orders: DataFrame): DataFrame = {
    // checkpoint before ranking: each globalRank drives a driver-side
    // histogram collect, and without this the orders scan+aggregate
    // would re-execute once per dimension (the rrfFusionOf discipline)
    val base = orders.groupBy(col("o_custkey").as("custkey")).agg(
      max(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000"))
        .as("r_day"),
      count(lit(1)).as("freq"),
      dsum(col("o_totalprice")).as("monetary"))
      .localCheckpoint(true)
    val r1 = graft.llm.Fusion.globalRank(base, col("r_day"), col("custkey"),
      col("r_day"), "rr")
    val r2 = graft.llm.Fusion.globalRank(r1, col("freq"), col("custkey"),
      col("freq"), "rf")
    // monetary bucket is COARSE (1024-wide bands) on purpose: per-cent
    // spend sums are near-unique per customer, so bucket = floor(m)
    // would hand the driver a customer-sized histogram — the exact
    // degeneracy the two-phase rank exists to avoid
    val r3 = graft.llm.Fusion.globalRank(r2, col("monetary"), col("custkey"),
      floor(col("monetary") / 1024).cast("long"), "rm")
    val n = broadcast(base.agg(count(lit(1)).as("n")))
    r3.crossJoin(n)
      .select(col("custkey"), col("r_day"), col("freq"), col("monetary"),
        expr("5 - ((rr - 1) * 5 DIV n)").as("r_score"),
        expr("5 - ((rf - 1) * 5 DIV n)").as("f_score"),
        expr("5 - ((rm - 1) * 5 DIV n)").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy("custkey")
  }

  def rfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegmentsOf(t(spark, dir, "orders"))

  /** Top event-type paths: each user's first `plen` events (by ts, then
    * event_id for total order) concatenated into a path string; the
    * `k` most common paths with their user counts. Per-user windows
    * only (user-bounded), a path-cardinality-bounded aggregate, and a
    * TakeOrdered head — no global sort. */
  def topPathsOf(events: DataFrame, plen: Int = 5, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val firstN = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= plen)
    firstN.groupBy("user_id")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        s => s.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  def topPaths(spark: SparkSession, dir: String): DataFrame =
    topPathsOf(t(spark, dir, "events"))

  /** Robust anomaly flags: the Iglewicz–Hoaglin modified z-score —
    * |value − median| / (1.4826 · MAD) per event_type, flagging scores
    * above 3.5. Median/MAD (not mean/stddev) so the outliers being
    * hunted can't mask themselves by inflating the spread estimate —
    * the [[Relational.madAgg]] robust-statistics rationale applied as
    * a filter. Two grouped exact-percentile passes (group-key
    * cardinality is tiny, the per-group medians broadcast), then one
    * flagging projection over the scan; the shared percentile
    * interpolation convention makes both engines' thresholds
    * bit-identical. */
  def anomalyFlagsOf(events: DataFrame, cutoff: Double = 3.5): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = events.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("score", col("dev") / (col("mad") * lit(1.4826)))
      .filter(col("mad") > 0 && col("score") > cutoff)
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"), col("score"))
      .orderBy("event_id")
  }

  def anomalyFlags(spark: SparkSession, dir: String): DataFrame =
    anomalyFlagsOf(t(spark, dir, "events"))

  /** DAU / WAU stickiness per day: daily active users, the rolling
    * 7-day active-user count, and their ratio. Rolling DISTINCT counts
    * don't decompose into window aggregates, so the shape is the
    * standard one: dedupe to (user, day) once, then a bounded
    * day-range equi-expansion (each activity day feeds ≤ 7 report
    * days via a 7-row sequence explode — never a range join) and one
    * distinct count per (report day). Work is 7× the (user, day)
    * table, independent of raw event volume. */
  def stickinessOf(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), expr("ts DIV 86400000000000").as("d"))
      .distinct()
      .localCheckpoint(true) // feeds DAU and the 7-day expansion
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val maxDay = broadcast(ud.agg(max("d").as("dmax")))
    val wau = ud.crossJoin(maxDay)
      .select(col("user_id"),
        explode(sequence(col("d"), least(col("d") + 6, col("dmax"))))
          .as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    dau.join(wau, "d")
      .select(col("d"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness"))
      .orderBy("d")
  }

  def stickiness(spark: SparkSession, dir: String): DataFrame =
    stickinessOf(t(spark, dir, "events"))

  /** First-order Markov transition matrix over event types: for each
    * user, the (event → next event) pairs in (ts, event_id) order, with
    * transition counts and the row-conditional probability
    * p = n / n_src. The classic product-analytics "where do users go
    * next" matrix, and the empirical transition model a sequence
    * simulator samples from.
    *
    * Shape: ONE per-user window pass (equi-shuffle on user_id) feeding
    * a type-pair-bounded aggregate (|types|² rows); the per-source
    * totals re-aggregate THAT, never the raw events, and broadcast back
    * for the probability. `p` is one integer-to-double division — IEEE
    * deterministic, no rounding needed. */
  /** The per-user adjacency stage of [[markovTransitionsOf]] — exposed
    * so PlanSpec can pin its window shape (the checkpoint in the full
    * operator truncates the visible plan). */
  private[graft] def markovAdjacency(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
  }

  def markovTransitionsOf(events: DataFrame): DataFrame = {
    val trans = markovAdjacency(events)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // |types|² rows; totals AND the join read it
    val totals = trans.groupBy("src").agg(sum("n").as("n_src"))
    trans.join(broadcast(totals), "src")
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        (col("n").cast("double") / col("n_src").cast("double")).as("p"))
      .orderBy("src", "dst")
  }

  def markovTransitions(spark: SparkSession, dir: String): DataFrame =
    markovTransitionsOf(t(spark, dir, "events"))

  /** Per-user sessionization stats: gaps-and-islands with a fixed
    * inactivity gap (a gap ≥ `gapNs` starts a new session — the same
    * `≥` rule as the session-window query, so the two sessionizers
    * cannot disagree on a boundary event). Per user: session count,
    * bounce count (single-event sessions), total in-session dwell
    * (Σ last−first, Long nanos — exact), and the busiest session's
    * event count.
    *
    * Shape: both windows and both aggregates partition by user_id, so
    * the whole query is ONE equi-shuffle on user_id; output is
    * user-cardinality-bounded. */
  def sessionStatsOf(events: DataFrame,
      gapNs: Long = 7200L * 1000000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val marked = events.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("new_s",
        when(lag("ts", 1).over(w).isNull ||
          col("ts") - lag("ts", 1).over(w) >= gapNs, 1L).otherwise(0L))
      .withColumn("sess",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val sess = marked.groupBy("user_id", "sess").agg(
      count(lit(1)).as("n_ev"), min("ts").as("t0"), max("ts").as("t1"))
    sess.groupBy("user_id").agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("t1") - col("t0")).as("total_dur_ns"),
        max("n_ev").as("max_events"))
      .orderBy("user_id")
  }

  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessionStatsOf(t(spark, dir, "events"))

  /** CUSUM change-point detection over the daily event-count series
    * (Page 1954's cumulative-sum shape, mean-centered): S_d = Σ_{i≤d}
    * (x_i − mean), with the day maximizing |S_d| flagged as the change
    * point. The whole series is kept INTEGER-exact by scaling through
    * the day count — S'_d = Σ (n_days·x_i − total) = n_days·S_d — so no
    * division ever happens and the argmax cannot flip on float
    * summation order (the PageRank fixed-point discipline applied to
    * time series).
    *
    * Shape: the only corpus-sized pass is the daily count aggregate
    * (map-side partial, day-bounded output). The running sum's window
    * IS single-partition — over the calendar-day series, whose
    * cardinality is bounded by elapsed days (≤ ~4 k rows a decade),
    * not by event volume; a day-partitioned corpus never ships more
    * than the per-day counts here. */
  def changePointOf(events: DataFrame): DataFrame = {
    val daily = events.select(expr("ts DIV 86400000000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // day-bounded; totals AND the series read it
    val tot = broadcast(daily.agg(sum("x").as("t"), count(lit(1)).as("nd")))
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val s = daily.crossJoin(tot)
      .withColumn("s", sum(col("x") * col("nd") - col("t")).over(w))
    val peak = broadcast(s.agg(max(abs(col("s"))).as("speak")))
    s.crossJoin(peak)
      .select(col("d"), col("x"), col("s"),
        (abs(col("s")) === col("speak")).as("is_cp"))
      .orderBy("d")
  }

  def changePoint(spark: SparkSession, dir: String): DataFrame =
    changePointOf(t(spark, dir, "events"))

  /** Autocorrelation of the daily event-count series at the given lags
    * (lag 1 = momentum, lag 7 = weekly seasonality — the two every
    * traffic series gets checked for). Pearson r over the (x_d,
    * x_{d+lag}) pairs via the [[Relational.corrAgg]] two-pass
    * discipline: the five sums are sums of INTEGER counts and their
    * products — exact Longs (< 2⁵³ up to ~10⁶ events/day over decades;
    * beyond that route through decimals) — so r is one identical
    * correctly-rounded op sequence in both engines.
    *
    * Shape: the only corpus-sized pass is the daily aggregate; each lag
    * is one equi-join of the day-bounded series with its shifted self
    * plus one five-sum aggregate. */
  def autocorrOf(events: DataFrame, lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    val daily = events.select(expr("ts DIV 86400000000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // day-bounded; feeds one join per lag
    val rows = lags.map { lag =>
      val a = daily.select(col("d"), col("x").as("x0"))
      val b = daily.select((col("d") - lag).as("d"), col("x").as("x1"))
      val sx = sum("x0").cast("double")
      val sy = sum("x1").cast("double")
      val sxy = sum(col("x0") * col("x1")).cast("double")
      val sxx = sum(col("x0") * col("x0")).cast("double")
      val syy = sum(col("x1") * col("x1")).cast("double")
      val n = count(lit(1)).cast("double")
      // zero-variance guard (the linregAgg discipline): a single pair
      // or a constant series zeroes a variance factor, where Spark's
      // 0/0 is NULL but DuckDB's is NaN — the degenerate answer is
      // NULL in BOTH engines
      val varx = sxx - sx * sx / n
      val vary = syy - sy * sy / n
      a.join(b, "d")
        .agg(count(lit(1)).as("n_pairs"),
          when(varx * vary > 0,
            (sxy - sx * sy / n) / sqrt(varx * vary)).as("r"))
        .select(lit(lag).as("lag"), col("n_pairs"), col("r"))
    }
    rows.reduce(_ unionByName _).orderBy("lag")
  }

  def autocorr(spark: SparkSession, dir: String): DataFrame =
    autocorrOf(t(spark, dir, "events"))

  /** Day-of-week seasonality profile: per weekday (0 = Sunday, epoch
    * day 0 was a Thursday → weekday = (d+4) mod 7), the day count,
    * total events, per-day average, and the lift vs the overall daily
    * average. Lift = (x_w · nd_total)/(nd_w · total): both products are
    * exact integers, ONE division — no float accumulation anywhere. */
  def seasonalityOf(events: DataFrame): DataFrame = {
    val daily = events.select(expr("ts DIV 86400000000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // day-bounded; weekday AND total aggs read it
    val wd = daily.groupBy(((col("d") + 4) % 7).as("weekday"))
      .agg(count(lit(1)).as("n_days"), sum("x").as("x"))
    val tot = broadcast(daily.agg(count(lit(1)).as("nd_tot"),
      sum("x").as("t")))
    wd.crossJoin(tot)
      .select(col("weekday"), col("n_days"), col("x"),
        (col("x").cast("double") / col("n_days").cast("double")).as("avg_x"),
        ((col("x") * col("nd_tot")).cast("double") /
          (col("n_days") * col("t")).cast("double")).as("lift"))
      .orderBy("weekday")
  }

  def seasonality(spark: SparkSession, dir: String): DataFrame =
    seasonalityOf(t(spark, dir, "events"))
}
