package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scan / filter / project / aggregate / set-op surface (SURVEY §2.2, §2.4,
  * §2.6 families 1 and 9).
  *
  * Reference semantics: projection+predicate chains appear as Flink filters
  * (`/root/reference/scripts/get_entity_job.py:117`,
  * `determine_change_job.py:466`); everything here is declared Catalyst-first
  * so predicate pushdown + column pruning reach the parquet scan.
  */
object Relational {

  /** P2–P4/P7: predicate + projection over lineitem. Filters push to parquet
    * (`PushedFilters` on shipdate + returnflag), scan reads 4 columns only. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp") &&
        col("l_returnflag").isin("A", "R"))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** P13 (doc-id format `publish_state_job.py:77`) + computed projection. */
  def projectExpr(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "N")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        concat_ws("_", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string")).as("line_id"),
        (dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q1-shaped wide aggregate: map-side partial agg + single shuffle on
    * the 2-col group key; at 100 TB this is the canonical scan-heavy agg —
    * no skew risk (6 groups), partials keep shuffle bytes tiny. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val price = dec(col("l_extendedprice"))
    val disc = lit(1) - rate(col("l_discount"))
    val tax = lit(1) + rate(col("l_tax"))
    li.filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(price * disc).cast("double").as("sum_disc_price"),
        sum(price * disc * tax).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** groupBy + HAVING (post-aggregation filter). */
  def aggHaving(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 3)
      .orderBy("o_custkey")

  /** Distinct aggregation (expand-based in Spark; partials still apply). */
  def countDistinct_(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** ROLLUP grouping sets (free-from-Catalyst surface, SURVEY §2.4 note). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** CUBE grouping sets. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Top-k: global sort + limit — Spark plans TakeOrderedAndProject, which
    * keeps only k rows per partition then merges; no full sort at scale. */
  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the rank = p·(n−1) convention, so the
    * doubles match bit-for-bit). At 100 TB exact percentiles need the full
    * sorted group — the approx path would be `approx_percentile`, which is
    * not oracle-matchable across engines by design. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
      .orderBy("l_returnflag")

  /** Sample standard deviation per group — NOT the engine-native
    * `stddev_samp`: both engines implement it as streaming central-moment
    * accumulation whose result depends on partition/merge order, and the
    * cross-engine agreement proved input-lucky (bit-identical at sf0.01,
    * off by one ulp at sf0.001). This is the two-pass formula over EXACT
    * decimal sums instead: S1 = Σx and S2 = Σx² are exact (2-/4-decimal
    * scaled integers < 2^53 → their double casts are exact), and
    * sd = sqrt((S2 − S1²/n)/(n−1)) is the same five correctly-rounded
    * double ops in the same order on both engines — deterministic at any
    * scale factor and any partitioning. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    def sd(c: String): Column = {
      val s1 = sum(dec(col(c))).cast("double")
      val s2 = sum(dec(col(c)) * dec(col(c))).cast("double")
      val n = count(lit(1)).cast("double")
      sqrt((s2 - s1 * s1 / n) / (n - lit(1.0)))
    }
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sd("l_quantity").as("sd_qty"),
        sd("l_discount").as("sd_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Pearson correlation per group via the SAME two-pass exact-decimal
    * technique as [[statsAgg]] — which is what finally brings corr INTO
    * the oracle surface (engine-native `corr` is co-moment streaming,
    * merge-order-dependent, and was excluded for exactly that reason):
    * Sx, Sy, Sxy, Sxx, Syy are exact scaled integers < 2^53, and
    * corr = (Sxy − Sx·Sy/n) / sqrt((Sxx − Sx²/n)·(Syy − Sy²/n)) is an
    * identical correctly-rounded op sequence on both engines. Uses the
    * small-valued columns (quantity, discount) so every squared sum
    * stays exactly castable. */
  def corrAgg(spark: SparkSession, dir: String): DataFrame = {
    def d(c: String): Column = dec(col(c))
    val sx = sum(d("l_quantity")).cast("double")
    val sy = sum(d("l_discount")).cast("double")
    val sxy = sum(d("l_quantity") * d("l_discount")).cast("double")
    val sxx = sum(d("l_quantity") * d("l_quantity")).cast("double")
    val syy = sum(d("l_discount") * d("l_discount")).cast("double")
    val n = count(lit(1)).cast("double")
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        ((sxy - sx * sy / n) /
          sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr_qd"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Group-wise least-squares line (y = slope·x + intercept per group):
    * the closed form over the same five exact-decimal sums as
    * [[corrAgg]], so the result is bit-identical in any engine and
    * under any shuffle order — regression as ONE map-side-combinable
    * aggregation pass, never an iterative solver. */
  def linregAgg(spark: SparkSession, dir: String): DataFrame = {
    def d(c: String): Column = dec(col(c))
    val sx = sum(d("l_discount")).cast("double")
    val sy = sum(d("l_quantity")).cast("double")
    val sxy = sum(d("l_discount") * d("l_quantity")).cast("double")
    val sxx = sum(d("l_discount") * d("l_discount")).cast("double")
    val n = count(lit(1)).cast("double")
    // zero-variance guard: an all-identical-x group zeroes the
    // denominator, where Spark's divide yields NULL but DuckDB yields
    // inf/NaN — make the degenerate answer NULL in BOTH engines (the
    // anomalyFlagsOf mad>0 discipline)
    val den = n * sxx - sx * sx
    val slope = when(den =!= 0.0, (n * sxy - sx * sy) / den)
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(slope.as("slope"),
        ((sy - slope * sx) / n).as("intercept"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Median absolute deviation per group — the robust-statistics spread
    * measure (outlier-resistant where stddev is not): MAD =
    * median(|x − median(x)|). Two percentile passes joined on the group
    * key; both engines share the rank = p·(n−1) interpolation convention
    * (proven by q_percentiles), the deviations are correctly-rounded
    * subtractions of identical doubles, and the second median
    * interpolates identically — deterministic with no rounding argument.
    * Scale: two grouped aggregations + one broadcastable group-keyed
    * join; exact percentiles need the full group (the approx path would
    * be approx_percentile, not oracle-matchable by design). */
  def madAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val med = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"))
    li.join(broadcast(med), "l_returnflag")
      .withColumn("dev", abs(col("l_quantity").cast("double") - col("med_qty")))
      .groupBy("l_returnflag")
      .agg(expr("percentile(dev, 0.5)").as("mad_qty"),
        max(col("med_qty")).as("med_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Equi-width histogram via width_bucket (DuckDB lacks the function; the
    * oracle emulates the same [1,51) into 10 buckets arithmetic —
    * quantities are integral so the division is exact). */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(expr("width_bucket(l_quantity, 1, 51, 10)").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Equi-depth histogram: `k` buckets of (near-)equal ROW COUNT over a
    * totally-ordered (value, id) key — the optimizer-statistics shape
    * (equi-width [[histogram]] wastes buckets on empty ranges; equi-depth
    * puts resolution where the data is). bucket = (rank−1)·k DIV n over
    * the global rank, so bucket 0 holds the top values and boundary ties
    * split deterministically by id — identical in any engine.
    *
    * Shape: the global rank is [[graft.llm.Fusion.globalRank]]'s
    * two-phase bucket discipline (driver histogram + within-bucket
    * window — never a SinglePartition sort); the final aggregate is one
    * map-side-combinable pass with exact-decimal sums. */
  def equidepthHistogram(spark: SparkSession, dir: String,
      k: Int = 8): DataFrame = {
    val base = t(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("v"),
        (col("l_orderkey") * 16 + col("l_linenumber")).as("id"))
    val ranked = graft.llm.Fusion.globalRank(base, col("v"), col("id"),
      floor(col("v") / 1024).cast("long"), "r")
    val n = broadcast(base.agg(count(lit(1)).as("n")))
    ranked.crossJoin(n)
      .withColumn("bucket", expr(s"(r - 1) * $k DIV n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("min_v"),
        max("v").as("max_v"), dsum(col("v")).as("sum_v"))
      .orderBy("bucket")
  }

  /** Trimmed (10–90) mean per group — the robust-location member next
    * to [[madAgg]]'s robust spread: the mean over values INSIDE the
    * group's own [p10, p90] band, immune to the tail outliers a plain
    * mean chases. Thresholds use the shared exact-percentile
    * convention; the band filter re-scans with a broadcast threshold
    * join; the mean is one exact-decimal sum over one count. */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame =
    trimmedMeanOf(t(spark, dir, "lineitem"), "l_returnflag", "l_quantity")

  /** DataFrame-in variant over (grp, v) columns. */
  def trimmedMeanOf(df: DataFrame, grp: String, v: String): DataFrame = {
    val th = df.groupBy(grp).agg(
      expr(s"percentile($v, 0.1)").as("p10"),
      expr(s"percentile($v, 0.9)").as("p90"))
    df.join(broadcast(th), grp)
      .filter(col(v) >= col("p10") && col(v) <= col("p90"))
      .groupBy(grp)
      .agg(count(lit(1)).as("n_kept"),
        (dsum(col(v)) / count(lit(1)).cast("double")).as("trimmed_mean"))
      .orderBy(grp)
  }

  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** INTERSECT (set semantics). */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
      .intersect(t(spark, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("custkey")))
      .orderBy("custkey")

  /** EXCEPT — customers that never ordered, as a key-set difference. */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_custkey").as("custkey"))
      .except(t(spark, dir, "orders").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  /** UNION (distinct). */
  def setUnion(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(t(spark, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  /** k-ANONYMOUS aggregate release (Sweeney 2002): per-(lang, source)
    * corpus statistics are published only for groups with ≥ k members;
    * smaller groups fold into ONE 'other' row, so no released row
    * describes fewer than k documents. The privacy-preserving stats
    * egress a governance pipeline runs before sharing corpus
    * composition externally — all integer counts, bit-exact.
    *
    * Scale: one map-side-combinable aggregation to the (few-hundred-row)
    * group table; the suppression split and re-fold happen on that tiny
    * frame, never the corpus. */
  def kanonRelease(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    kanonReleaseOf(t(spark, dir, "documents"), k)

  def kanonReleaseOf(docs: DataFrame, k: Int = 10): DataFrame = {
    val g = docs
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
    val released = g.filter(col("n") >= k)
    // the fold-row must honor the SAME k floor: if the suppressed groups
    // together hold fewer than k members, publishing their combined stats
    // would still describe < k documents (with one suppressed group it
    // would BE that group) — drop the row entirely in that case
    // '<suppressed>' cannot collide with a real lang/source value (the
    // corpus vocabulary is identifier-shaped) — a genuine group named
    // 'other' would otherwise be indistinguishable from, or key-collide
    // with, the fold row (ADVICE r6)
    val suppressed = g.filter(col("n") < k)
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("sum_chars"), lit(0L)).as("sum_chars"))
      .select(lit("<suppressed>").as("lang"), lit("<suppressed>").as("source"),
        col("n"), col("sum_chars"))
      // max(k, 1): at k <= 0 nothing is ever suppressed and the coalesced
      // zero row must not surface as a bogus empty 'other'
      .filter(col("n") >= math.max(k, 1))
    released.unionByName(suppressed).orderBy("lang", "source")
  }
}
