package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Sketch contracts (exact values are oracle-pinned by q_kmv_distinct /
  * q_cms_freq; these pin the estimator guarantees on fixtures the sf
  * tables can't produce). */
class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("KMV: exact below k, within the estimator's error envelope above it") {
    val s = spark; import s.implicits._
    val small = (1 to 10).map(i => ("a", s"v$i"))
    val big = (1 to 5000).map(i => ("b", s"w$i"))
    val df = (small ++ big).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, "g", "v", k = 64).collect()
      .map(r => r.getString(0) -> r).toMap
    // below k: degrades to exact, never to garbage
    assert(out("a").getAs[Int]("n_kept") == 10)
    assert(out("a").getAs[Double]("est_distinct") == 10.0)
    // above k: (k-1)/R estimator, relative stderr 1/sqrt(k-1) ~ 12.6%;
    // 4 sigma leaves the test deterministic-safe (the hash is fixed)
    val est = out("b").getAs[Double]("est_distinct")
    assert(out("b").getAs[Int]("n_kept") == 64)
    assert(est > 5000 * 0.5 && est < 5000 * 1.5, s"est=$est for true 5000")
  }

  test("KMV: salted two-phase equals the single-window formulation") {
    val s = spark; import s.implicits._
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"v${i % 911}")).toDF("g", "v")
    val a = Sketches.kmvDistinct(df, "g", "v", salts = 32).collect()
      .map(_.toString).sorted.toSeq
    val b = Sketches.kmvDistinct(df, "g", "v", salts = 1).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("CMS: never under-counts, and deeper sketches never raise an estimate") {
    val s = spark; import s.implicits._
    // 500 keys into w=16 buckets: collisions are certain
    val df = (1 to 5000).map(i => s"k${i % 500}").toDF("v")
    val probes = (0 until 500).map(i => s"k$i").toDF("v")
    val exact = df.groupBy("v").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est4 = Sketches.countMinEst(df, "v", probes, "v", d = 4, w = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est1 = Sketches.countMinEst(df, "v", probes, "v", d = 1, w = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est4.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est4(k) >= n, s"$k: est ${est4(k)} under-counts $n")
      // row 0 is shared, so min over 4 rows <= the 1-row estimate
      assert(est4(k) <= est1(k), s"$k: deeper sketch raised the estimate")
    }
    // with w=16 and 500 keys, collisions MUST have inflated something —
    // otherwise the fixture is vacuous
    assert(exact.exists { case (k, n) => est4(k) > n })
  }

  test("CMS: a probe absent from the corpus answers est = 0, not a dropped row") {
    val s = spark; import s.implicits._
    val df = Seq("a", "a", "b").toDF("v")
    // w large enough that an unseen key's buckets are very likely empty
    val out = Sketches.countMinEst(df, "v", Seq("a", "zzz").toDF("v"), "v",
      d = 4, w = 1024).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("a", "zzz"), "absent probe row was dropped")
    assert(out("a") >= 2L)
    assert(out("zzz") == 0L)
  }

  test("KMV excludes null values, like COUNT(DISTINCT)") {
    val s = spark; import s.implicits._
    val df = (1 to 80).map(i => ("g", Some(s"v$i"))).toDF("g", "v")
      .union(Seq(("g", Option.empty[String])).toDF("g", "v"))
    val withNull = Sketches.kmvDistinct(df, "g", "v", k = 64).collect().head
    val without = Sketches.kmvDistinct(df.filter(col("v").isNotNull),
      "g", "v", k = 64).collect().head
    assert(withNull.getAs[Int]("n_kept") == 64)
    assert(withNull.getAs[Double]("est_distinct") ==
      without.getAs[Double]("est_distinct"))
  }

  test("CMS probe joins the broadcast sketch — no shuffle join on sketch rows") {
    val plan = Sketches.cmsQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("kmvEstimate scalar equals the batch column rule over an adversarial grid") {
    val s = spark; import s.implicits._
    val k = 64
    // below-k rows (hk unused) + at-k rows with hk spanning tiny, huge,
    // and the 2^53 double-precision boundary where long→double rounds
    val rows = ((0 until k).map(n => (n, 1L)) ++ Seq(
      1L, 2L, 3L, 999983L, (1L << 53) - 1, 1L << 53, (1L << 53) + 1,
      123456789012345L, (1L << 60) - 1, 1L << 60).map(h => (k, h)))
      .toDF("n_kept", "hk")
    val cmp = rows.select(col("n_kept"), col("hk"),
      Sketches.kmvEstimateCol(col("n_kept"), col("hk"), k).as("c"))
      .collect()
    cmp.foreach { r =>
      val want = Sketches.kmvEstimate(r.getInt(0), r.getLong(1), k)
      assert(r.getDouble(2) == want,
        s"n_kept=${r.getInt(0)} hk=${r.getLong(1)}")
    }
  }

  test("bottom-k sketch is mergeable: sketch(b1 ∪ b2) == merge(sketch(b1), sketch(b2))") {
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select("event_id", "value")
    val b1 = ev.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
    val b2 = ev.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
    val k = 64
    val whole = Sketches.bottomKSample(ev, "event_id", "value", k)
      .collect().map(_.getLong(0)).toSeq
    // merge = bottom-k of the two sketches' union (the k-row reduce a
    // distributed/streaming maintainer would run)
    val merged = Sketches.bottomKSample(b1, "event_id", "value", k)
      .unionByName(Sketches.bottomKSample(b2, "event_id", "value", k))
      .orderBy("h", "id").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(whole.nonEmpty && whole == merged)
  }

  test("bottom-k quantile estimates land near the exact quantiles") {
    val rows = Sketches.quantileSketchQuery(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getDouble(2))
      // 256 uniform samples: binomial quantile deviation; the hash is
      // fixed so this is deterministic-safe with a generous envelope
      assert(math.abs(est - exact) <= math.max(5.0, exact * 0.35),
        s"q=${r.getDouble(0)} est=$est exact=$exact")
    }
  }

  test("HLL: raw regime within the estimator envelope, linear counting below 2.5m") {
    val s = spark; import s.implicits._
    val big = (1 to 10000).map(i => ("big", s"v$i"))
    val small = (1 to 20).map(i => ("small", s"s$i"))
    val df = (big ++ small).toDF("g", "v")
    val out = Sketches.hllDistinct(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    // m=64: relative stderr 1.04/8 = 13%; 3 sigma, hash fixed
    val eb = out("big").getAs[Double]("est_distinct")
    assert(eb > 10000 * 0.6 && eb < 10000 * 1.4, s"est=$eb for 10000")
    // 20 distinct over 64 registers → empty registers exist and the raw
    // estimate is far below 160: the linear-counting branch must fire,
    // est = 64·ln(64/V) — bounded by the same coupon-collector envelope
    val es = out("small").getAs[Double]("est_distinct")
    assert(out("small").getAs[Long]("n_regs") < 64)
    assert(es > 20 * 0.6 && es < 20 * 1.4, s"est=$es for 20")
  }

  test("HLL: scalar estimate rule equals the column rule; duplicates never move a register") {
    val s = spark; import s.implicits._
    val df = ((1 to 500) ++ (1 to 500)).map(i => ("g", s"v${i % 97}"))
      .toDF("g", "v")
    val row = Sketches.hllDistinct(df, "g", "v").collect().head
    val (n, z, est) = (row.getAs[Long]("n_regs"), row.getAs[Long]("z"),
      row.getAs[Double]("est_distinct"))
    assert(Sketches.hllEstimate(z, n.toInt) == est)
    // duplicated input: identical sketch to the distinct input
    val once = (1 to 97).map(i => ("g", s"v${i % 97}")).toDF("g", "v")
    val r2 = Sketches.hllDistinct(once, "g", "v").collect().head
    assert((r2.getAs[Long]("n_regs"), r2.getAs[Long]("z")) == (n, z))
  }

  test("HLL: scalar rho equals the batch bin()-length rule over a w grid") {
    val s = spark; import s.implicits._
    val ws = Seq(0L, 1L, 2L, 3L, 63L, 64L, 1L << 20, (1L << 54) - 1)
    val sparkRho = ws.toDF("w")
      .select(when(col("w") === 0, lit(55))
        .otherwise(lit(55) - length(bin(col("w")))).as("rho"))
      .collect().map(_.getInt(0)).toSeq
    assert(sparkRho == ws.map(Sketches.hllRho), sparkRho)
  }

  test("KMV set algebra: exact below k, estimates within envelope above") {
    val s = spark; import s.implicits._
    def hs(vals: Seq[Int]) = vals.toDF("v")
      .select(graft.llm.Dedup.h60(col("v").cast("string")).as("h")).distinct()
    // |A|=10, |B|=10, overlap 5 — everything below k degrades to exact
    val r = Sketches.kmvSetEstimates(hs(1 to 10), hs(6 to 15), k = 64)
      .collect().head
    assert(r.getDouble(0) == 10.0 && r.getDouble(1) == 10.0, r)
    assert(r.getDouble(2) == 15.0, r) // union exact below k
    assert(r.getDouble(3) == 5.0, r) // overlap/nk_u·est degrades to exact
    assert(r.getLong(4) == 15L && r.getLong(5) == 5L, r)
    // estimation regime: 3000 ∪ 3000 with 1000 true intersection
    val r2 = Sketches.kmvSetEstimates(hs(1 to 3000), hs(2001 to 5000), k = 64)
      .collect().head
    assert(r2.getLong(4) == 5000L && r2.getLong(5) == 1000L, r2)
    assert(math.abs(r2.getDouble(2) - 5000) < 2500, r2) // union est
    assert(math.abs(r2.getDouble(3) - 1000) < 1000, r2) // intersect est
  }

  test("invertedIndex: postings sorted+capped, df exact beyond the cap") {
    val s = spark; import s.implicits._
    val docs = ((1 to 150).map(i => (i.toLong, "common")) :+
      (200L, "rare common") :+ (201L, "rare rare"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextOps.invertedIndexOf(docs, cap = 100).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("common").getLong(1) == 151) // df uncapped
    val postings = out("common").getSeq[Long](2)
    assert(postings.length == 100 && postings == postings.sorted)
    // repeated term in one doc counts once; postings distinct
    assert(out("rare").getLong(1) == 2 &&
      out("rare").getSeq[Long](2) == Seq(200L, 201L))
  }
}
