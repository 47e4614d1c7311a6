package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatTests

/** PSI drift and χ² independence semantics on hand fixtures. */
class StatTestsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val DayNs = 86400000000000L

  test("psiOf: identical windows score exactly zero, a shift scores positive") {
    val s = spark; import s.implicits._
    // same value histogram in both windows → p == q → every term 0.0
    val same = (0 until 30).flatMap { d =>
      (0 until 10).map(i => (d * DayNs + i, i.toDouble))
    }.toDF("ts", "value")
    val t0 = StatTests.psiOf(same).collect()
    assert(t0.length == 10)
    assert(t0.forall(_.getDouble(3) == 0.0), t0.toSeq)
    // current window shifted hard to the right → positive total PSI,
    // and out-of-reference values clamp into the top bucket
    val shifted = (0 until 30).flatMap { d =>
      val base = if (d < 15) 0.0 else 100.0
      (0 until 10).map(i => (d * DayNs + i, base + i))
    }.toDF("ts", "value")
    val t1 = StatTests.psiOf(shifted).collect()
    assert(t1.map(_.getDouble(3)).sum > 0.25, t1.toSeq) // "investigate"
    // everything current landed in bucket 9 (clamped)
    val top = t1.find(_.getInt(0) == 9).get
    assert(top.getLong(2) == 150L, top)
  }

  test("mutualInfoOf: proportional table carries zero information, diagonal carries ln 2") {
    val s = spark; import s.implicits._
    def ev(rows: (String, Int, Int)*) = rows.flatMap { case (tp, d, n) =>
      (0 until n).map(i => (tp, d * DayNs + i))
    }.toDF("event_type", "ts")
    // proportional: every observed ratio O·N/(r·c) is exactly 1 → 0.0
    val indep = ev(("A", 0, 10), ("A", 1, 20), ("B", 0, 20), ("B", 1, 40))
    assert(StatTests.mutualInfoOf(indep).collect().head.getDouble(3) == 0.0)
    // diagonal 2×2: two cells at p = 1/2, ratio 2 → MI = ln 2
    val dep = ev(("A", 0, 10), ("B", 1, 10))
    val r = StatTests.mutualInfoOf(dep).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.693147, r) // round(ln 2, 6)
  }

  test("spearmanOf: monotone daily series hits ±1 exactly, constant side is NULL") {
    val s = spark; import s.implicits._
    def daily(xs: Seq[(Int, Double)]) = xs.zipWithIndex.flatMap {
      case ((n, v), d) => (0 until n).map(i => (d * DayNs + i, v))
    }.toDF("ts", "value")
    // volume up, value up → rho 1; ranks are identical so the Pearson
    // collapses to den/den — exactly 1.0
    val up = daily((1 to 8).map(d => (d, d.toDouble)))
    assert(StatTests.spearmanOf(up).collect().head.getDouble(1) == 1.0)
    // volume up, value down → −1
    val down = daily((1 to 8).map(d => (d, (9 - d).toDouble)))
    assert(StatTests.spearmanOf(down).collect().head.getDouble(1) == -1.0)
    // constant volume → zero variance on x2 → NULL, not NaN
    val const = daily(Seq.fill(8)((3, 1.0)).zipWithIndex
      .map { case ((n, _), d) => (n, d.toDouble) })
    assert(StatTests.spearmanOf(const).collect().head.isNullAt(1))
  }

  test("trimmedMeanOf: the 10-90 band drops the outlier the raw mean chases") {
    val s = spark; import s.implicits._
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val r = graft.operators.Relational.trimmedMeanOf(df, "grp", "v")
      .collect().head
    // thresholds: p10 = 1.9, p90 = 108.1 → keeps 2..9
    assert(r.getLong(1) == 8L && r.getDouble(2) == 5.5, r)
  }

  test("psiCombine: outer-merge shape (broadcast left-outer + anti-union) — row set equals the full_outer, cur-only buckets enter with c_ref=0, no SortMergeJoin in the executed plan") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // ref has buckets {0,1,2}; cur has {1,2,3} — bucket 3 is cur-only,
    // bucket 0 is ref-only; the merge must carry all four
    val ref = Seq((0, 5L), (1, 10L), (2, 15L)).toDF("bucket", "c_ref")
    val cur = Seq((1, 8L), (2, 12L), (3, 4L)).toDF("bucket", "c_cur")
    val combined = StatTests.psiCombine(ref, cur, buckets = 4)
    val rows = combined.collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === Seq(0, 1, 2, 3))
    val byBucket = rows.map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(byBucket(0) === ((5L, 0L)), "ref-only bucket lost its c_ref")
    assert(byBucket(3) === ((0L, 4L)), "cur-only bucket lost its c_cur")
    assert(byBucket(1) === ((10L, 8L)))
    // VERDICT r14 #5: the combine is the one delegation target of
    // psiPersisted AND the streaming drift monitor — it must ride the
    // broadcast shape, never a sort-merge (full_outer cannot broadcast)
    val p = combined.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"psiCombine sort-merges two <=buckets-row aggregates:\n$p")
  }

  test("psiPersisted serves the stored reference bit-identically to the inline test") {
    val streamed = StatTests.psiPersistedQuery(spark, sfDir).collect()
      .map(_.toString).toSeq
    val inline = StatTests.psi(spark, sfDir).collect().map(_.toString).toSeq
    assert(streamed == inline)
  }

  test("chi2Of: proportional table scores exactly zero, disjoint table scores N") {
    val s = spark; import s.implicits._
    // perfectly proportional: O == r·c/N in every cell → chi2 = 0.0
    def ev(rows: (String, Int, Int)*) = rows.flatMap { case (tp, d, n) =>
      (0 until n).map(i => (tp, d * DayNs + i))
    }.toDF("event_type", "ts")
    val indep = ev(("A", 0, 10), ("A", 1, 20), ("B", 0, 20), ("B", 1, 40))
    val r0 = StatTests.chi2Of(indep).collect().head
    assert(r0.getLong(0) == 90L && r0.getLong(3) == 1L)
    assert(r0.getDouble(4) == 0.0, r0)
    // fully dependent 2×2 (diagonal): chi2 = N
    val dep = ev(("A", 0, 10), ("B", 1, 10))
    val r1 = StatTests.chi2Of(dep).collect().head
    assert(r1.getLong(0) == 20L && r1.getDouble(4) == 20.0, r1)
  }

  test("chi2Of: NULL categoricals are excluded, not a phantom level") {
    val s = spark; import s.implicits._
    val base = Seq(("A", 0L * DayNs), ("A", 1L * DayNs),
      ("B", 0L * DayNs), ("B", 1L * DayNs))
    val clean = base.toDF("event_type", "ts")
    val withNulls = (base.map { case (t, d) => (Option(t), Option(d)) } ++
      Seq((None: Option[String], Some(0L)), (Some("A"), None: Option[Long])))
      .toDF("event_type", "ts")
    // a NULL event_type / ts row changes NOTHING: not n, not the level
    // counts, not the statistic (ADVICE r7 — defined once by an explicit
    // filter, not by count_distinct vs margin-join disagreement)
    assert(StatTests.chi2Of(withNulls).collect().toSeq ==
      StatTests.chi2Of(clean).collect().toSeq)
  }
}
