package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics

/** Ordered-funnel and cohort-retention semantics on hand fixtures. */
class EventAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val DayNs = 86400000000000L

  private def eventsOf(rows: (Long, String, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("user_id", "event_type", "ts")
  }

  test("funnelOf: order is strict — a click BEFORE the first view does not convert") {
    val e = eventsOf(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
      (2L, "click", 5L), (2L, "view", 10L),                         // click too early
      (3L, "view", 10L), (3L, "click", 10L),                        // tie is NOT after
      (4L, "purchase", 1L))                                         // never viewed
    val got = EventAnalytics.funnelOf(e).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 1L, 1.0 / 3.0),
      (3, "purchase", 1L, 1.0)), got.toSeq)
  }

  test("funnelOf: later same-type events can still satisfy a later step") {
    // user's first click precedes the view, but a SECOND click follows it
    val e = eventsOf(
      (1L, "click", 5L), (1L, "view", 10L), (1L, "click", 15L))
    val got = EventAnalytics.funnelOf(e).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L), (2, 1L), (3, 0L)), got.toSeq)
  }

  test("funnelOf: empty first step yields zero rows with conv 0.0") {
    val e = eventsOf((1L, "error", 10L))
    val got = EventAnalytics.funnelOf(e).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 0.0), (0L, 0.0), (0L, 0.0)), got.toSeq)
  }

  test("cohortRetentionOf: users cohort by first-event week, multiple events in one week count once") {
    val e = eventsOf(
      (1L, "view", 0L), (1L, "view", 1L),            // week 0, twice
      (1L, "click", 8L * DayNs),                     // week 1 (day 8)
      (2L, "view", 7L * DayNs), (2L, "view", 15L * DayNs), // cohort wk 1, offset 1
      (3L, "view", 0L))                              // week 0 only
    val got = EventAnalytics.cohortRetentionOf(e).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L), got)
  }

  test("rfmSegmentsOf: quintile scores follow the global ranks per dimension") {
    val s = spark; import s.implicits._
    // 5 customers → rank r gets score 6−r in every dimension
    // cust: (last day, #orders, spend) — each dimension ordered differently
    val orders = Seq( // (cust, order, day-number, price)
      (1L, 10L, 5, 500.0), (2L, 11L, 4, 100.0),
      (2L, 12L, 1, 100.0), (3L, 13L, 3, 900.0),
      (3L, 14L, 1, 50.0), (3L, 15L, 1, 50.0),
      (4L, 16L, 2, 200.0), (5L, 17L, 1, 700.0))
      .map { case (c, o, d, p) => // epoch-ms timestamps: TZ-proof days
        (o, c, new java.sql.Timestamp(d * 86400000L), p)
      }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = EventAnalytics.rfmSegmentsOf(orders).collect()
      .map(r => r.getLong(0) -> r.getLong(7)).toMap
    // recency order: 1,4? no — days: c1=Jan5, c2=Jan4, c3=Jan3, c4=Jan2,
    // c5=Jan1 → r_scores 5,4,3,2,1. freq: c3=3, c2=2, c1=c4=c5=1 (ties →
    // custkey asc → ranks 3,4,5) → f: c3=5, c2=4, c1=3, c4=2, c5=1.
    // monetary: c3=1000, c5=700, c1=500, c2=200, c4=200 (tie → c2 first)
    // → m: c3=5, c5=4, c1=3, c2=2, c4=1.
    assert(got == Map(1L -> 533L, 2L -> 442L, 3L -> 355L, 4L -> 221L,
      5L -> 114L), got)
  }

  test("topPathsOf: only the first 5 events count, ordered by (ts, event_id)") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // user 1: six events; the 6th ("error") must not appear
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "view"),
      (4L, 1L, 40L, "click"), (5L, 1L, 50L, "purchase"), (6L, 1L, 60L, "error"),
      // user 2: same prefix; ts tie at 20 broken by event_id (8 before 9)
      (7L, 2L, 10L, "view"), (9L, 2L, 20L, "purchase"), (8L, 2L, 20L, "click"),
      (10L, 2L, 30L, "view"), (11L, 2L, 40L, "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.topPathsOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view>click>purchase>view>click", 1L),
      ("view>click>view>click>purchase", 1L)), got)
  }

  test("funnelWindowedOf: conversion outside the window does not count") {
    val e = eventsOf(
      (1L, "view", 100L), (1L, "click", 150L), (1L, "purchase", 190L), // in
      (2L, "view", 100L), (2L, "click", 250L),              // click too late
      (3L, "view", 100L), (3L, "click", 150L), (3L, "purchase", 201L)) // 3rd late
    val got = EventAnalytics.funnelWindowedOf(e, windowNs = 100L).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    // deadline = t1 + 100 = 200 inclusive
    assert(got.toSeq == Seq((1, 3L), (2, 2L), (3, 1L)), got.toSeq)
  }

  test("stickinessOf: WAU is the trailing-7-day distinct union, DAU/WAU bounded by 1") {
    val e = eventsOf(
      (1L, "view", 0L), (2L, "view", 0L),                  // day 0: u1,u2
      (1L, "view", 3L * DayNs),                            // day 3: u1
      (3L, "view", 8L * DayNs))                            // day 8: u3
    val got = EventAnalytics.stickinessOf(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // day 0: dau 2, wau 2; day 3: dau 1, wau {1,2}=2;
    // day 8: dau 1, wau = actives in days 2..8 = {1 (day 3), 3} = 2
    assert(got == Map(0L -> (2L, 2L), 3L -> (1L, 2L), 8L -> (1L, 2L)), got)
  }

  test("anomalyFlagsOf: the planted outlier is flagged, the bulk is not") {
    val s = spark; import s.implicits._
    // 20 values tightly around 10, one at 1000 — robust stats must flag
    // exactly the outlier (mean/stddev would let it inflate the spread)
    val ev = ((1 to 20).map(i => (i.toLong, "click", 10.0 + (i % 5) * 0.1)) :+
      (99L, "click", 1000.0))
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.anomalyFlagsOf(ev).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(99L), got.toSeq)
    assert(got.head.getDouble(5) > 3.5)
  }

  test("anomalyFlagsOf: a zero-MAD group flags nothing (guard, not infinity)") {
    val s = spark; import s.implicits._
    val ev = ((1 to 9).map(i => (i.toLong, "view", 5.0)) :+
      (10L, "view", 50.0)).toDF("event_id", "event_type", "value")
    // median=5, deviations: nine 0s and one 45 → MAD 0 → guard drops all
    assert(EventAnalytics.anomalyFlagsOf(ev).collect().isEmpty)
  }

  test("funnel plan: only equi-joins, no cartesian, events scanned per step filter") {
    val p = EventAnalytics.funnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  private def eventsIdOf(rows: (Long, Long, Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("user_id", "event_id", "ts", "event_type")
  }

  test("markovTransitionsOf: per-user adjacency, conditional p sums to 1 per src") {
    val e = eventsIdOf(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"), (1L, 3L, 30L, "B"),
      (2L, 4L, 10L, "B"), (2L, 5L, 20L, "A"))
    val got = EventAnalytics.markovTransitionsOf(e).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // u1: A→A, A→B; u2: B→A — no cross-user transition
    assert(got == Map(
      ("A", "A") -> (1L, 2L, 0.5), ("A", "B") -> (1L, 2L, 0.5),
      ("B", "A") -> (1L, 1L, 1.0)), got)
  }

  test("markovTransitionsOf: ts ties order by event_id") {
    val e = eventsIdOf(
      (1L, 2L, 10L, "B"), (1L, 1L, 10L, "A")) // same ts: id 1 first
    val got = EventAnalytics.markovTransitionsOf(e).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("A", "B")), got.toSeq)
  }

  test("sessionStatsOf: a gap equal to gapNs starts a new session (the >= rule)") {
    val e = eventsIdOf(
      (1L, 1L, 0L, "v"), (1L, 2L, 50L, "v"), (1L, 3L, 150L, "v"),
      (2L, 4L, 0L, "v"))
    val got = EventAnalytics.sessionStatsOf(e, gapNs = 100L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // u1: [0,50] then [150] (gap 100 >= 100 splits): 2 sessions, 1 bounce,
    // dwell 50+0, busiest 2; u2: one bounce session
    assert(got(1L) == (2L, 1L, 50L, 2L), got(1L))
    assert(got(2L) == (1L, 1L, 0L, 1L), got(2L))
  }

  test("changePointOf: the planted level shift is the unique |CUSUM| peak") {
    val s = spark; import s.implicits._
    // days 0-4 carry 2 events, days 5-9 carry 6 — shift after day 4
    val ev = (0 until 10).flatMap { d =>
      val n = if (d < 5) 2 else 6
      (0 until n).map(i => Tuple1(d * DayNs + i))
    }.toDF("ts")
    val got = EventAnalytics.changePointOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(_._2).toSeq == Seq.fill(5)(2L) ++ Seq.fill(5)(6L))
    // S' = 10·x − 40 per day: −20 ×5 then +20 ×5; peak |S| at day 4 only
    assert(got.filter(_._4).map(_._1).toSeq == Seq(4L), got.toSeq)
    assert(got.last._3 == 0L) // mean-centered CUSUM returns to zero
  }

  test("autocorrOf: an alternating series has r = −1 at lag 1 and +1 at lag 2") {
    val s = spark; import s.implicits._
    val ev = (0 until 10).flatMap { d =>
      (0 until (if (d % 2 == 0) 1 else 3)).map(i => Tuple1(d * DayNs + i))
    }.toDF("ts")
    val got = EventAnalytics.autocorrOf(ev, Seq(1, 2)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1)._1 == 9L && math.abs(got(1)._2 + 1.0) < 1e-12, got(1))
    assert(got(2)._1 == 8L && math.abs(got(2)._2 - 1.0) < 1e-12, got(2))
  }

  test("funnelLatencyOf: percentiles over converters only, per step pair") {
    val e = eventsOf(
      (1L, "view", 10L), (1L, "click", 30L), (1L, "purchase", 90L),
      (2L, "view", 0L), (2L, "click", 40L),
      (3L, "view", 0L)) // never clicks
    val got = EventAnalytics.funnelLatencyOf(e).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // click latencies {20, 40}: p50 = 30 (interpolated), p90 = 38
    assert(got(1) == (2L, 30.0, 38.0), got(1))
    // purchase latency {60}: both percentiles collapse to it
    assert(got(2) == (1L, 60.0, 60.0), got(2))
  }

  test("seqPairsOf: min-before-max detects ordered co-occurrence incl. repeats") {
    val e = eventsOf(
      (1L, "A", 1L), (1L, "B", 5L), (1L, "A", 10L),
      (2L, "B", 1L)) // single event: no pair, not even (B,B)
    val got = EventAnalytics.seqPairsOf(e).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "A") -> 1L, ("A", "B") -> 1L,
      ("B", "A") -> 1L), got)
  }

  test("userEntropyOf: uniform two-type user hits ln 2, one-track user hits 0") {
    val e = eventsOf(
      (1L, "A", 1L), (1L, "A", 2L), (1L, "B", 3L), (1L, "B", 4L),
      (2L, "A", 1L), (2L, "A", 2L), (2L, "A", 3L))
    val got = EventAnalytics.userEntropyOf(e).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == (4L, 2L, 0.693147), got(1L)) // round(ln 2, 6)
    assert(got(2L) == (3L, 1L, 0.0), got(2L))
  }

  test("typeOverlapOf: exact intersections; zero-overlap pairs are absent") {
    val e = eventsOf(
      (1L, "A", 1L), (2L, "A", 1L), (3L, "A", 1L),
      (2L, "B", 2L), (3L, "B", 2L),
      (9L, "C", 3L))
    val got = EventAnalytics.typeOverlapOf(e).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set(("A", "B")), got) // C shares nobody
    assert(got(("A", "B")) == (2L, 3L, 2L, 2.0 / 3.0), got)
  }

  test("theilSenOf: a planted outlier day cannot move the median slope") {
    val s = spark; import s.implicits._
    // counts 10+d (true slope 1), day 5 corrupted to 100: 36 of 45
    // pairwise slopes are still exactly 1.0 — the median is untouched
    val ev = (0 until 10).flatMap { d =>
      val n = if (d == 5) 100 else 10 + d
      (0 until n).map(i => (d * DayNs + i, "A"))
    }.toDF("ts", "event_type")
    val got = EventAnalytics.theilSenOf(ev).collect().head
    assert(got.getLong(1) == 45L)
    assert(got.getDouble(2) == 1.0, got.getDouble(2))
  }

  test("abTestOf: z reproduces the pooled two-proportion formula; degenerate is NULL") {
    val s = spark; import s.implicits._
    val ev = ((1 to 40).map(u => (u.toLong, "view")) ++
      (1 to 40).filter(_ % 3 == 0).map(u => (u.toLong, "purchase")))
      .toDF("user_id", "event_type")
    val r = EventAnalytics.abTestOf(ev).collect().head
    val (na, nb, ca, cb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == 40 && ca + cb == 13)
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pp = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    val z = java.math.BigDecimal.valueOf((pa - pb) / se)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(r.getDouble(6) == z, s"${r.getDouble(6)} vs $z")
    // everyone converts → se = 0 → NULL, not ±inf
    val all = (1 to 10).flatMap(u =>
      Seq((u.toLong, "view"), (u.toLong, "purchase")))
      .toDF("user_id", "event_type")
    assert(EventAnalytics.abTestOf(all).collect().head.isNullAt(6))
  }

  test("seasonalityOf: lift is the weekday average over the overall average") {
    val s = spark; import s.implicits._
    // one week: 1 event/day except epoch day 3 (a Sunday) with 8
    val ev = (0 until 7).flatMap { d =>
      (0 until (if (d == 3) 8 else 1)).map(i => Tuple1(d * DayNs + i))
    }.toDF("ts")
    val got = EventAnalytics.seasonalityOf(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) == (1L, 8L, 8.0, 4.0), got(0L)) // 8 vs overall 2 → 4×
    assert(got(1L) == (1L, 1L, 1.0, 0.5), got(1L))
    assert(got.size == 7)
  }
}
