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

  test("funnel plan: only equi-joins, no cartesian, events scanned per step filter") {
    val p = EventAnalytics.funnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }
}
