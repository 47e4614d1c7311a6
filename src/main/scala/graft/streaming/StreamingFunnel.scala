package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental conversion funnel on a live event stream: the streaming
  * dual of [[graft.operators.EventAnalytics.funnelOf]].
  *
  * Per-user keyed state is the prefix of step times reached so far — K
  * longs per active user, nothing else — advanced by
  * `flatMapGroupsWithState`. A user advances to step k when a step-k
  * event arrives strictly AFTER their step-(k−1) time (the batch
  * operator's exact rule), and each advance is emitted exactly once, so
  * the running funnel report is a plain count of advance rows per step
  * — no distinct, no rescan of history.
  *
  * Ordering contract (the [[StreamingJobs.versionTransitions]]
  * discipline): rows within a microbatch are sorted per user; an event
  * older than the user's high-water mark CANNOT rewind consumed state —
  * it is emitted as a `late = true` row for the dead-letter channel
  * instead of being applied. Under per-user in-order delivery the
  * stream is batch-equal (spec pins this on real event data split into
  * microbatches); under disorder the divergence is visible as DLQ data,
  * never silent.
  *
  * Scale: state is O(active users · K) longs, bounded further by the
  * optional idle TTL; each microbatch shuffles once on user_id. */
object StreamingFunnel {

  case class FunnelState(times: List[Long], maxSeen: Long)

  /** One row per state transition: `step` is 1-based; `late` rows mark
    * dropped out-of-order events (step = the user's current step count,
    * diagnosable), and do not advance anything. */
  case class FunnelAdvance(user_id: Long, step: Int, ts: Long,
      late: Boolean = false)

  /** events: (user_id, event_type, ts-nanos). */
  def funnelAdvances(
      events: Dataset[(Long, String, Long)],
      steps: Seq[String] = Seq("view", "click", "purchase"),
      stateTtl: Option[String] = None): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty)
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // only funnel-relevant events reach the stateful operator — the
    // filter runs map-side, so state never sees unrelated types
    val relevant = events.filter(e => steps.contains(e._2))
    relevant.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (uid: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer[FunnelAdvance]()
            var cur = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
            rows.toSeq.sortBy(_._3).foreach { case (_, et, ts) =>
              if (ts < cur.maxSeen) {
                out += FunnelAdvance(uid, cur.times.length, ts, late = true)
              } else {
                val k = cur.times.length
                val advances = k < steps.length && et == steps(k) &&
                  (k == 0 || ts > cur.times.last)
                cur =
                  if (advances) {
                    out += FunnelAdvance(uid, k + 1, ts)
                    FunnelState(cur.times :+ ts, ts max cur.maxSeen)
                  } else cur.copy(maxSeen = ts max cur.maxSeen)
              }
            }
            state.update(cur)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  /** Running funnel counts from accumulated advance rows: each user
    * emits a step at most once, so a plain count per step equals the
    * batch operator's n_users. */
  def funnelReport(advances: DataFrame, nSteps: Int = 3): DataFrame = {
    val spark = advances.sparkSession
    val steps = spark.range(1, nSteps + 1).select(col("id").cast("int").as("step"))
    steps.join(
        advances.filter(!col("late")).groupBy("step")
          .agg(count(lit(1)).as("n_users")),
        Seq("step"), "left")
      .select(col("step"), coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("step")
  }
}
