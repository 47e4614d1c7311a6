package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-user session-stats accumulator: closed-session totals plus the
  * one OPEN session's (count, start, last) — a fixed handful of longs
  * per user, the entire state. */
case class SessionAggState(nSessions: Long, nBounce: Long, totalDur: Long,
  maxEvents: Long, lastTs: Long, curN: Long, curT0: Long)

/** Last event type per user — the whole Markov extractor state. */
case class MarkovState(last: String)

/** Streaming twins of the event-analytics operators
  * ([[graft.operators.EventAnalytics]]): the same per-user rules
  * applied incrementally with bounded keyed state, so a live dashboard
  * maintains what the batch queries compute — without re-scanning
  * history. Ordering contract (the [[StreamingFunnel]] discipline):
  * within a trigger rows are sorted per user before applying the rule;
  * across triggers events must arrive time-ordered per user — an
  * out-of-order arrival that would rewind state belongs in the DLQ
  * upstream, not silently misfolded here.
  */
object StreamingAnalytics {

  /** Incremental per-user sessionization: the batch gaps-and-islands
    * rule ([[graft.operators.EventAnalytics.sessionStatsOf]] — a gap
    * ≥ `gapNs` starts a new session) folded over the stream. State is
    * [[SessionAggState]]: closed-session totals + the open session —
    * seven longs per user, independent of history. Each trigger emits
    * the touched users' CURRENT stats with the open session counted
    * closed, so the last emit per user equals the batch query over the
    * concatenated input (parity spec). */
  def sessionStatsStream(stream: DataFrame,
      gapNs: Long = 7200L * 1000000000L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAggState,
        (Long, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var st = state.getOption
          .getOrElse(SessionAggState(0, 0, 0, 0, Long.MinValue, 0, 0))
        rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, ts) =>
          if (st.curN == 0) st = st.copy(curN = 1, curT0 = ts, lastTs = ts)
          else if (ts - st.lastTs >= gapNs)
            st = close(st).copy(curN = 1, curT0 = ts, lastTs = ts)
          else st = st.copy(curN = st.curN + 1, lastTs = ts)
        }
        state.update(st)
        val fin = if (st.curN > 0) close(st) else st
        Iterator((uid, fin.nSessions, fin.nBounce, fin.totalDur,
          fin.maxEvents))
      }
      .toDF("user_id", "n_sessions", "n_bounce", "total_dur_ns",
        "max_events")
  }

  /** Fold the open session into the closed totals. */
  private def close(st: SessionAggState): SessionAggState =
    st.copy(
      nSessions = st.nSessions + 1,
      nBounce = st.nBounce + (if (st.curN == 1) 1L else 0L),
      totalDur = st.totalDur + (st.lastTs - st.curT0),
      maxEvents = math.max(st.maxEvents, st.curN),
      curN = 0)

  /** Streaming Markov-transition extractor: per user, emit one
    * (user_id, src, dst) row per consecutive event pair — the stream
    * form of the batch lead-window adjacency
    * ([[graft.operators.EventAnalytics.markovTransitionsOf]]'s `bg`
    * stage). State is ONE string per user (the last event type), so a
    * pair spanning two triggers is still emitted exactly once. The
    * transition rows feed any downstream counter (foreachBatch upsert,
    * a streaming aggregation job); the parity spec pins the emitted
    * multiset equal to the batch pairs over concatenated batches. */
  def markovStream(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MarkovState, (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        val ordered = rows.toSeq.sortBy(r => (r._3, r._2)).map(_._4)
        val prev = state.getOption.map(_.last)
        val seq = prev.toSeq ++ ordered
        if (ordered.nonEmpty) state.update(MarkovState(ordered.last))
        seq.sliding(2).collect { case Seq(a, b) => (uid, a, b) }
      }
      .toDF("user_id", "src", "dst")
  }
}
