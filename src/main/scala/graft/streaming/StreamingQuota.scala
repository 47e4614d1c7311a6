package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Keyed quota state: how many documents this group has SEEN so far
  * (admitted + dropped — the running admission index, compared against
  * the quota to decide). One long per live group — state is
  * group-count-bounded, never stream-history-bounded. */
case class QuotaState(seen: Long)

/** Per-source ingestion QUOTA enforcement on a live stream: admit the
  * first `quota` documents of each source (in stream arrival order) and
  * route the overflow to a drop channel — the live counterpart of the
  * batch mixing caps ([[graft.llm.Sampling.sourceMix]] /
  * `temperatureMixOf`): a misbehaving crawler or replayed feed cannot
  * flood one source past its budget no matter how long the stream runs.
  *
  * Admission is decided per (source) group with
  * `flatMapGroupsWithState`; every row is EMITTED with an `admitted`
  * flag (the DLQ-as-data discipline of
  * [[StreamingJobs]] — drops are data, not silence), so the caller
  * splits the stream with one filter each way.
  *
  * Determinism caveat, stated rather than hidden: arrival order WITHIN a
  * microbatch follows the shuffle's row order for the group, so which
  * particular over-quota doc is dropped is stable for a replay of the
  * same batches (same partitioning ⇒ same order) but is NOT a pure
  * function of the document set the way the batch hash-bucket mix is —
  * quotas are about bounding volume, not reproducible sampling; use
  * `sourceMix` downstream when the KEPT SET itself must be replayable.
  */
object StreamingQuota {

  /** stream: (doc_id: long, source: string). Emits (doc_id, source,
    * admitted: int, seq: long) where seq is the 1-based admission index
    * within the source (over-quota rows keep the would-be index). */
  def quotaStream(stream: DataFrame, quota: Long): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("doc_id").cast("long"), col("source").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[QuotaState, (Long, String, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (src, rows, state) =>
        var n = if (state.exists) state.get.seen else 0L
        val out = rows.map { case (id, _) =>
          n += 1
          (id, src, if (n <= quota) 1 else 0, n)
        }.toVector // force: state.update must see the final count
        state.update(QuotaState(n))
        out.iterator
      }
      .toDF("doc_id", "source", "admitted", "seq")
  }
}
