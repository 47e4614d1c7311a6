package graft

import org.apache.spark.sql.DataFrame

/** Materialization barrier for iterative/chained pipelines.
  *
  * `localCheckpoint(true)` snapshots the plan into a `LogicalRDD` that keeps
  * the origin plan's constraint expressions. When the origin plan joins a
  * previously checkpointed store (every microbatch of the document pipeline),
  * those constraints can reference attribute ids that are NOT in the
  * checkpoint's output; a later `Union` over such a frame then crashes in
  * Catalyst's constraint rewriting (`UnionBase.rewriteConstraints`:
  * `key not found: guid#N`). Creating the checkpoint with constraint
  * propagation disabled stores NO origin constraints — downstream plans stay
  * consistent, and nothing is lost across what is already a materialization
  * barrier.
  */
object Materialize {

  private val ConfKey = "spark.sql.constraintPropagation.enabled"

  /** Test hook: when set, accumulates the row count of every checkpointed
    * frame — lets specs assert that iterative cascades materialize
    * O(subtree) rows, never O(store) per level (cheap: counts the
    * already-materialized RDD). */
  @volatile var tally: Option[java.util.concurrent.atomic.AtomicLong] = None

  /** Eager local checkpoint whose LogicalRDD carries no origin constraints.
    * The conf flip is serialized (the flag is session-global): without the
    * lock, two concurrent checkpoints could interleave read/restore and
    * leave constraint propagation disabled for the whole session. Only the
    * LAZY checkpoint (plan + LogicalRDD creation, where constraints are
    * captured) runs under the lock; the materialization job runs outside,
    * so concurrent checkpoints don't serialize their Spark jobs.
    *
    * KNOWN LIMITATION: the flag is session-global, so any OTHER thread
    * planning unrelated queries on the same session during the (short,
    * planning-only) window plans with constraint propagation disabled —
    * potentially losing inferred filters for that one plan. This is a
    * performance effect only, never correctness. The pipeline drives
    * checkpoints from the single foreachBatch thread, so the window is
    * not concurrent in practice; callers sharing a session across threads
    * should route all checkpoints through this object (the lock) and
    * accept the rare planning-window de-optimization. */
  def checkpoint(df: DataFrame): DataFrame = checkpointCounted(df)._1

  /** Like [[checkpoint]] but also returns the materialized row count —
    * callers that would otherwise follow the checkpoint with an `isEmpty`
    * or `count()` probe get it for free (the eager materialization IS a
    * count), saving one Spark job per probe. The e2e dispatcher runs ~15
    * checkpoints per batch, so these probe jobs were a real constant cost
    * (VERDICT r3 perf note). */
  def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
    val out = checkpointLazy(df)
    val n = out.count() // materializes the checkpoint eagerly
    tally.foreach(_.addAndGet(n))
    (out, n)
  }

  /** Constraint-free local checkpoint WITHOUT the materializing count job.
    * For callers that immediately run their own full-scan action (e.g. a
    * fused convergence aggregate) and would pay a redundant count — the
    * caller's action materializes the checkpoint and must touch every
    * partition. Such callers should also feed [[tally]] themselves if they
    * know the row count. */
  def checkpointLazy(df: DataFrame): DataFrame = synchronized {
    val conf = df.sparkSession.conf
    val prior = conf.get(ConfKey, "true")
    conf.set(ConfKey, "false")
    try df.localCheckpoint(false)
    finally conf.set(ConfKey, prior)
  }
}
