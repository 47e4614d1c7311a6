package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge for custom expressions (the classic
  * helpers are private[sql] in Spark 4). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Unpersist the RDD behind a localCheckpoint'ed frame (LogicalRDD is
    * execution-internal). Iterative drivers (connected components) retire
    * each round's checkpoint as soon as the next round materializes —
    * without this, a long-running stream embedding the loop accumulates
    * O(rounds × edges) dead blocks per microbatch until the ContextCleaner
    * happens to GC them. No-op for non-checkpoint plans. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Register a function into an EXISTING session's registry (sessionState
    * is private[sql]) — the runtime counterpart of builder-time
    * SparkSessionExtensions.injectFunction, for sessions already created
    * (shared test sessions, REPLs). */
  def registerFunction(spark: SparkSession, name: String,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      catalyst.FunctionIdentifier(name), info, builder)
}
