package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.llm.Dedup.h60
import graft.operators.Sketches

/** Keyed KMV state: the ≤ k smallest distinct value hashes seen for one
  * group — the whole sketch, bounded by the parameter k. */
case class KmvState(mins: Array[Long])

/** Streaming sketch maintenance: profile a live ingest WITHOUT storing
  * it. The Count-Min counters are a plain streaming aggregation over the
  * same bucket expansion the batch sketch uses ([[Sketches.bucketRows]]
  * — one hash definition, stream and batch cannot disagree), and the
  * whole state is the d·w counter table, bounded by the parameter choice
  * rather than the stream's history. Emit in `complete` (the sketch IS
  * small) or `update` mode; a StreamingSketchSpec proves final counters
  * equal the batch sketch over the same data. */
object StreamingSketch {

  /** Count-Min counters (j, b, c) over a streaming value column. */
  def cmsStream(stream: DataFrame, valCol: String, d: Int = 4,
      w: Int = 1024): DataFrame =
    Sketches.bucketRows(stream, valCol, d, w)
      .groupBy("j", "b").agg(count(lit(1)).as("c"))

  /** Per-group KMV distinct-count maintenance over a stream: keyed state
    * is the ≤ k smallest distinct hashes ([[KmvState]]) — bounded by k
    * per group, never by stream history, and the per-trigger merge is
    * incremental (a bounded sorted set: values above the current kth
    * minimum are rejected in O(log k) without buffering the batch), so
    * working memory stays O(k) even when one hot group receives millions
    * of distinct values in a single microbatch. Hashing is the batch
    * sketch's [[h60]]; the estimate is [[Sketches.kmvEstimate]], the
    * scalar twin of the batch column rule (SketchesSpec pins the two
    * equal over an adversarial grid). The parity spec additionally pins
    * stream == batch end-to-end on concatenated batches. Emits each
    * touched group's current (g, n_kept, est_distinct) per trigger
    * (Update mode); `g` is cast back to the input key column's type so
    * the output schema matches [[Sketches.kmvDistinct]]'s. */
  def kmvStream(stream: DataFrame, keyCol: String, valCol: String,
      k: Int = 64): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val keyType = stream.schema(keyCol).dataType
    stream.filter(col(valCol).isNotNull)
      .select(col(keyCol).cast("string").as("g"),
        h60(col(valCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, (String, Int, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        val mins = scala.collection.mutable.TreeSet.empty[Long]
        if (state.exists) mins ++= state.get.mins
        rows.foreach { case (_, h) =>
          if (mins.size < k) mins += h
          else {
            val hi = mins.last
            if (h < hi && mins.add(h)) mins -= hi
          }
        }
        val merged = mins.toArray
        state.update(KmvState(merged))
        val est = Sketches.kmvEstimate(merged.length,
          if (merged.length == k) merged.last else 0L, k)
        Iterator((g, merged.length, est))
      }
      .toDF("g", "n_kept", "est_distinct")
      .withColumn("g", col("g").cast(keyType))
  }
}
