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
    * per group, never by stream history. Hashing ([[h60]], the batch
    * sketch's) and the estimate rule ([[Sketches.kmvEstimate]]) are
    * SHARED with [[Sketches.kmvDistinct]], so a drifting estimate is
    * structurally impossible; the parity spec pins stream == batch on
    * the concatenated data. Emits each touched group's current
    * (g, n_kept, est_distinct) per trigger (Update mode). */
  def kmvStream(stream: DataFrame, keyCol: String, valCol: String,
      k: Int = 64): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.filter(col(valCol).isNotNull)
      .select(col(keyCol).cast("string").as("g"),
        h60(col(valCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, (String, Int, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        val prev: Set[Long] =
          if (state.exists) state.get.mins.toSet else Set.empty
        val merged = (prev ++ rows.map(_._2)).toArray.sorted.take(k)
        state.update(KmvState(merged))
        val est = Sketches.kmvEstimate(merged.length,
          if (merged.length == k) merged.last else 0L, k)
        Iterator((g, merged.length, est))
      }
      .toDF("g", "n_kept", "est_distinct")
  }
}
