package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Sketches

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
}
