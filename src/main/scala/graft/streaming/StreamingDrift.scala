package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.StatTests

/** Streaming drift monitoring: maintain the CURRENT-window bucket
  * histogram of a live value stream against a persisted reference
  * histogram — the production shape of [[StatTests.psiOf]] (the
  * reference is a trained artifact computed once at snapshot time; the
  * monitor never re-scans history). The histogram is a plain streaming
  * aggregation with `buckets` rows of state — the CMS-counter shape
  * ([[StreamingSketch.cmsStream]]) with the [[StatTests.bucketCol]]
  * bucket rule, so batch and stream cannot disagree on binning.
  *
  * Spark disallows joins after streaming aggregations, so the monitor
  * emits the bucket COUNTS (complete mode — the state IS ≤ `buckets`
  * rows); the consumer (foreachBatch, a dashboard job) combines them
  * with the reference through [[StatTests.psiTermsOf]] — the SAME
  * smoothing/term rule as the batch test, which is exactly what the
  * parity spec pins.
  */
object StreamingDrift {

  /** Current-window bucket counts (bucket, c_cur) of a streaming value
    * column, binned by the reference edges. */
  def bucketCountStream(stream: DataFrame, vmin: Double, vmax: Double,
      buckets: Int = 10): DataFrame =
    stream
      .select(StatTests.bucketCol(col("value"), lit(vmin), lit(vmax),
        buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_cur"))

  /** Combine a reference histogram (bucket, c_ref) with the monitor's
    * current counts (bucket, c_cur) into per-bucket PSI terms — a
    * BATCH step over two ≤ `buckets`-row frames; the combine rule
    * itself lives with the batch test ([[StatTests.psiCombine]], also
    * used by the persisted-reference path) and this is a thin
    * streaming-side alias. */
  def psiReport(refHist: DataFrame, curCounts: DataFrame,
      buckets: Int = 10): DataFrame =
    StatTests.psiCombine(refHist, curCounts, buckets)
}
