package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF capability demo (SURVEY §2.7 "UDAF: none in reference —
  * Aggregator available if needed"): bounded top-k values per group.
  *
  * The buffer is a sorted vector capped at k, so partial aggregation keeps
  * shuffle payloads O(k) per group regardless of group size — the property
  * that matters at 100 TB (a collect_list + sort would ship every value). */
class TopKAggregator(k: Int)
    extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.size < k) (buf :+ v).sortBy(-_)
    else if (v > buf.last) (buf.init :+ v).sortBy(-_)
    else buf
  }

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    insert(buf, v)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sortBy(-_).take(k)

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
