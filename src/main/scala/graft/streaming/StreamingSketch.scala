package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.llm.Dedup.h60
import graft.operators.Sketches

/** Keyed KMV state: the ≤ k smallest distinct value hashes seen for one
  * group — the whole sketch, bounded by the parameter k. */
case class KmvState(mins: Array[Long])

/** Global bottom-k sample state: (hash, id, doubleBits(value)) triples
  * packed flat — ≤ 3k longs, the whole quantile sketch. */
case class BottomKState(packed: Array[Long])

/** Keyed HLL state: the 64 register maxima for one group — 64 bytes,
  * the whole sketch, independent of stream history. */
case class HllState(regs: Array[Byte])

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

  /** Per-group HyperLogLog maintenance over a stream — the third sketch
    * twin (CMS counters / KMV minima / HLL registers): keyed state is
    * the 64 register maxima ([[HllState]], 64 BYTES per group — the
    * smallest state of the family), updated register-by-register per
    * row; registers merge by max, so the per-trigger update is the
    * batch rule applied incrementally and replay-idempotent. Hash
    * split, ρ ([[Sketches.hllRho]] — the scalar twin of the batch
    * `bin()`-length rule) and the estimate ([[Sketches.hllEstimate]])
    * are all the batch sketch's definitions; the parity spec pins
    * stream == batch ([[Sketches.hllDistinct]]) over concatenated
    * batches. Emits each touched group's (g, n_regs, z, est_distinct)
    * per trigger (Update mode). */
  def hllStream(stream: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val keyType = stream.schema(keyCol).dataType
    stream.filter(col(valCol).isNotNull)
      .select(col(keyCol).cast("string").as("g"),
        h60(col(valCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HllState, (String, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        val regs = if (state.exists) state.get.regs.clone()
          else new Array[Byte](64)
        rows.foreach { case (_, h) =>
          val j = (h % 64).toInt
          val rho = Sketches.hllRho(h / 64).toByte
          if (rho > regs(j)) regs(j) = rho
        }
        state.update(HllState(regs))
        var z = 0L; var n = 0L; var j = 0
        while (j < 64) {
          z += 1L << (55 - regs(j))
          if (regs(j) > 0) n += 1
          j += 1
        }
        Iterator((g, n, z, Sketches.hllEstimate(z, n.toInt)))
      }
      .toDF("g", "n_regs", "z", "est_distinct")
      .withColumn("g", col("g").cast(keyType))
  }

  /** Streaming bottom-k sample maintenance — the quantile-sketch twin of
    * [[kmvStream]]: state is the ≤ k (hash, id, value) triples with the
    * smallest md5-derived hashes seen so far (the
    * [[Sketches.bottomKSample]] rule, one hash definition for stream and
    * batch), merged incrementally per trigger with the same O(log k)
    * bounded-set rejection, so working memory is O(k) regardless of
    * stream history. Each trigger emits the CURRENT sample (id, v, h) —
    * feed it to [[Sketches.quantileEstimates]] for running quantiles;
    * the parity spec pins the final sample equal to the batch sketch
    * over the concatenated batches (the bottom-k merge property). */
  def bottomKStream(stream: DataFrame, idCol: String, valCol: String,
      k: Int = 256, salt: String = "qsk"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(
        h60(concat(lit(s"$salt#"), col(idCol).cast("string"))).as("h"),
        col(idCol).cast("long").as("id"), col(valCol).cast("double").as("v"))
      .as[(Long, Long, Double)]
      // map-side pre-reduce (review r7b finding #4): the merge property
      // (bottom-k of a union == bottom-k of the bottom-ks) means each
      // input partition can keep its local ≤ k triples first, so the
      // single-key shuffle below ships ≤ k rows per partition instead
      // of the whole microbatch
      .mapPartitions { it =>
        val ord = Ordering.Tuple3[Long, Long, Double]
        val set = scala.collection.mutable.TreeSet.empty[(Long, Long, Double)](ord)
        it.foreach { t =>
          if (set.size < k) set += t
          else {
            val hi = set.last
            if (ord.lt(t, hi) && set.add(t)) set -= hi
          }
        }
        set.iterator
      }
      .groupByKey(_ => 0) // ONE global sketch: the state is k rows total
      .flatMapGroupsWithState[BottomKState, (Long, Double, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val ord = Ordering.Tuple3[Long, Long, Double]
        val set = scala.collection.mutable.TreeSet.empty[(Long, Long, Double)](ord)
        if (state.exists) {
          val s = state.get
          var i = 0
          while (i < s.packed.length / 3) {
            set += ((s.packed(i * 3), s.packed(i * 3 + 1),
              java.lang.Double.longBitsToDouble(s.packed(i * 3 + 2))))
            i += 1
          }
        }
        rows.foreach { case (h, id, v) =>
          if (set.size < k) set += ((h, id, v))
          else {
            val hi = set.last
            if (ord.lt((h, id, v), hi) && set.add((h, id, v))) set -= hi
          }
        }
        val packed = set.toArray.flatMap { case (h, id, v) =>
          Array(h, id, java.lang.Double.doubleToLongBits(v))
        }
        state.update(BottomKState(packed))
        set.iterator.map { case (h, id, v) => (id, v, h) }
      }
      .toDF("id", "v", "h")
  }
}
