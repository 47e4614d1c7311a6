package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata, with
  * the decode step stubbed (no image/audio libs in this container). The
  * Spark-side shape is real: binary columns, per-partition batched decode,
  * deterministic fake features, tested schemas.
  *
  * At 100 TB: binaries stay opaque until the latest possible stage (column
  * pruning keeps them out of shuffles); decode runs per-partition with
  * shared "codec" setup (mapPartitions), mirroring how a JNI/FFI decoder
  * would be pooled per executor core.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      sha256: String, width: Int, height: Int, features: Array[Float])

  /** Build a binary media column from the documents table (payload = utf-8
    * bytes standing in for encoded image/audio frames). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio")
          .as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would call an image/audio codec here
    * (per-partition codec reuse). The fake is deterministic: "dimensions"
    * derived from payload length, "features" from payload bytes. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(r.payload).map("%02x".format(_)).mkString
    val n = r.payload.length
    MediaFeatures(r.doc_id, r.media_type, n, sha,
      width = 16 + n % 64, height = 16 + (n / 64) % 64,
      features = r.payload.take(8).map(b => (b & 0xff) / 255.0f))
  }

  /** Per-partition decode with one-time "codec" setup per partition. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (pooled decoder handle)
      it.map(decodeStub)
    }
  }

  /** Frame sampling plumbing: one row per sampled "frame" of a media
    * payload. A real decoder would seek keyframes; the stub derives a
    * deterministic frame count from payload size and samples every
    * `everyN`th index. The Spark shape is the point: explode is pipelined
    * (no shuffle), and frame payloads stay opaque binary slices so column
    * pruning keeps them out of any downstream shuffle. */
  def frameSample(media: Dataset[MediaRow], everyN: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.toDF()
      .withColumn("n_frames", greatest(lit(1), length(col("payload")) / 16))
      .select(col("doc_id"), col("media_type"),
        posexplode(sequence(lit(0), (col("n_frames") - 1).cast("int"),
          lit(everyN))).as(Seq("frame_ord", "frame_idx")),
        col("payload"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        // stub "frame" = 16-byte payload slice at the frame offset
        expr("substring(payload, frame_idx * 16 + 1, 16)").as("frame_bytes"))
  }

  /** Resize plumbing: rescale decoded features to a target geometry. A real
    * implementation would rescale pixel buffers in the same per-partition
    * codec loop; the stub rescales the deterministic fake features so the
    * invariants (geometry columns, feature length preserved, per-partition
    * execution) are testable. */
  def resize(features: Dataset[MediaFeatures], targetW: Int, targetH: Int)
      : Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions { it =>
      // per-partition scaler init would go here
      it.map { f =>
        val sx = targetW.toFloat / math.max(1, f.width)
        val sy = targetH.toFloat / math.max(1, f.height)
        f.copy(width = targetW, height = targetH,
          features = f.features.map(v => v * sx * sy))
      }
    }
  }

  /** Oracle-checkable slice of the pipeline: byte length + sha256 are
    * computable by both engines; the stubbed feature columns are covered by
    * unit tests instead. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha_hex"))
      .orderBy("doc_id")
}
