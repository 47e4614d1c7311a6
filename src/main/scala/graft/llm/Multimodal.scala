package graft.llm

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column operators: opaque binary payloads + typed metadata,
  * with REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF/
  * TIFF readers ship with the JDK — no external dependency). Payloads that
  * no installed codec can read (audio, video containers, arbitrary bytes)
  * fall back to a deterministic stub so the pipeline shape stays total; the
  * `codec` column records which path produced each row.
  *
  * At 100 TB: binaries stay opaque until the latest possible stage (column
  * pruning keeps them out of shuffles); decode runs per-partition with
  * shared codec setup (mapPartitions + `ImageIO.setUseCache(false)` so no
  * executor-local tmp files), mirroring how a JNI/FFI decoder would be
  * pooled per executor core.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      sha256: String, width: Int, height: Int, features: Array[Float],
      codec: String)

  /** Feature geometry: mean luminance over a GridW x GridH cell grid. */
  private val GridW = 4
  private val GridH = 2
  val FeatureDim: Int = GridW * GridH

  /** Build a binary media column from the documents table (payload = utf-8
    * bytes standing in for encoded image/audio frames; none decode as
    * images, so they exercise the stub-fallback path — real decode is
    * covered by specs that synthesize PNG/JPEG payloads). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio")
          .as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Run `f` with an ImageIO reader bound to `bytes`; None when no codec
    * matches (or the payload is corrupt). */
  private def withReader[T](bytes: Array[Byte])(
      f: (String, javax.imageio.ImageReader) => T): Option[T] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      if (iis == null) return None
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            Some(f(reader.getFormatName.toLowerCase, reader))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode the first frame. */
  private def decodeImage(bytes: Array[Byte]): Option[(String, BufferedImage)] =
    withReader(bytes) { (fmt, r) => (fmt, r.read(0)) }
      .filter(_._2 != null)

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mean luminance (Rec.601, [0,1]) over a GridW x GridH cell grid —
    * exact per-cell means via a single pixel pass. (A production path on
    * very large images would progressively halve first; exactness is worth
    * more here and decode already touched every pixel.) */
  private def luminanceGrid(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](FeatureDim)
    val counts = new Array[Int](FeatureDim)
    var y = 0
    while (y < h) {
      val row = (y.toLong * GridH / h).toInt * GridW
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 +
          (rgb & 0xff) * 0.114) / 255.0
        val cell = row + (x.toLong * GridW / w).toInt
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(FeatureDim)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
  }

  /** Fallback for payloads no installed codec reads: deterministic
    * "dimensions" from payload length, "features" from payload bytes —
    * keeps the pipeline total and the schema uniform. */
  private def decodeStub(r: MediaRow, sha: String): MediaFeatures = {
    val n = r.payload.length
    MediaFeatures(r.doc_id, r.media_type, n, sha,
      width = 16 + n % 64, height = 16 + (n / 64) % 64,
      features = r.payload.take(FeatureDim).map(b => (b & 0xff) / 255.0f)
        .padTo(FeatureDim, 0f),
      codec = "stub")
  }

  /** Per-partition decode with one-time codec setup per partition. Real
    * ImageIO decode where a codec matches; stub fallback otherwise. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false) // no executor-local tmp files
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        // null payloads are data, not errors: one null row in a 100 TB
        // media table must not kill the decode stage — same contract as
        // frameSample's null-frame row
        if (r.payload == null)
          MediaFeatures(r.doc_id, r.media_type, 0, null, 0, 0,
            new Array[Float](FeatureDim), codec = "null")
        else {
          val sha = md.digest(r.payload).map("%02x".format(_)).mkString
          decodeImage(r.payload) match {
            case Some((fmt, img)) =>
              MediaFeatures(r.doc_id, r.media_type, r.payload.length, sha,
                img.getWidth, img.getHeight, luminanceGrid(img), fmt)
            case None => decodeStub(r, sha)
          }
        }
      }
    }
  }

  case class FrameRow(doc_id: Long, media_type: String, frame_idx: Int,
      frame_bytes: Array[Byte])

  /** Frame sampling: one row per sampled frame of a media payload, every
    * `everyN`th frame. Multi-frame formats the JDK decodes (animated GIF,
    * multi-page TIFF) yield REAL frames re-encoded as PNG; payloads no
    * codec reads fall back to deterministic 16-byte slices with a
    * size-derived frame count, keeping the pipeline total. Runs in the
    * per-partition codec loop (a video decoder would seek keyframes the
    * same way); frame payloads stay opaque binary so column pruning keeps
    * them out of downstream shuffles. */
  def frameSample(media: Dataset[MediaRow], everyN: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { r =>
        val real = withReader(r.payload) { (_, reader) =>
          val n = reader.getNumImages(true)
          (0 until n by everyN).map(i =>
            FrameRow(r.doc_id, r.media_type, i, encodePng(reader.read(i))))
        }
        real.getOrElse {
          // stub fallback — identical indices/slices to the relational
          // form this replaced: n = max(1, len/16), every everyN-th;
          // null payloads yield the single null-bytes frame the old
          // null-tolerant substring form produced, not an NPE
          if (r.payload == null)
            Seq(FrameRow(r.doc_id, r.media_type, 0, null))
          else {
            val n = math.max(1, r.payload.length / 16)
            (0 until n by everyN).map(i => FrameRow(r.doc_id, r.media_type,
              i, r.payload.slice(i * 16, i * 16 + 16)))
          }
        }
      }
    }.toDF()
  }

  /** REAL pixel resize: decode, rescale the pixel buffer with Graphics2D
    * bilinear interpolation, re-encode as PNG. Payloads no codec reads pass
    * through unchanged (they carry no pixels to rescale). Runs in the same
    * per-partition codec loop as decode. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int)
      : Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        decodeImage(r.payload) match {
          case Some((_, img)) =>
            val dst = new BufferedImage(targetW, targetH,
              BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", bos)
            r.copy(payload = bos.toByteArray)
          case None => r
        }
      }
    }
  }

  case class AudioMeta(doc_id: Long, media_type: String, codec: String,
      sample_rate: java.lang.Float, channels: java.lang.Integer,
      frames: java.lang.Long, duration_sec: java.lang.Double)

  /** Audio header decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * parsers ship with the JDK — no external dependency): sample rate,
    * channel count, frame length, and duration per payload. Payloads that
    * are not a recognized audio container get `codec = "unknown"` with null
    * metrics; null payloads get `codec = "null"` (data, not an error —
    * same contract as decodeFeatures/frameSample). Runs in the same
    * per-partition codec loop as the image operators; only the header is
    * parsed, the sample data is never materialized.
    */
  def audioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.payload == null)
          AudioMeta(r.doc_id, r.media_type, "null", null, null, null, null)
        else try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new ByteArrayInputStream(r.payload))
          val fmt = aff.getFormat
          val frames = aff.getFrameLength.toLong
          val dur: java.lang.Double =
            if (frames >= 0 && fmt.getFrameRate > 0)
              frames / fmt.getFrameRate.toDouble
            else null
          AudioMeta(r.doc_id, r.media_type,
            aff.getType.getExtension.toLowerCase,
            fmt.getSampleRate, fmt.getChannels, frames, dur)
        } catch {
          case scala.util.control.NonFatal(_) =>
            AudioMeta(r.doc_id, r.media_type, "unknown", null, null, null,
              null)
        }
      }
    }
  }

  /** Oracle-checkable slice of the pipeline: byte length + sha256 are
    * computable by both engines; pixel decode has no DuckDB oracle and is
    * covered by unit tests on synthesized PNG/JPEG payloads instead. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha_hex"))
      .orderBy("doc_id")

  /** Image NEAR-duplicate pairs: decoded luminance-grid features fed
    * into the sign-LSH ANN pair kernel
    * ([[graft.llm.Similarity.annPairsOf]]) — the image analogue of
    * MinHash text dedup. Re-encodes (png↔jpeg), resizes, and light
    * edits keep the grid luminance, so they pair at high cosine, while
    * different scenes don't (grid features are non-negative, but a 4×2
    * gradient vs its inverse still cosines ≈ 0.5 ≪ the 0.9 gate).
    * Only REAL-codec decodes reach the kernel: stub fallbacks (webp,
    * corrupt payloads — their "features" are container header bytes,
    * not pixels, so two different undecodable files would falsely
    * pair) and null payloads are excluded by codec, and zero-feature
    * rows (all-black frames) cannot cosine-match and are dropped.
    * Spec-covered — binary decode has no SQL oracle; the pair kernel
    * itself is the oracle-checked annPairs machinery,
    * bucketed-never-all-pairs at scale. */
  def imageNearDup(media: Dataset[MediaRow],
      minSim: Double = 0.9): DataFrame =
    graft.llm.Similarity.annPairsOf(imageFeatureVectors(media),
      minSim, nPlanes = 8, dim = FeatureDim)

  /** The (vec_id, embedding) feature frame the near-dup kernels consume:
    * decoded luminance grids of REAL-codec image rows only — stub
    * fallbacks (their "features" are container header bytes, not
    * pixels), null payloads, and zero-feature all-black frames are
    * excluded exactly as [[imageNearDup]] requires. Shared by the batch
    * pair kernel and the cross-batch signature store
    * ([[graft.streaming.StreamingRelease.multimodalIngestNearDupBatch]]),
    * so "an image's signature" means one thing engine-wide. */
  def imageFeatureVectors(media: Dataset[MediaRow]): DataFrame =
    decodeFeatures(media).toDF()
      .filter(col("media_type") === "image")
      .filter(!col("codec").isin("stub", "null"))
      .filter(aggregate(transform(col("features"),
        v => abs(v.cast("double"))), lit(0.0), (a, b) => a + b) > 0)
      .select(col("doc_id").as("vec_id"),
        col("features").as("embedding"))

  /** (doc_id, cluster_id) media clusters from [[imageNearDup]] pairs —
    * min-id connected components over the pair graph (the
    * [[graft.operators.ConnectedComponents]] star machinery: O(log² n)
    * rounds, never a driver-side union-find). Docs in no pair are
    * omitted; [[multimodalRelease]] treats absence as "no media
    * duplicate", so singletons keep without carrying rows. */
  def imageNearDupClusters(media: Dataset[MediaRow],
      minSim: Double = 0.9): DataFrame = {
    val pairs = imageNearDup(media, minSim)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    graft.operators.ConnectedComponents.components(pairs)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  /** Multimodal RELEASE composition (VERDICT r9 #5 / r10 #4): one
    * manifest over documents AND their media. A doc survives iff
    *
    *   (a) it is the TEXT keep-one survivor (min doc_id per text hash —
    *       [[graft.llm.Dedup.keepOneIds]], the one keep policy every
    *       release composition joins against), AND
    *   (b) it is the canonical (min doc_id) member of its MEDIA
    *       near-dup cluster — a doc whose image duplicates an earlier
    *       doc's is dropped even when its text is novel (the
    *       re-encoded-screenshot case text dedup cannot see).
    *
    * `mediaClusters` is (doc_id, cluster_id) from ANY media clustering —
    * pixel-level [[imageNearDupClusters]] in production (spec-covered:
    * a planted png↔jpeg re-encode drops), exact payload-hash clusters
    * in the oracle row (engine-neutral, so the COMPOSITION is
    * hash-pinned end to end). Docs with no media row pass (b)
    * trivially. Output is the per-language release accounting
    * (lang, n_docs, tot_tokens).
    *
    * Scale: two hash aggregations + two semi/anti equi-joins + one
    * per-lang aggregate — every join keyed, nothing quadratic; the
    * cluster table is |paired media| rows, not |corpus|. */
  def multimodalRelease(docs: DataFrame,
      mediaClusters: DataFrame): DataFrame = {
    val textKeep = graft.llm.Dedup.keepOneIds(docs)
    val mediaKeep = mediaClusters.groupBy("cluster_id")
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val mediaDrop = mediaClusters.select("doc_id").distinct()
      .join(mediaKeep, Seq("doc_id"), "left_anti")
    docs.join(textKeep, Seq("doc_id"), "left_semi")
      .join(mediaDrop, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("tot_tokens"))
      .orderBy("lang")
  }

  /** Driver-contract query (`q_multimodal_release`): the composition
    * over [[mediaTable]]'s image-typed docs (doc_id % 2 = 0), with
    * media clusters keyed by the sha256 of the payload's first-16-chars
    * slice — a byte-exact media fingerprint both engines compute, so
    * the DuckDB oracle replays the WHOLE composition (text keep-one ∧
    * media-canonical ∧ accounting) and hash-pins it; two docs sharing a
    * 16-char prefix share media, which makes the media policy drop docs
    * the text policy alone would keep. Pixel-clustered input is the
    * spec's job ([[imageNearDupClusters]] — no SQL oracle can decode). */
  def multimodalReleaseQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val mc = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        sha2(substring(col("text"), 1, 16).cast("binary"), 256)
          .as("cluster_id"))
    multimodalRelease(docs, mc)
  }
}
