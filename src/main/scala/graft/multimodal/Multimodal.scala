package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * fixed-size batches — the Scala analogue of the Python
  * `mapInPandas(batch)` shape (iterator of record batches in, iterator
  * of record batches out), implemented with `Dataset.mapPartitions`
  * over case-class rows.
  *
  * IMAGES DECODE FOR REAL ([[MediaCodec.decodeImageIO]]): the
  * PNG/BMP/GIF/JPEG readers of pure-JVM `javax.imageio` ship in every
  * JDK, no native codecs needed — MultimodalSpec round-trips
  * ImageIO-written PNGs through it pixel-exactly. Audio/video remain
  * a DELIBERATE STUB ([[MediaCodec.decodeStub]] — no pure-JVM codecs
  * exist): a deterministic fake that derives "decoded" samples from
  * the payload bytes. The REGISTERED `media_features` gate also stays
  * on the stub, because the driver testdata has no media table — the
  * synthetic payloads are text bytes, not images. Everything around
  * the codec seam — schemas, batching, partitioning, feature shapes,
  * resize/frame-sample arithmetic — is shared by both paths, so
  * [[MediaCodec.decode]] dispatches per kind and an audio codec would
  * change exactly one function.
  *
  * Scale posture: payloads never leave executors; feature extraction is
  * a narrow per-partition map (no shuffle); batch size bounds peak
  * memory per task the same way Arrow batch size does for Pandas UDFs.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaFile(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      mime: String,
      width: Int,      // images/video; 0 otherwise
      height: Int,
      duration_ms: Long) // audio/video; 0 for images

  /** Decoded form (stub): per-channel byte planes for images, PCM-ish
    * samples for audio, frame offsets for video. */
  case class Decoded(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      samples: Array[Float])

  /** Extracted feature row — fixed-width vector + scalar stats. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      mean_sample: Float,
      feature: Array[Float])

  object MediaCodec {
    /** REAL image decode via pure-JVM `javax.imageio` (PNG, BMP, GIF
      * and JPEG readers ship in every JDK). Pixels come out as
      * row-major RGB-interleaved floats in [0, 1] — `samples` length
      * is width × height × 3, the layout [[resize]]/[[sampleFrames]]
      * already consume. Returns None when the payload is not a
      * decodable image (ImageIO reads headers first, so garbage bytes
      * cost a sniff, not an exception storm); callers choose the
      * fallback — [[decode]] degrades to the deterministic stub so a
      * corrupt blob can never fail a 100 TB task. */
    def decodeImageIO(m: MediaFile): Option[Decoded] = {
      val img =
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.bytes)))
        catch { case _: java.io.IOException => None }
      img.map { bi =>
        val w = bi.getWidth
        val h = bi.getHeight
        val samples = new Array[Float](w * h * 3)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = bi.getRGB(x, y)
            samples(i) = ((rgb >> 16) & 0xFF) / 255.0f
            samples(i + 1) = ((rgb >> 8) & 0xFF) / 255.0f
            samples(i + 2) = (rgb & 0xFF) / 255.0f
            i += 3
            x += 1
          }
          y += 1
        }
        Decoded(m.media_id, m.kind, w, h, channels = 3, samples)
      }
    }

    /** Production dispatcher over the codec seam: image payloads
      * decode for real, audio/video fall to the stub (no pure-JVM
      * codecs exist), and an image payload ImageIO cannot read
      * degrades to the stub instead of failing the task. */
    def decode(m: MediaFile): Decoded =
      if (m.kind == "image") decodeImageIO(m).getOrElse(decodeStub(m))
      else decodeStub(m)

    /** STUB — stands in for the audio/video decoders (none available
      * pure-JVM) and the registered deterministic gate for the
      * synthetic media table (whose payloads are text bytes, not
      * images — the driver testdata has no media fixtures).
      * Deterministic in the payload bytes: every executor, every run,
      * same output. */
    def decodeStub(m: MediaFile): Decoded = {
      // Empty payload -> empty samples (downstream features/mean fold
      // to 0), not a modulo-by-zero crash.
      val n = math.min(m.bytes.length, 256)
      val samples = new Array[Float](n)
      var i = 0
      while (i < n) {
        samples(i) = (m.bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      val w = if (m.width > 0) m.width else math.max(1, math.sqrt(n.toDouble).toInt)
      val h = if (m.height > 0) m.height else math.max(1, n / w)
      Decoded(m.media_id, m.kind, w, h, channels = 3, samples)
    }

    /** Resize = sample-space interpolation over the decoded plane
      * (real arithmetic, stub input). */
    def resize(d: Decoded, newW: Int, newH: Int): Decoded = {
      val out = new Array[Float](math.max(1, newW * newH min d.samples.length))
      var i = 0
      while (i < out.length) {
        val src = (i.toLong * d.samples.length / out.length).toInt
        out(i) = d.samples(src)
        i += 1
      }
      d.copy(width = newW, height = newH, samples = out)
    }

    /** Frame sampling for video-kind media: every k-th sample block. */
    def sampleFrames(d: Decoded, everyK: Int): Array[Array[Float]] =
      d.samples.grouped(math.max(1, d.samples.length / math.max(1, everyK)))
        .take(everyK).map(_.toArray).toArray
  }

  /** Deterministic synthetic media table derived from `documents` —
    * the payload is the UTF-8 text bytes (an opaque blob as far as the
    * pipeline is concerned), with kind/mime assigned round-robin. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      lit("application/octet-stream").as("mime"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(64)).otherwise(lit(0))
        .cast("int").as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(64)).otherwise(lit(0))
        .cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, col("n_chars") * 10L)
        .otherwise(lit(0L)).as("duration_ms"))

  /** Batched per-partition decode + feature extraction — the
    * mapInPandas-shaped hot path. `batchSize` bounds per-task memory
    * exactly like Arrow batch size would. The codec is the one
    * pluggable seam: the default stub is the registered deterministic
    * gate over the synthetic (text-byte) table; pass
    * [[MediaCodec.decode]] for real ImageIO decoding of genuine image
    * payloads (MultimodalSpec drives that path end-to-end). */
  def extractFeatures(media: Dataset[MediaFile], batchSize: Int = 64,
      featureDim: Int = 8,
      codec: MediaFile => Decoded = MediaCodec.decodeStub)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val d = codec(m)
          // fp64 accumulation with a single fp32 rounding at the end:
          // better numerics than a running fp32 `+=`, and the ordered
          // left fold is exactly mirrorable in the DuckDB oracle
          // (list_reduce over DOUBLE, then one CAST to REAL).
          val acc = new Array[Double](featureDim)
          var meanAcc = 0.0
          var i = 0
          while (i < d.samples.length) {
            acc(i % featureDim) += d.samples(i)
            meanAcc += d.samples(i)
            i += 1
          }
          val feat = Array.tabulate(featureDim)(j => acc(j).toFloat)
          val mean =
            if (d.samples.isEmpty) 0f
            else (meanAcc / d.samples.length).toFloat
          MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, mean, feat)
        }
      }
    }
  }

  /** Typed loader over the synthetic table. */
  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    syntheticMedia(docs).as[MediaFile]
  }

  /** Byte-level stats per media kind — pure column ops on the binary
    * payload (oracle-checkable: octet_length in DuckDB). */
  def byteStatsByKind(media: DataFrame): DataFrame =
    media
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(length(col("bytes"))).as("total_bytes"),
        min(length(col("bytes"))).cast("long").as("min_bytes"),
        max(length(col("bytes"))).cast("long").as("max_bytes"))
}
