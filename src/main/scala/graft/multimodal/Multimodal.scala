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
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DELIBERATE STUB ([[MediaCodec.decodeStub]]): a deterministic fake
  * that derives "decoded" dimensions/samples from the payload bytes.
  * Everything around it — schemas, batching, partitioning, feature
  * shapes, resize/frame-sample arithmetic — is real and tested, so
  * swapping in a real codec changes exactly one function.
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
    /** STUB — stands in for a real image/audio decoder (none available
      * in this container). Deterministic in the payload bytes: every
      * executor, every run, same output. Replace with a real codec
      * (e.g. javax.imageio / ffmpeg bindings) in production. */
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
    * exactly like Arrow batch size would. */
  def extractFeatures(media: Dataset[MediaFile], batchSize: Int = 64,
      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val d = MediaCodec.decodeStub(m)
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
