package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are deterministic STUBS (clearly marked below). Everything
  * Spark-side is real and designed for scale: binary columns ride parquet's
  * byte-array encoding, metadata lives in a typed struct so Catalyst can
  * prune it independently of the payload, and the decode stage runs as
  * `mapPartitions` over batches (the Scala analog of `mapInPandas` — one
  * iterator per partition, amortized per-batch setup for a real codec).
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(mime: String, nBytes: Long, checksum: Long)
  case class MediaRow(media_id: Long, media: Array[Byte], meta: MediaMeta)
  case class DecodedRow(media_id: Long, width: Int, height: Int,
                        n_frames: Int, feature: Array[Float])

  /** Build a media table from any source frame: payload as binary + struct
    * metadata. In production the binary comes off object storage; here any
    * string column stands in as the payload bytes. */
  def attachMedia(df: DataFrame, idCol: String, payloadCol: String,
                  mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        length(col("media")).cast("long").as("nBytes"),
        xxhash64(col("media")).as("checksum")))

  /** STUB decode kernel — a real implementation would hand the byte buffer to
    * an image/audio codec here. This deterministic fake derives "decoded"
    * dimensions from the payload so tests have stable oracles:
    * width = nBytes % 640 + 16, height = nBytes % 480 + 16,
    * n_frames = nBytes % 24 + 1. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length.toLong
    ((n % 640 + 16).toInt, (n % 480 + 16).toInt, (n % 24 + 1).toInt)
  }

  /** Decode + feature-extract stage: batch-shaped `mapPartitions`, one
    * kernel invocation per row but per-partition setup cost amortized (the
    * iterator shape a JNI codec binding needs). Feature vector is a
    * deterministic 8-dim byte-histogram sketch standing in for a real
    * embedding model. */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would init the codec once here
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          val hist = new Array[Float](8)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 5) += 1f; i += 1 }
          val total = math.max(bytes.length, 1).toFloat
          DecodedRow(id, w, h, f, hist.map(_ / total))
        }
      }
  }

  case class AudioFeatRow(media_id: Long, window_idx: Int, rms: Double)

  /** Audio feature extraction over the stubbed decode path: treat the binary
    * payload as unsigned 8-bit PCM, emit per-window RMS energy — the
    * windowed-feature shape (MFCC, spectrogram frames) a real audio model
    * consumes. Same batch-shaped `mapPartitions` contract as
    * [[decodeAndFeaturize]]: per-partition setup is where a real resampler
    * would initialize. RMS is a deterministic left-to-right fold. */
  def audioFeatures(spark: SparkSession, media: DataFrame,
                    windowSamples: Int): Dataset[AudioFeatRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          bytes.grouped(windowSamples).zipWithIndex.map { case (w, i) =>
            var s = 0.0
            var j = 0
            while (j < w.length) {
              val c = (w(j) & 0xFF) - 128.0
              s += c * c
              j += 1
            }
            AudioFeatRow(id, i,
              BigDecimal(math.sqrt(s / math.max(w.length, 1)))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
  }

  /** "Resize": at this layer a payload-size reduction — truncate the binary
    * to maxBytes (a real resize re-encodes; the plumbing — binary in, smaller
    * binary out, metadata updated — is identical). Pure column ops. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("media", expr(s"substring(media, 1, $maxBytes)"))
      .withColumn("meta", struct(
        col("meta.mime").as("mime"),
        length(col("media")).cast("long").as("nBytes"),
        xxhash64(col("media")).as("checksum")))

  /** Frame sampling for "video" payloads: treat the binary as fixed-size
    * frames, keep every Nth. Emits (media_id, frame_idx, frame) — the shape a
    * downstream vision model consumes. */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(col("meta.nBytes").cast("double") / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(col("n_frames") - 1, lit(0))),
          i => i % everyN === 0)))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
}
