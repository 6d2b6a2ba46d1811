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

  /** STUB decode kernel — the fallback for payloads in no recognized format
    * (real parsers for BMP and WAV below). This deterministic fake derives
    * "decoded" dimensions from the payload so tests have stable oracles:
    * width = nBytes % 640 + 16, height = nBytes % 480 + 16,
    * n_frames = nBytes % 24 + 1. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length.toLong
    ((n % 640 + 16).toInt, (n % 480 + 16).toInt, (n % 24 + 1).toInt)
  }

  // ------------------------------------------------ real pure-JVM decoders

  /** Decoded header facts + the payload slice (pixel array / PCM data) the
    * feature stage should read — NOT the container headers. */
  case class Decoded(width: Int, height: Int, nFrames: Int,
                     payloadStart: Int, payloadLen: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def s32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** REAL BMP decoder (BITMAPFILEHEADER + BITMAPINFOHEADER, the uncompressed
    * Windows DIB layout): 'BM' magic, pixel-array offset at byte 10, signed
    * width/height at 18/22 (negative height = top-down rows), bpp at 28.
    * Rows are 4-byte aligned; the payload slice is the pixel array, so the
    * feature histogram downstream reads REAL pixel bytes, not headers.
    * None for anything that doesn't validate — caller falls back to the
    * stub, never throws on arbitrary binary. */
  def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val pixelOff = s32le(b, 10)
    val width = s32le(b, 18)
    val heightRaw = s32le(b, 22)
    val bpp = u16le(b, 28)
    val height = math.abs(heightRaw)
    if (width <= 0 || height <= 0 || pixelOff < 54 || pixelOff > b.length)
      return None
    if (!Set(1, 4, 8, 16, 24, 32).contains(bpp)) return None
    // biCompression must be BI_RGB (0): this decoder claims the UNCOMPRESSED
    // layout, and an RLE/bitfields payload that happens to be long enough
    // would otherwise "validate" and have opcodes histogrammed as pixels.
    if (s32le(b, 30) != 0) return None
    val stride = ((width.toLong * bpp + 31) / 32 * 4).toInt
    val expect = stride.toLong * height
    if (expect <= 0 || pixelOff + expect > b.length) return None
    Some(Decoded(width, height, 1, pixelOff, expect.toInt))
  }

  /** Validated RIFF/WAVE fmt+data walk shared by [[decodeWav]] and
    * [[audioFeatures]]. PCM only (audioFormat 1) with a self-consistent
    * block align (channels × bits/8) — IEEE-float/ADPCM/extensible payloads
    * fall back to the stub rather than being misread as integer samples. */
  private case class WavFmt(rate: Int, channels: Int, blockAlign: Int,
                            bitsPerSample: Int, dataStart: Int, dataLen: Int)

  private def wavFmt(b: Array[Byte]): Option[WavFmt] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var rate = 0; var channels = 0; var blockAlign = 0
    var format = 0; var bits = 0
    var dataStart = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = s32le(b, off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      if (id == "fmt " && sz >= 16) {
        format = u16le(b, off + 8)
        channels = u16le(b, off + 10)
        rate = s32le(b, off + 12)
        blockAlign = u16le(b, off + 20)
        bits = u16le(b, off + 22)
      } else if (id == "data") {
        dataStart = off + 8; dataLen = sz
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || blockAlign <= 0 || dataStart < 0) None
    else if (format != 1 || bits <= 0 || blockAlign != channels * bits / 8) None
    else Some(WavFmt(rate, channels, blockAlign, bits, dataStart, dataLen))
  }

  /** REAL WAV (RIFF/WAVE) decoder: walks the chunk list for `fmt ` (PCM
    * layout: channels at +2, sample rate at +4, block align at +12) and
    * `data`. Mapping into the uniform decode schema: width = sample rate,
    * height = channel count, n_frames = PCM sample-frame count
    * (dataLen / blockAlign) — "frame" in its audio sense. Payload slice is
    * the data chunk, so downstream stats read REAL sample bytes. */
  def decodeWav(b: Array[Byte]): Option[Decoded] =
    wavFmt(b).map(f =>
      Decoded(f.rate, f.channels, f.dataLen / f.blockAlign, f.dataStart, f.dataLen))

  /** Format-sniffing decode: real BMP/WAV parse when the magic validates,
    * deterministic stub otherwise (feature stage then reads the whole
    * payload, exactly the pre-round-6 behavior for non-media bytes). */
  def decode(bytes: Array[Byte]): Decoded =
    decodeBmp(bytes).orElse(decodeWav(bytes)).getOrElse {
      val (w, h, f) = decodeStub(bytes)
      Decoded(w, h, f, 0, bytes.length)
    }

  /** Per-channel pixel means for an uncompressed 24-bpp BMP, honoring the
    * 4-byte row stride and BGR byte order — the golden-file "did we really
    * decode pixels" statistic (bottom-up vs top-down doesn't matter for a
    * mean). None if the payload isn't a 24-bpp BMP. */
  def bmpChannelMeans(b: Array[Byte]): Option[(Double, Double, Double)] =
    decodeBmp(b).filter(_ => u16le(b, 28) == 24).map { d =>
      val stride = ((d.width * 24 + 31) / 32) * 4
      var (sb, sg, sr) = (0L, 0L, 0L)
      var y = 0
      while (y < d.height) {
        var x = 0
        var o = d.payloadStart + y * stride
        while (x < d.width) {
          sb += (b(o) & 0xFF); sg += (b(o + 1) & 0xFF); sr += (b(o + 2) & 0xFF)
          x += 1; o += 3
        }
        y += 1
      }
      val n = d.width.toDouble * d.height
      (sb / n, sg / n, sr / n)
    }

  /** Decode + feature-extract stage: batch-shaped `mapPartitions`, one
    * kernel invocation per row but per-partition setup cost amortized (the
    * iterator shape a JNI codec binding needs). BMP/WAV payloads get the
    * REAL parse — dimensions from the header, the 8-dim byte-histogram
    * feature over the actual pixel/PCM payload slice; anything else falls
    * back to the deterministic stub over the whole payload (bit-identical
    * to the pre-decoder behavior, which the oracle SQL mirrors). */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would init the codec once here
        it.map { case (id, bytes) =>
          val d = decode(bytes)
          val hist = new Array[Float](8)
          var i = d.payloadStart
          val end = d.payloadStart + d.payloadLen
          while (i < end) { hist((bytes(i) & 0xFF) >> 5) += 1f; i += 1 }
          val total = math.max(d.payloadLen, 1).toFloat
          DecodedRow(id, d.width, d.height, d.nFrames, hist.map(_ / total))
        }
      }
  }

  case class AudioFeatRow(media_id: Long, window_idx: Int, rms: Double)

  /** Audio feature extraction: per-window RMS energy — the windowed-feature
    * shape (MFCC, spectrogram frames) a real audio model consumes. A payload
    * that validates as 16-bit PCM RIFF/WAVE gets the REAL parse: windows of
    * `windowSamples` signed 16-bit little-endian samples read from the data
    * chunk (normalized by 2¹⁵ onto the same ~[0,128) scale as the fallback).
    * Non-16-bit PCM (8/24/32-bit) and non-PCM payloads keep the
    * unsigned-8-bit whole-payload reading — the sample loop below assumes
    * 2-byte samples, so gating on bitsPerSample is what keeps an 8-bit WAV
    * from having unrelated sample pairs fused into bogus 16-bit values.
    * Anything else keeps the unsigned-8-bit-PCM whole-payload reading, the
    * deterministic fallback the existing rows-only query uses. Same
    * batch-shaped `mapPartitions` contract as [[decodeAndFeaturize]]; RMS is
    * a deterministic left-to-right fold. */
  def audioFeatures(spark: SparkSession, media: DataFrame,
                    windowSamples: Int): Dataset[AudioFeatRow] = {
    import spark.implicits._
    def rms4(s: Double, n: Int): Double =
      BigDecimal(math.sqrt(s / math.max(n, 1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          wavFmt(bytes).filter(_.bitsPerSample == 16) match {
            case Some(f) =>
              val nSamples = f.dataLen / 2
              (0 until (nSamples + windowSamples - 1) / windowSamples).iterator
                .map { i =>
                  val lo = i * windowSamples
                  val hi = math.min(lo + windowSamples, nSamples)
                  var s = 0.0
                  var j = lo
                  while (j < hi) {
                    val o = f.dataStart + j * 2
                    val v = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
                    val c = v / 256.0 // 2¹⁵ full scale → same units as u8 path
                    s += c * c
                    j += 1
                  }
                  AudioFeatRow(id, i, rms4(s, hi - lo))
                }
            case None =>
              bytes.grouped(windowSamples).zipWithIndex.map { case (w, i) =>
                var s = 0.0
                var j = 0
                while (j < w.length) {
                  val c = (w(j) & 0xFF) - 128.0
                  s += c * c
                  j += 1
                }
                AudioFeatRow(id, i, rms4(s, w.length))
              }
          }
        }
      }
  }

  /** Perceptual difference-hash (dHash) — the standard 64-bit image
    * fingerprint for near-duplicate IMAGE dedup: sample the image to a 9×8
    * brightness grid, bit i set iff grid(x, y) > grid(x+1, y). Survives
    * re-encoding and mild brightness shifts; a 1-pixel edit flips at most a
    * few bits, so near-dup pairing is a small-radius Hamming search
    * ([[graft.llm.Dedup.hamming64Pairs]] blocks it with NO all-pairs stage).
    *
    *  - Uncompressed 24-bpp BMPs get the REAL grid: integer-luma
    *    (299R+587G+114B)/1000 at nearest-neighbor sample points honoring
    *    stride and BGR order.
    *  - Anything else falls back to sampling the payload slice at 72 evenly
    *    spaced byte offsets — deterministic, so the synthetic media tables
    *    hash stably (the [[decodeStub]] contract, one level up).
    *
    * Pure per-row kernel, embarrassingly parallel; deterministic. */
  /** True iff the payload validates as an uncompressed 24-bpp BMP — the
    * format tier whose dHash is genuinely perceptual. Drives the
    * `decode_mode` column so a mixed corpus can't silently mix perceptual
    * and byte-sample hashes in one Hamming join. */
  def isBmp24(bytes: Array[Byte]): Boolean =
    decodeBmp(bytes).isDefined && u16le(bytes, 28) == 24

  def dHash64(bytes: Array[Byte]): Long = {
    val gw = 8
    val gh = 8
    val d = decode(bytes)
    val bmp24 = decodeBmp(bytes).filter(_ => u16le(bytes, 28) == 24)
    def sample(gx: Int, gy: Int): Int = bmp24 match {
      case Some(dec) =>
        val x = if (gw == 0) 0 else gx * (dec.width - 1) / gw
        val y = if (gh <= 1) 0 else gy * (dec.height - 1) / (gh - 1)
        val stride = ((dec.width * 24 + 31) / 32) * 4
        val o = dec.payloadStart + y * stride + x * 3
        val bl = bytes(o) & 0xFF
        val g = bytes(o + 1) & 0xFF
        val r = bytes(o + 2) & 0xFF
        (299 * r + 587 * g + 114 * bl) / 1000
      case None =>
        if (d.payloadLen <= 0) 0
        else {
          val i = gy * (gw + 1) + gx // 0 .. 71
          // Multiply in Long: payloads past ~30 MB make
          // i * (payloadLen - 1) overflow Int (negative offset → throw).
          val o = (d.payloadStart +
            i.toLong * (d.payloadLen - 1) / (gh * (gw + 1) - 1)).toInt
          bytes(o) & 0xFF
        }
    }
    var h = 0L
    var bit = 0
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        if (sample(gx, gy) > sample(gx + 1, gy)) h |= (1L << bit)
        bit += 1
        gx += 1
      }
      gy += 1
    }
    h
  }

  /** Per-row dHash stage over a media table: (media_id, phash, decode_mode).
    * Pure column ops over the codegen [[graft.functions.DHash64]] /
    * [[graft.functions.DHashMode]] kernels — no Dataset round-trip, so the
    * binary payload never deserializes into a Scala tuple and the stage
    * stays inside whole-stage codegen with the scan (the earlier
    * `mapPartitions` formulation inserted a DeserializeToObject barrier).
    * `decode_mode` tags each hash `bmp24` (true perceptual luma grid) vs
    * `byte-sample` (deterministic fallback) so downstream Hamming joins can
    * partition by tier instead of silently mixing them. */
  def perceptualHashes(spark: SparkSession, media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.ImageKernels.dhash64(col("media")).as("phash"),
      graft.functions.ImageKernels.dhashMode(col("media")).as("decode_mode"))

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
