package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal plumbing: binary payload + typed metadata, batch-shaped decode,
  * resize, frame sampling. The codec itself is a deterministic stub; the
  * Spark-side schema/partitioning/batch shape is the real thing under test. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abcdefgh"), (2L, "0123456789abcdef"), (3L, "x")).toDF("id", "payload")

  test("attachMedia: binary payload + struct metadata with true byte counts") {
    val m = Multimodal.attachMedia(docs, "id", "payload", "image/png")
    assert(m.schema("media").dataType == org.apache.spark.sql.types.BinaryType)
    val metas = m.select("media_id", "meta.mime", "meta.nBytes")
      .as[(Long, String, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(metas(1L) == (("image/png", 8L)))
    assert(metas(2L) == (("image/png", 16L)))
  }

  test("decodeAndFeaturize: stub dims follow the documented formula; features normalized") {
    val m = Multimodal.attachMedia(docs, "id", "payload")
    val d = Multimodal.decodeAndFeaturize(spark, m).collect().map(r => r.media_id -> r).toMap
    assert(d(1L).width == 8 % 640 + 16 && d(1L).height == 8 % 480 + 16 && d(1L).n_frames == 8 % 24 + 1)
    // byte-histogram feature sums to ~1 (normalized by payload length)
    assert(math.abs(d(2L).feature.sum - 1.0f) < 1e-5)
    assert(d(1L).feature.length == 8)
  }

  test("resize truncates payload and recomputes metadata") {
    val m = Multimodal.attachMedia(docs, "id", "payload")
    val r = Multimodal.resize(m, maxBytes = 4)
    val sizes = r.select("media_id", "meta.nBytes").as[(Long, Long)].collect().toMap
    assert(sizes(1L) == 4L && sizes(2L) == 4L && sizes(3L) == 1L)
    // checksum tracks the truncated payload, not the original
    val sums = r.select(col("media_id"), col("meta.checksum") === xxhash64(col("media")))
      .as[(Long, Boolean)].collect()
    assert(sums.forall(_._2))
  }

  test("audioFeatures: windowed RMS matches hand-computed energy") {
    // payload "0123" = bytes 48,49,50,51 → centered: -80,-79,-78,-77
    val m = Multimodal.attachMedia(docs.filter($"id" === 1).limit(1), "id", "payload")
    val rows = Multimodal.audioFeatures(spark, m, windowSamples = 2)
      .collect().sortBy(_.window_idx)
    val p = docs.filter($"id" === 1).select("payload").as[String].head().getBytes
    val expected = p.grouped(2).map { w =>
      val s = w.map(b => math.pow((b & 0xFF) - 128.0, 2)).sum
      BigDecimal(math.sqrt(s / w.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq
    assert(rows.map(_.rms).toSeq == expected)
    assert(rows.map(_.window_idx).toSeq == expected.indices.toSeq)
  }

  // ------------------------------------------- real BMP/WAV decoder goldens

  /** Hand-built 2×2 24-bpp BMP: rows padded to 4-byte stride (2px×3B=6 →
    * stride 8). Bottom-up row order; pixels are BGR. Pixel grid (top-down):
    *   (255,0,0) red   (0,255,0) green
    *   (0,0,255) blue  (255,255,255) white
    */
  private def goldenBmp: Array[Byte] = {
    val stride = 8
    val pixelBytes = stride * 2
    val fileSize = 54 + pixelBytes
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
    b.putInt(40).putInt(2).putInt(2)      // BITMAPINFOHEADER, w=2, h=2
      .putShort(1).putShort(24)           // planes, bpp
      .putInt(0).putInt(pixelBytes)       // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom row first (blue, white) then top row (red, green); BGR order
    b.put(Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0)) // (255,0,0)B=blue, white, pad
    b.put(Array[Byte](0, 0, -1, 0, -1, 0, 0, 0))   // red, green, pad
    b.array()
  }

  /** Hand-built PCM WAV: 8000 Hz mono 16-bit, 4 sample frames
    * [0, 16384, -16384, 32767]. */
  private def goldenWav: Array[Byte] = {
    val samples = Seq[Short](0, 16384, -16384, 32767)
    val dataLen = samples.size * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000) // PCM, mono, rate, byteRate
      .putShort(2).putShort(16)                           // blockAlign, bits
    b.put("data".getBytes).putInt(dataLen)
    samples.foreach(b.putShort(_))
    b.array()
  }

  /** Parameterized uncompressed 24-bpp BMP with per-pixel BGR from `f(x, y)`
    * (top-down coordinates; rows stored bottom-up as the format requires). */
  private def bmp(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 24 + 31) / 32) * 4
    val pixelBytes = stride * h
    val b = java.nio.ByteBuffer.allocate(54 + pixelBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + pixelBytes)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(pixelBytes)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // bottom-up
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = f(x, row)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      row -= 1
    }
    b.array()
  }

  private def lcg(x: Int, y: Int, seed: Int): Int =
    math.abs((x * 73856093) ^ (y * 19349663) ^ (seed * 83492791)) % 256

  test("dHash64: monotone gradients hash to the two extreme signatures") {
    // Luma strictly increasing in x → left > right never → all bits clear;
    // strictly decreasing → all 64 bits set. The two analytic fixed points
    // of the definition, independent of sampling positions.
    val inc = bmp(32, 32)((x, _) => { val v = x * 255 / 31; (v, v, v) })
    val dec = bmp(32, 32)((x, _) => { val v = (31 - x) * 255 / 31; (v, v, v) })
    assert(Multimodal.decodeBmp(inc).isDefined)
    assert(Multimodal.dHash64(inc) == 0L)
    assert(Multimodal.dHash64(dec) == -1L)
  }

  test("dHash64: 1-pixel edit stays in the near-dup radius; distinct images leave it") {
    val base = bmp(32, 32)((x, y) => { val v = lcg(x, y, 1); (v, v, v) })
    val edited = bmp(32, 32)((x, y) =>
      if (x == 7 && y == 11) (255, 255, 255)
      else { val v = lcg(x, y, 1); (v, v, v) })
    val other = bmp(32, 32)((x, y) => { val v = lcg(x, y, 2); (v, v, v) })
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hb, he, ho) = (Multimodal.dHash64(base), Multimodal.dHash64(edited),
      Multimodal.dHash64(other))
    assert(ham(hb, he) <= 7, s"1-pixel edit moved ${ham(hb, he)} bits")
    assert(ham(hb, ho) > 7, s"distinct images only ${ham(hb, ho)} bits apart")
  }

  test("perceptualHashes + hamming64Pairs: planted near-identical BMPs pair, distinct don't") {
    import spark.implicits._
    val base = bmp(32, 32)((x, y) => { val v = lcg(x, y, 1); (v, v, v) })
    val edited = bmp(32, 32)((x, y) =>
      if (x == 7 && y == 11) (255, 255, 255)
      else { val v = lcg(x, y, 1); (v, v, v) })
    val other = bmp(32, 32)((x, y) => { val v = lcg(x, y, 2); (v, v, v) })
    val media = Seq((1L, base), (2L, edited), (3L, other)).toDF("media_id", "media")
    val sigs = Multimodal.perceptualHashes(spark, media)
      .select(col("media_id").as("id"), col("phash").as("sig"))
    val pairs = graft.llm.Dedup.hamming64Pairs(sigs, maxHamming = 7, chunks = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("perceptualHashes: codegen columnar plan, decode_mode tiers, kernel parity") {
    val media = Seq((1L, goldenBmp), (2L, "plain text payload".getBytes),
        (3L, goldenWav)).toDF("media_id", "media")
    val out = Multimodal.perceptualHashes(spark, media)
    // decode_mode: only the validated 24-bpp BMP is 'bmp24'; a WAV is a
    // decoded format but NOT a perceptual hash — byte-sample tier.
    val modes = out.select("media_id", "decode_mode")
      .as[(Long, String)].collect().toMap
    assert(modes == Map(1L -> "bmp24", 2L -> "byte-sample", 3L -> "byte-sample"))
    // values match the shared static kernel bit-for-bit
    val hashes = out.select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(hashes(1L) == Multimodal.dHash64(goldenBmp))
    assert(hashes(3L) == Multimodal.dHash64(goldenWav))
    // the stage is pure column ops: no object round-trip in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      s"expected a columnar kernel plan, got:\n$plan")
  }

  test("perceptualHashes: planted BMP panel hashes entirely in the bmp24 tier") {
    val panel = (0 until 8).map(i =>
      (i.toLong, bmp(16, 16)((x, y) => { val v = lcg(x, y, i); (v, v, v) })))
    val out = Multimodal.perceptualHashes(spark, panel.toDF("media_id", "media"))
    assert(out.filter(col("decode_mode") =!= "bmp24").count() == 0)
  }

  test("dHash64 fallback samples payload bytes deterministically") {
    // Non-media payload → 72 evenly spaced byte samples; mirror the rule.
    val payload = (0 until 500).map(i => ((i * 37) % 251).toByte).toArray
    def sample(i: Int) = payload(i * (payload.length - 1) / 71) & 0xFF
    var expect = 0L
    var bit = 0
    for (gy <- 0 until 8; gx <- 0 until 8) {
      if (sample(gy * 9 + gx) > sample(gy * 9 + gx + 1)) expect |= (1L << bit)
      bit += 1
    }
    assert(Multimodal.dHash64(payload) == expect)
  }

  test("decodeBmp: real header parse + pixel-array payload slice on a golden file") {
    val d = Multimodal.decodeBmp(goldenBmp).get
    assert(d.width == 2 && d.height == 2 && d.nFrames == 1)
    assert(d.payloadStart == 54 && d.payloadLen == 16)
    // real pixel stats: mean of each channel over the 4 pixels
    // B: (255+255+0+0)/4=127.5  G: (0+255+0+255)/4=127.5  R: same by symmetry
    val (mb, mg, mr) = Multimodal.bmpChannelMeans(goldenBmp).get
    assert(mb == 127.5 && mg == 127.5 && mr == 127.5)
    // arbitrary binary does NOT parse (no false positives on text payloads)
    assert(Multimodal.decodeBmp("BMnot really a bitmap".getBytes).isEmpty)
    assert(Multimodal.decodeBmp("hello world".getBytes).isEmpty)
  }

  test("decodeWav: real chunk walk — rate/channels/frame count + data slice") {
    val d = Multimodal.decodeWav(goldenWav).get
    assert(d.width == 8000 && d.height == 1) // sample rate, channels
    assert(d.nFrames == 4)                   // PCM sample frames
    assert(d.payloadStart == 44 && d.payloadLen == 8)
    assert(Multimodal.decodeWav("RIFFxxxxWAVEbroken".getBytes).isEmpty)
    assert(Multimodal.decodeWav("plain text".getBytes).isEmpty)
  }

  test("decodeAndFeaturize routes real formats through the real parse") {
    val media = Seq((1L, goldenBmp), (2L, goldenWav),
        (3L, "not media at all".getBytes)).toDF("media_id", "media")
    val d = Multimodal.decodeAndFeaturize(spark, media)
      .collect().map(r => r.media_id -> r).toMap
    assert(d(1L).width == 2 && d(1L).height == 2 && d(1L).n_frames == 1)
    assert(d(2L).width == 8000 && d(2L).n_frames == 4)
    // histogram reads the PIXEL slice: 16 payload bytes, 10 of them 0x00
    // (2 zero channels × 3 colored pixels + 4 pad bytes) → bin0 = 0.625
    assert(math.abs(d(1L).feature(0) - 0.625f) < 1e-6)
    // fallback path: stub dims over the whole 16-byte payload
    assert(d(3L).width == 16 % 640 + 16 && d(3L).n_frames == 16 % 24 + 1)
  }

  test("audioFeatures reads real 16-bit samples from a WAV payload") {
    val media = Seq((1L, goldenWav)).toDF("media_id", "media")
    val rows = Multimodal.audioFeatures(spark, media, windowSamples = 2)
      .collect().sortBy(_.window_idx)
    assert(rows.length == 2) // 4 samples / 2 per window
    // window 0: samples 0, 16384 → scaled 0, 64 → rms sqrt((0+4096)/2)
    val w0 = BigDecimal(math.sqrt((0.0 + 64.0 * 64.0) / 2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // window 1: -16384, 32767 → -64, 127.99609375
    val c1 = 32767 / 256.0
    val w1 = BigDecimal(math.sqrt((64.0 * 64.0 + c1 * c1) / 2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0).rms == w0 && rows(1).rms == w1)
  }

  test("compressed BMP and non-16-bit/non-PCM WAV fall back instead of misreading") {
    // RLE8 BMP (biCompression=1): long enough to pass the size checks, but
    // its "pixel array" is opcodes — must NOT validate as the raw layout.
    val rle = goldenBmp.clone()
    rle(28) = 8; rle(29) = 0 // bpp=8 (RLE8 pairs with 8bpp)
    rle(30) = 1              // biCompression = BI_RLE8
    assert(Multimodal.decodeBmp(rle).isEmpty)

    // 8-bit PCM WAV: valid file, but the 16-bit sample loop would fuse
    // unrelated byte pairs — audioFeatures must take the fallback path
    // (whole payload as unsigned bytes), not halve the sample count.
    val dataLen = 8
    val b8 = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b8.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000) // PCM, mono
      .putShort(1).putShort(8)                           // blockAlign=1, bits=8
    b8.put("data".getBytes).putInt(dataLen)
    (0 until dataLen).foreach(i => b8.put((i * 16).toByte))
    val wav8 = b8.array()
    assert(Multimodal.decodeWav(wav8).exists(_.nFrames == 8)) // decode: fine
    val rows = Multimodal.audioFeatures(spark,
        Seq((1L, wav8)).toDF("media_id", "media"), windowSamples = 16)
      .collect()
    // fallback reads the WHOLE 52-byte payload as one window, not 4 fused
    // 16-bit samples: one window of ceil(52/16)=4 → window count 4
    assert(rows.length == (wav8.length + 15) / 16,
      s"8-bit WAV took the 16-bit path: ${rows.toSeq}")

    // IEEE-float WAV (format 3) is rejected outright.
    val f32 = goldenWav.clone()
    f32(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWav(f32).isEmpty)
  }

  test("frameSample emits every Nth fixed-size frame") {
    val m = Multimodal.attachMedia(docs.filter($"id" === 2), "id", "payload") // 16 bytes
    val frames = Multimodal.frameSample(m, frameBytes = 4, everyN = 2)
      .select("media_id", "frame_idx", "frame")
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(_._2).toSeq == Seq(0, 2)) // frames 0,1,2,3 → keep 0 and 2
    assert(new String(frames(0)._3) == "0123")
    assert(new String(frames(1)._3) == "89ab")
  }
}
