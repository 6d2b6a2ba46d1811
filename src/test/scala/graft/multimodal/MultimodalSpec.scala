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
