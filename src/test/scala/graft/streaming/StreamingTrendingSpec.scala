package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming Misra-Gries trending top-k: the drained streaming answer must
  * EQUAL the batch per-day top-k (the q_trending daily ranking without the
  * day-over-day column) — the same batch-verifies-stream contract as
  * q_stream_funnel. Exactness holds because sketchK exceeds the corpus's
  * distinct event-type count, so the MG state never decrements (the
  * documented regime). */
class StreamingTrendingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  private def batchTop3: Seq[(java.sql.Date, Long, String, Long)] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(eventsPath)
      .transform(graft.engine.TsNorm.normalizeTs(_))
    val daily = events
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    graft.plans.TopKPerGroup.topKPerGroup(daily, Seq(col("d")),
        Seq(col("n").desc, col("event_type")), 3)
      .select(col("d"), col("rk").cast("bigint").as("rk"),
        col("event_type"), col("n"))
      .orderBy("d", "rk")
      .as[(java.sql.Date, Long, String, Long)].collect().toSeq
  }

  test("streaming per-day top-3 equals the batch ranking") {
    import spark.implicits._
    val streamed = StreamingTrending
      .runStreamTrendingOnce(spark, eventsPath,
        queryName = "graft_stream_trending_spec")
      .as[(java.sql.Date, Long, String, Long)].collect().toSeq
    val batch = batchTop3
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streaming/batch divergence:\n stream=${streamed.take(6)}\n batch=${batch.take(6)}")
  }

  test("per-day state is bounded by sketchK, not by type cardinality") {
    import spark.implicits._
    // Synthetic day with 40 distinct types under sketchK=8: the emitted
    // candidate set for that day can never exceed 8 counters.
    val rows = (1 to 200).map { i =>
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), s"type_${i % 40}")
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_trending_card_spec"
    rows.toDF("ts", "event_type").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val f = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val out = StreamingTrending.runStreamTrendingOnce(spark, f,
      topK = 100, sketchK = 8, queryName = "graft_stream_trending_card")
    // topK=100 would admit every type if state were unbounded; the MG cap
    // keeps the surviving candidate set ≤ sketchK.
    assert(out.count() <= 8, "state exceeded the Misra-Gries bound")
  }
}
