package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, TsNorm}

/** Regression guard for the `events.ts` physical-type churn (round 6 went
  * red when the regenerated testdata switched ns-as-long → µs TIMESTAMP_NTZ
  * and five queries crashed). [[TsNorm.normalizeTs]] must absorb every shape
  * the generator has produced, so each shape gets a fixture here — including
  * an NTZ parquet fixture read back through the full [[Catalog]] →
  * `SparkEntry.queries` → streaming-watermark path.
  */
class TsNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ns-as-long ts becomes TimestampType at µs precision") {
    val df = Seq((1L, 1704067200123456789L)).toDF("event_id", "ts")
    val out = TsNorm.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).as[Long].head()
    assert(got == 1704067200123456L) // ns div 1000, matching DuckDB truncation
  }

  test("TIMESTAMP_NTZ ts becomes TimestampType with identical UTC values") {
    val df = Seq((1L, "2024-01-01 00:00:00.123456"))
      .toDF("event_id", "s")
      .select(col("event_id"), to_timestamp_ntz(col("s")).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = TsNorm.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).as[Long].head()
    assert(got == 1704067200123456L) // session TZ pinned UTC → relabel only
  }

  test("TimestampType ts passes through unchanged") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "ts")
    assert(TsNorm.normalizeTs(df) eq df)
  }

  test("frames without a ts column pass through unchanged") {
    val df = Seq((1L, "x")).toDF("id", "v")
    assert(TsNorm.normalizeTs(df) eq df)
  }

  /** Events-shaped fixture whose parquet footer says TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) — exactly what the round-6 testdata regen
    * produced. Written once, used by the end-to-end tests below. */
  private lazy val ntzDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ntz-fixture").toString
    val events = spark.range(0, 200).select(
      col("id").as("event_id"),
      (col("id") % 10).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"),
      to_timestamp_ntz(
        timestamp_micros(lit(1704067200000000L) + col("id") * 90L * 1000000L)
          .cast("string")).as("ts"),
      (col("id") * 1.5).as("value"))
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // The fixture only guards what it claims to: the raw read must be NTZ.
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture lost NTZ-ness: ${raw.schema("ts").dataType}")
    dir
  }

  test("Catalog reads an NTZ events fixture as TimestampType") {
    val cat = new Catalog(spark, ntzDir)
    assert(cat.events.schema("ts").dataType == TimestampType)
  }

  test("q_debounce and q_interval_merge run against an NTZ events fixture") {
    // Both crashed in round 6 (unix_micros rejects NTZ, SparkEntry q_debounce
    // / q_interval_merge); a green run here means the next testdata
    // regeneration cannot silently reintroduce the crash.
    val deb = SparkEntry.queries("q_debounce")(spark, ntzDir)
    assert(deb.count() > 0)
    val im = SparkEntry.queries("q_interval_merge")(spark, ntzDir)
    assert(im.count() > 0)
  }

  test("streaming watermark accepts a normalized NTZ source") {
    // withWatermark rejected NTZ event time in round 6 (q_stream_dedup /
    // q_stream_join / q_stream_session). Analysis alone reproduces the
    // failure, so building the watermarked plan is a sufficient guard.
    val schema = spark.read.parquet(s"$ntzDir/events.parquet").schema
    val stream = TsNorm.normalizeTs(
      spark.readStream.schema(schema).parquet(s"$ntzDir/events.parquet"))
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).count()
    assert(agg.isStreaming)
  }
}
