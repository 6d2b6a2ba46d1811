package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-shaped operators over the `events` table (SURVEY.md §2.11
  * X6/X7). The aggregation logic is written once in batch form; the
  * Structured Streaming runner pushes the identical plan through the
  * streaming engine (file source → window agg → sink), which is how the same
  * code deploys against a real Kafka/file stream at scale.
  */
object EventStreams {

  /** ns-as-long `ts` → TimestampType(µs); see graft.engine.Catalog. */
  private def normalizeNanos(df: DataFrame): DataFrame =
    if (df.columns.contains("ts") &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df

  /** Hourly tumbling-window aggregation — batch shape (X6). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .orderBy("h", "event_type")

  /** The same hourly aggregation executed by the Structured Streaming
    * engine: parquet file source → tumbling `window()` agg → memory sink,
    * drained synchronously. Complete output mode so every window is emitted;
    * the watermark/append shape is [[watermarkedSliding]]. */
  def runHourlyStreamingOnce(spark: SparkSession, parquetPath: String,
                             queryName: String = "graft_stream_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(parquetPath).schema
    // The file-stream source wants a directory to watch (in production this
    // is the landing dir new files arrive in); stage the input file into one.
    val src = java.nio.file.Paths.get(parquetPath)
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_src_${queryName}")
    dir.toFile.mkdirs()
    java.nio.file.Files.copy(src, dir.resolve(src.getFileName),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = normalizeNanos(
      spark.readStream.schema(schema).parquet(dir.toString))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), sum("value").as("v_raw"))
    spark.catalog.dropTempView(queryName) // re-runnable within one session
    // Streaming state-store instances scale with shuffle.partitions; a
    // one-shot drain with a handful of windows doesn't need 32 of them.
    // (On a 24/7 deployment the partition count is a durable choice — it's
    // pinned into the checkpoint — so it's set here, per query, not globally.)
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val q = try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(queryName).start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
      .select(col("window.start").as("h"), col("event_type"), col("c"),
        round(col("v_raw"), 2).as("v"))
      .orderBy("h", "event_type")
  }

  /** Watermarked sliding-window aggregation (append mode) — the 24/7
    * deployment shape; late data beyond 10 minutes is dropped by the
    * watermark so state stays bounded. Takes and returns a *streaming*
    * DataFrame. */
  def watermarkedSliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"))

  /** Gap-based sessionization via session_window (X7). A session's end is
    * `last event + gap`, Spark's native session semantics. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"), col("n_events"))
      .orderBy("user_id", "start_ts")
}
