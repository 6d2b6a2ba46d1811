package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming operators (SURVEY.md §2.11 X6/X7): batch/streaming parity of the
  * windowed aggregation, watermarked sliding windows over a MemoryStream. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, "click", ts("2026-01-01 10:05:00"), 1.0),
    (1L, "click", ts("2026-01-01 10:55:00"), 2.0),
    (1L, "view",  ts("2026-01-01 11:10:00"), 3.0),
    (2L, "click", ts("2026-01-01 11:20:00"), 4.0)
  ).toDF("user_id", "event_type", "ts", "value")

  test("hourlyAgg groups into tumbling hours") {
    val rows = EventStreams.hourlyAgg(events)
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(rows == Seq(
      (ts("2026-01-01 10:00:00"), "click", 2L, 3.0),
      (ts("2026-01-01 11:00:00"), "click", 1L, 4.0),
      (ts("2026-01-01 11:00:00"), "view", 1L, 3.0)))
  }

  test("streaming window agg equals the batch hourlyAgg on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    mem.addData(events.as[(Long, String, Timestamp, Double)].collect().toSeq: _*)
    val stream = mem.toDF.toDF("user_id", "event_type", "ts", "value")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("es_parity").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("es_parity")
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("v"))
      .orderBy("h", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    val batch = EventStreams.hourlyAgg(events)
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("file-stream source over a DIRECTORY-shaped parquet table (multi-part) equals batch") {
    // Every Spark-written table — i.e. every table at scale — is a directory
    // of part files, and stageToDir must pass it through untouched. Round-6
    // scale-probe regression: the old unconditional single-file copy turned
    // a directory source into an EMPTY staging dir, so every streaming query
    // silently processed zero rows at sf1.
    val p = s"${sys.props("java.io.tmpdir")}/graft_dir_source_spec"
    events.repartition(3).write.mode("overwrite").parquet(p)
    assert(new java.io.File(p).isDirectory &&
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet")) > 1,
      "precondition: multi-part directory table")
    val streamed = EventStreams.runHourlyStreamingOnce(spark, p,
        queryName = "es_dir_source_spec")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    val batch = EventStreams.hourlyAgg(spark.read.parquet(p))
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty,
      s"directory-source streaming diverged: stream=$streamed batch=$batch")
  }

  test("session-window streaming over a directory table: parity, sentinel filtered, SOURCE NOT MUTATED") {
    // The session-window drain appends a closure sentinel into its staging
    // dir. With a directory source that staging must be a PRIVATE dir
    // (hardlinked), never the source itself — this pins the
    // stageWritableDir contract, plus the TimestampType leg of the
    // sentinel-bump arithmetic (the generator's ns-as-long leg is covered
    // by the sf verify gate).
    val p = s"${sys.props("java.io.tmpdir")}/graft_dir_session_spec"
    events.repartition(2).write.mode("overwrite").parquet(p)
    val before = new java.io.File(p).listFiles().map(_.getName).toSet
    val streamed = EventStreams.runSessionWindowStreamingOnce(spark, p,
        gap = "30 minutes", queryName = "es_dir_session_spec")
      .select("user_id", "start_ts", "n_events")
      .as[(Long, Timestamp, Long)].collect().toSeq
    val after = new java.io.File(p).listFiles().map(_.getName).toSet
    assert(after == before, s"source table mutated: ${after.diff(before)}")
    val batch = spark.read.parquet(p)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("n_events"))
      .orderBy("user_id", "start_ts")
      .as[(Long, Timestamp, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty,
      s"session parity diverged: stream=$streamed batch=$batch")
  }

  test("session-window streaming over a PARTITIONED table: parity, sentinel in-layout, source untouched") {
    // partitionBy subdirs are the shape every Spark-written partitioned
    // table has at scale. stageWritableDir must stage the LEAF files
    // (a top-level-only walk staged zero files — the silent-zero-rows
    // class again), and the closure sentinel must land inside a partition
    // subdir: a bare root-level file next to col=value subdirs makes
    // partition discovery throw.
    val p = s"${sys.props("java.io.tmpdir")}/graft_part_session_spec"
    events.write.partitionBy("event_type").mode("overwrite").parquet(p)
    def tree(f: java.io.File): Set[String] =
      Option(f.listFiles()).getOrElse(Array.empty).flatMap(c =>
        Set(c.getName) ++ tree(c).map(c.getName + "/" + _)).toSet
    val before = tree(new java.io.File(p))
    val streamed = EventStreams.runSessionWindowStreamingOnce(spark, p,
        gap = "30 minutes", queryName = "es_part_session_spec")
      .select("user_id", "start_ts", "n_events")
      .as[(Long, Timestamp, Long)].collect().toSeq
    assert(tree(new java.io.File(p)) == before, "source table mutated")
    val batch = spark.read.parquet(p)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("n_events"))
      .orderBy("user_id", "start_ts")
      .as[(Long, Timestamp, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty,
      s"partitioned-table session parity diverged: stream=$streamed batch=$batch")
  }

  test("watermarkedSliding: 1h window sliding 30min, append mode, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    mem.addData(events.as[(Long, String, Timestamp, Double)].collect().toSeq: _*)
    val agg = EventStreams.watermarkedSliding(
      mem.toDF.toDF("user_id", "event_type", "ts", "value"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("es_wm").start()
    try {
      q.processAllAvailable()
      // advance the watermark far past the data so all windows close
      mem.addData((9L, "late", ts("2026-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("es_wm")
      .select(col("window.start").as("s"), col("event_type"), col("c"))
      .as[(Timestamp, String, Long)].collect().toSet
    // 10:05 event lands in [09:30,10:30) and [10:00,11:00); 10:55 in
    // [10:30,11:30) and [10:00,11:00) — so the click count at 10:00 is 2.
    assert(rows.contains((ts("2026-01-01 10:00:00"), "click", 2L)))
    assert(rows.contains((ts("2026-01-01 09:30:00"), "click", 1L)))
  }

  test("watermark discards events later than the delay (never emitted, state not grown)") {
    // The late-data contract at scale: once the watermark passes t, an event
    // with ts < watermark - delay is DROPPED — without this, unbounded
    // straggler replays would re-open every closed window's state.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    mem.addData((1L, "click", ts("2026-01-01 10:05:00"), 1.0))
    val agg = EventStreams.watermarkedSliding(
      mem.toDF.toDF("user_id", "event_type", "ts", "value"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("es_late").start()
    try {
      q.processAllAvailable()
      // advance the watermark two days past the first event
      mem.addData((2L, "advance", ts("2026-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
      // days behind the watermark: must be silently discarded
      mem.addData((3L, "late_evt", ts("2026-01-01 10:10:00"), 1.0))
      q.processAllAvailable()
      // close remaining windows so everything eligible has emitted
      mem.addData((4L, "flush", ts("2026-01-05 00:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val types = spark.table("es_late").select("event_type").as[String].collect().toSet
    assert(!types.contains("late_evt"), s"late event leaked into output: $types")
    assert(types.contains("click"), s"on-time event missing: $types")
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    mem.addData(events.as[(Long, String, Timestamp, Double)].collect().toSeq: _*)
    val joined = mem.toDF.toDF("user_id", "event_type", "ts", "value")
      .join(users, "user_id") // static side broadcasts per micro-batch
      .groupBy("tier").agg(count(lit(1)).as("c"))
    val q = joined.writeStream.outputMode("complete")
      .format("memory").queryName("es_dim").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("es_dim").as[(String, Long)].collect().toMap
    assert(rows == Map("gold" -> 3L, "basic" -> 1L))
  }

  // The one-shot file-source runners take a single parquet FILE (the
  // testdata layout); write the fixture and hand over one part file.
  private def writeEventsFile(df: org.apache.spark.sql.DataFrame, name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_$name"
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
  }

  test("runStreamStreamJoinOnce: purchase→error pairs within the hour, per user") {
    val ev = Seq(
      (1L, 10L, "purchase", ts("2026-01-01 10:00:00"), 1.0),
      (2L, 10L, "error",    ts("2026-01-01 10:30:00"), 1.0), // within 1h → pair
      (3L, 10L, "error",    ts("2026-01-01 11:30:00"), 1.0), // past 1h → no
      (4L, 20L, "error",    ts("2026-01-01 10:10:00"), 1.0), // other user → no
      (5L, 20L, "purchase", ts("2026-01-01 10:05:00"), 1.0)  // pairs with 4
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventStreams.runStreamStreamJoinOnce(
        spark, writeEventsFile(ev, "ssjoin"), "es_test_ssjoin")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (5L, 4L)))
  }

  test("runStreamingDedupOnce equals batch DISTINCT on the key columns") {
    val ev = Seq(
      (1L, 10L, "click", ts("2026-01-01 10:00:00"), 1.0),
      (2L, 10L, "click", ts("2026-01-01 10:05:00"), 1.0), // dup key
      (3L, 10L, "view",  ts("2026-01-01 10:06:00"), 1.0),
      (4L, 20L, "click", ts("2026-01-01 10:07:00"), 1.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventStreams.runStreamingDedupOnce(
        spark, writeEventsFile(ev, "sdedup"), Seq("user_id", "event_type"),
        "es_test_sdedup")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((10L, "click"), (10L, "view"), (20L, "click")))
  }

  test("upsertFold: a late-arriving OLDER event cannot clobber a newer target row") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_upsert_fold"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    val order = Seq(col("ts").desc, col("event_id").desc)
    val batch1 = Seq((1L, 10L, ts("2026-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val batch2 = Seq((2L, 10L, ts("2026-01-01 09:00:00"))).toDF("event_id", "user_id", "ts") // older!
    EventStreams.upsertFold(spark, dir, batch1, "user_id", order)
    EventStreams.upsertFold(spark, dir, batch2, "user_id", order)
    val out = spark.read.parquet(dir).select("user_id", "event_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((10L, 1L)), s"older late event clobbered the newer row: $out")
  }

  test("sessionWindowAgg: events within gap merge into one session") {
    val e = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 10:20:00")), // within 30m of prev → same session
      (1L, ts("2026-01-01 12:00:00")), // new session
      (2L, ts("2026-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val rows = EventStreams.sessionWindowAgg(e, "30 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }
}
