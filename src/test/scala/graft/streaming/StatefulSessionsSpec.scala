package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** flatMapGroupsWithState sessionization: pure state-transition logic, batch
  * parity with the window-based sessionizer, and cross-micro-batch state. */
class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import StatefulSessions._

  private val gapUs = 1800L * 1000000L // 30 minutes

  test("advance: events within gap extend; gap boundary starts a new session") {
    val (open, closed) = advance(None, gapUs, Seq(0L, gapUs - 1, gapUs * 3))
    assert(closed.map(s => (s.sessionId, s.n)) == Seq((1L, 2L)))
    assert(open.contains(OpenSession(2, gapUs * 3, gapUs * 3, 1)))
    // exactly-gap spacing starts a new session (diff >= gap ⇒ new)
    val (o2, c2) = advance(None, gapUs, Seq(0L, gapUs))
    assert(c2.map(_.sessionId) == Seq(1L) && o2.get.sessionId == 2L)
  }

  test("advance threads prior state across invocations") {
    val (open1, _) = advance(None, gapUs, Seq(0L, 100L))
    val (open2, closed2) = advance(open1, gapUs, Seq(200L, gapUs * 5))
    assert(closed2.map(s => (s.sessionId, s.n)) == Seq((1L, 3L))) // 0,100,200 merged
    assert(open2.get.sessionId == 2L)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch sessionize matches the window-based formulation") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 10:20:00")),
      (1L, ts("2026-01-01 12:00:00")),
      (2L, ts("2026-01-01 09:00:00"))).toDF("user_id", "ts")
    val rows = sessionize(spark, events, "30 minutes")
      .collect().sortBy(r => (r.user_id, r.session_id))
      .map(r => (r.user_id, r.session_id, r.n_events, r.start_ts, r.end_ts)).toSeq
    assert(rows == Seq(
      (1L, 1L, 2L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:20:00")),
      (1L, 2L, 1L, ts("2026-01-01 12:00:00"), ts("2026-01-01 12:00:00")),
      (2L, 1L, 1L, ts("2026-01-01 09:00:00"), ts("2026-01-01 09:00:00"))))
  }

  test("event-time timeout flushes idle sessions at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val watermarked = mem.toDF.toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val sessions = sessionizeStreaming(spark, watermarked, "30 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("ss_timeout").start()
    try {
      mem.addData((1L, ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ss_timeout").count() == 0) // watermark still behind
      // A different user's event drives the watermark past 10:30 — user 1's
      // idle session must flush via the timeout path, no user-1 event needed.
      mem.addData((2L, ts("2026-01-01 23:00:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2026-01-01 23:05:00"))) // one more batch so timeouts fire
      q.processAllAvailable()
      val rows = spark.table("ss_timeout")
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSeq
      // streaming session_id = session start in epoch-µs (state-free unique id)
      val startUs = ts("2026-01-01 10:00:00").getTime * 1000L
      assert(rows.contains((1L, startUs, 1L,
        ts("2026-01-01 10:00:00"), ts("2026-01-01 10:00:00"))), s"got $rows")
    } finally q.stop()
  }

  test("streaming: open session rides GroupState across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = sessionize(spark, mem.toDF.toDF("user_id", "ts"),
      "30 minutes", closeTrailing = false)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("ss_stream").start()
    try {
      mem.addData((1L, ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ss_stream").count() == 0) // still open, nothing emitted
      mem.addData((1L, ts("2026-01-01 10:10:00"))) // extends the open session
      q.processAllAvailable()
      mem.addData((1L, ts("2026-01-01 23:00:00"))) // gap ⇒ closes session 1
      q.processAllAvailable()
      val rows = spark.table("ss_stream")
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSeq
      assert(rows == Seq(
        (1L, 1L, 2L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:10:00"))))
    } finally q.stop()
  }
}
