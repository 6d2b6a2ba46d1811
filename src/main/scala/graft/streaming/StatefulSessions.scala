package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` (north-star
  * mandate: KeyValueGroupedDataset state ops for semantics the built-in
  * `session_window` can't express — here, per-session ordinals and explicit
  * gap logic extensible with per-user gap policies, session caps, etc.).
  *
  * The same function body serves batch and streaming:
  *  - batch (`closeTrailing = true`): each key's full event list arrives in
  *    one invocation with empty state; end-of-input closes the last session,
  *    so output equals the window-based sessionizer (oracle-checkable).
  *  - streaming (`closeTrailing = false`): the open session rides GroupState
  *    across micro-batches and is emitted only once its gap elapses. A 24/7
  *    deployment adds `GroupStateTimeout.EventTimeTimeout` so idle sessions
  *    flush at the watermark instead of waiting for the next event.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp)
  case class OpenSession(sessionId: Long, startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_ts: Timestamp, end_ts: Timestamp)

  /** Session assignment for one user's sorted event times, threading
    * open-session state: returns (still-open session, closed sessions).
    * Pure function — unit-testable without Spark. */
  private[streaming] def advance(state: Option[OpenSession], gapUs: Long,
                                 tsUs: Seq[Long]): (Option[OpenSession], Seq[OpenSession]) = {
    var open = state
    val closed = Seq.newBuilder[OpenSession]
    for (t <- tsUs) {
      open match {
        case Some(s) if t - s.lastUs < gapUs =>
          open = Some(s.copy(lastUs = t, n = s.n + 1))
        case Some(s) =>
          closed += s
          open = Some(OpenSession(s.sessionId + 1, t, t, 1))
        case None =>
          open = Some(OpenSession(1, t, t, 1))
      }
    }
    (open, closed.result())
  }

  private def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** µs → Timestamp, preserving sub-millisecond precision (events carry µs). */
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** 24/7 streaming shape: open sessions flush when the event-time watermark
    * passes `last event + gap`, not only when the user's next event arrives —
    * `GroupStateTimeout.EventTimeTimeout` bounds state for users who go
    * quiet. Caller must set a watermark on `events` (the timeout clock IS
    * the watermark). Emits every session exactly once. */
  def sessionizeStreaming(spark: SparkSession, events: DataFrame,
                          gap: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapUs = iv.days * 86400000000L + iv.microseconds
    // No casts here: a cast projection would re-create the ts attribute and
    // strip the watermark tag EventTimeTimeout requires.
    val ds = events.select("user_id", "ts").as[Event]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[OpenSession]) =>
          val out =
            if (state.hasTimedOut) {
              // Watermark passed last + gap with no new events: the session
              // is closed by definition of the gap.
              val s = state.get
              state.remove()
              Seq(s)
            } else {
              val sorted = it.map(e => toUs(e.ts)).toSeq.sorted
              val (open, closed) = advance(state.getOption, gapUs, sorted)
              open.foreach { s =>
                state.update(s)
                // Clamp: a late-but-within-watermark event can put
                // last + gap behind the watermark, and Spark rejects a
                // timeout timestamp <= watermark (query-fatal).
                state.setTimeoutTimestamp(
                  math.max(s.lastUs / 1000 + gapUs / 1000,
                           state.getCurrentWatermarkMs() + 1))
              }
              closed
            }
          // session_id here is the session START in epoch-µs, not the batch
          // variant's per-user ordinal: ordinals would need state kept after
          // the timeout flush (defeating bounded state), and the start time
          // is unique per (user, session) without any.
          out.iterator.map(s => SessionOut(uid, s.startUs, s.n,
            fromUs(s.startUs), fromUs(s.lastUs)))
      }
  }

  /** Gap-based sessions with stable per-user ordinals (session_id = 1,2,…).
    *
    * Encoder tuning (the sf0.1→sf1 probe lesson): the object path's cost is
    * per-event (de)serialization, so events cross into object land as
    * primitive `(Long, Long)` tuples — `unix_micros` runs in codegen and
    * the tuple encoder writes two flat longs, where the earlier
    * `Event(user_id, Timestamp)` shape allocated and converted a Timestamp
    * object per event. Only the per-SESSION output (tiny) builds objects.
    * The API round-trip itself (one deserialize+serialize per event) is
    * inherent to `flatMapGroupsWithState` — this variant trims the
    * per-event constant, and `q_session_window`/`q_sessionize` remain the
    * declarative scale paths. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gap: String = "30 minutes",
                 closeTrailing: Boolean = true): Dataset[SessionOut] = {
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapUs = iv.days * 86400000000L + iv.microseconds
    val ds = graft.engine.TsNorm.normalizeTs(events)
      .select(col("user_id").cast("long"), unix_micros(col("ts")))
      .as[(Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[OpenSession]) =>
          val sorted = it.map(_._2).toSeq.sorted
          val (open, closed) = advance(state.getOption, gapUs, sorted)
          val out =
            if (closeTrailing) closed ++ open.toSeq
            else { open.foreach(state.update); closed }
          out.iterator.map(s => SessionOut(uid, s.sessionId, s.n,
            fromUs(s.startUs), fromUs(s.lastUs)))
      }
  }
}
