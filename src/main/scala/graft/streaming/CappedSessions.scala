package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the CAPPED sessionizer (`w10_capped_sessions`,
  * [[graft.queries.Aggregates]]): per-user sessions close on an idle
  * gap AND split into cap-aligned sub-sessions from the session start —
  * `sub = floor((ts − sess_start) / cap)` — the same closed formula the
  * batch form computes, so one oracle serves both.
  *
  * The cap is precisely what makes this operator streamable with
  * BOUNDED per-key state: the open sub-session accumulator is at most
  * one (sess, sub) frame per user, regardless of how long a never-idle
  * user stays active — without the cap, a session (and the risk of an
  * unbounded emission delay) grows forever.
  *
  * Event-time discipline: input carries a watermark; sub-session rows
  * are emitted when the batch sees the frame CLOSE (gap exceeded or cap
  * boundary crossed), and — in live streams (`withTimeout = true`) —
  * when the watermark passes `last_ts + gap` via event-time timeout.
  * On timeout the open frame is emitted and the state collapses to a
  * TOMBSTONE `(sess, last_ts, n = 0)` rather than being removed, so a
  * user who returns after a long idle continues the batch-equivalent
  * session NUMBERING (`sess + 1`) instead of restarting at 1 — that is
  * what makes stream ≡ batch provable on the same oracle. One tombstone
  * per ever-seen user is the price; a deployment that prefers zero
  * retention can remove state on timeout and accept renumbering (the
  * emitted frames themselves are identical either way).
  *
  * Ordering contract: within a micro-batch events are sorted here;
  * ACROSS batches each user's events must arrive time-ordered — in
  * production the watermark drops stragglers past the delay, and the
  * conformance harness delivers global time-range slices (every event
  * in delivery N precedes every event in delivery N+1).
  */
object CappedSessions {

  /** `ts` (instant) is retained only to carry the watermark through to
    * `groupByKey`; the state machine runs on `ts_us`. */
  final case class Event(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  /** The open frame, or a tombstone when `n == 0` (session closed by
    * event-time timeout; `sess`/`last_us` retained for numbering). */
  final case class Frame(sess: Long, sessStartUs: Long, lastUs: Long,
      sub: Long, subStartUs: Long, subEndUs: Long, n: Long)

  final case class SubRow(user_id: Long, sess: Long, sub: Long,
      sub_start_us: Long, sub_end_us: Long, n_events: Long)

  val GapUs: Long = 86400L * 1000000L
  val CapUs: Long = 86400L * 1000000L

  def updateUser(withTimeout: Boolean)(userId: Long,
      events: Iterator[Event],
      state: GroupState[Frame]): Iterator[SubRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.filter(_.n > 0).map(s =>
        SubRow(userId, s.sess, s.sub, s.subStartUs, s.subEndUs, s.n))
      // tombstone, not remove: sess numbering must survive the idle
      state.getOption.foreach(s => state.update(s.copy(n = 0)))
      return out.iterator
    }
    val sorted = events.toSeq.sortBy(_.ts_us)
    var closed = List.empty[SubRow]
    var cur = state.getOption
    def emit(s: Frame): Unit = if (s.n > 0)
      closed ::= SubRow(userId, s.sess, s.sub, s.subStartUs, s.subEndUs, s.n)
    sorted.foreach { e =>
      cur match {
        case None =>
          cur = Some(Frame(1L, e.ts_us, e.ts_us, 0L, e.ts_us, e.ts_us, 1L))
        case Some(s) if e.ts_us - s.lastUs > GapUs =>
          emit(s) // closes the open frame (no-op on a tombstone)
          cur = Some(Frame(s.sess + 1, e.ts_us, e.ts_us,
            0L, e.ts_us, e.ts_us, 1L))
        case Some(s) =>
          // same session; cap-aligned sub-index from the session start
          val sub = (e.ts_us - s.sessStartUs) / CapUs
          if (sub != s.sub) {
            emit(s)
            cur = Some(s.copy(lastUs = e.ts_us, sub = sub,
              subStartUs = e.ts_us, subEndUs = e.ts_us, n = 1L))
          } else {
            cur = Some(s.copy(lastUs = e.ts_us, subEndUs = e.ts_us,
              n = s.n + 1))
          }
      }
    }
    cur.foreach { s =>
      state.update(s)
      if (withTimeout && s.n > 0)
        state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000L)
    }
    closed.reverseIterator
  }

  /** Wire the state machine over a (watermarked, when streaming) event
    * Dataset. Emits one row per CLOSED cap-aligned sub-session. */
  def subSessions(events: Dataset[Event],
      withTimeout: Boolean = false): Dataset[SubRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (withTimeout) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(updateUser(withTimeout))
  }

  /** Lift a raw (user_id, ts) frame into the watermarked event input. */
  def toEvents(df: DataFrame, delay: String = "0 seconds"): Dataset[Event] = {
    import df.sparkSession.implicits._
    val wm = if (df.isStreaming) df.withWatermark("ts", delay) else df
    wm.select(col("user_id").cast("long").as("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Event]
  }
}
