package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `flatMapGroupsWithState` (SURVEY.md §2.7 /
  * the T4 extension surface): per-user session tracking with an
  * explicit state machine — the general tool when `session_window` /
  * `dropDuplicates` built-ins can't express the semantics (e.g. the
  * reference's "accumulate lines until a move line" F1 logic is exactly
  * this shape on an unbounded stream).
  *
  * Emits one row per CLOSED session (append-mode friendly); open
  * sessions persist in state until the gap elapses via processing-time
  * timeout in live streams (`withTimeout = true`), or are derived
  * batch-side by [[StatefulSessions.openSessionTails]].
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_us: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  val GapUs: Long = 3600L * 1000000L   // 1h inactivity gap

  /** The state-transition function: events for one user (any order
    * within the batch — sorted here), current state → closed sessions.
    *
    * Scale note: the iterator is buffered to sort, so per-invocation
    * memory is ONE user's events in the current batch (streaming:
    * bounded by the trigger interval; batch: that user's whole
    * history). A pathologically hot key should be pre-split by
    * (user, time bucket) upstream — the same treatment as any skewed
    * group-by — or served by the built-in `session_window`, which
    * streams through a sort instead of buffering.
    * On a processing-time timeout fire (no events for the user since
    * the gap), the open session is emitted and state cleared — without
    * this, live-stream state grows forever and quiet users' last
    * sessions never close. */
  def updateUser(withTimeout: Boolean)(userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(s =>
        ClosedSession(userId, s.startUs, s.lastUs + GapUs, s.n)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ts_us)
    var closed = List.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.lastUs <= GapUs =>
          cur = Some(s.copy(lastUs = e.ts_us, n = s.n + 1))
        case Some(s) =>
          closed ::= ClosedSession(userId, s.startUs, s.lastUs + GapUs, s.n)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    cur.foreach(state.update)
    if (withTimeout && state.exists) {
      state.setTimeoutDuration(GapUs / 1000L)   // gap in millis
    }
    closed.reverseIterator
  }

  /** Wire the state machine over an event Dataset. `withTimeout=true`
    * (live streams) closes idle sessions via processing-time timeout;
    * batch runs use `false` (one pass sees all data — the per-user
    * tails come from [[openSessionTails]]). */
  def closedSessions(events: Dataset[Event],
      withTimeout: Boolean = false): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(updateUser(withTimeout))
  }

  /** Test/batch helper: what the still-open sessions would emit if the
    * stream ended now (batch runs see all data, so open sessions are
    * the per-user tails). */
  def openSessionTails(spark: SparkSession, events: Dataset[Event])
      : Dataset[ClosedSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toSeq.sortBy(_.ts_us)
        var cur: Option[SessionState] = None
        var last: Option[SessionState] = None
        sorted.foreach { e =>
          cur = cur match {
            case Some(s) if e.ts_us - s.lastUs <= GapUs =>
              Some(s.copy(lastUs = e.ts_us, n = s.n + 1))
            case _ => Some(SessionState(e.ts_us, e.ts_us, 1))
          }
          last = cur
        }
        last.map(s => ClosedSession(uid, s.startUs, s.lastUs + GapUs, s.n))
          .iterator
      }
  }
}
