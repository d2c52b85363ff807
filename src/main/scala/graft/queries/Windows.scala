package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** T4 streaming-window semantics (SURVEY.md §2.7), oracle-checked in
  * batch form over `events`: tumbling, sliding, and session windows.
  * The same expressions run under `readStream` with a watermark (see
  * streaming/StreamingWindows + StreamingSpec); batch-mode execution is
  * how the oracle can hash-check window semantics.
  *
  * Window bounds are surfaced as epoch MICROSECONDS (bigint) — exact in
  * both engines, no timestamp-encoding ambiguity.
  */
object Windows extends QueryModule {

  // ---- tumbling 1h: event counts + exact value sums per (window, type).
  private def t4Tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumExact2(col("value")).as("sum_v"))
      .select(unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_v"))
      .orderBy("win_start_us", "event_type")

  // ---- sliding 1h window, 30m slide: each event lands in 2 windows.
  private def t4Sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("n"))
      .orderBy("win_start_us")

  // ---- session windows: 1h inactivity gap per user (the streaming
  //      form of W1 sessionization); end = last event + gap.
  private def t4Session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("sess_start_us"),
        unix_micros(col("w.end")).as("sess_end_us"),
        col("n_events"))
      .orderBy("user_id", "sess_start_us")

  // ---- F1 stateful sessionization through the REAL
  //      flatMapGroupsWithState machine (streaming/StatefulSessions),
  //      run in batch mode (supported: state starts empty, one
  //      invocation per key). closedSessions emits sessions followed by
  //      a later one; the per-user tail (what a timeout fire would
  //      close) comes from openSessionTails — together, every session.
  //      Oracle = gap sessionization SQL, same truth as
  //      t4_session_window, so the custom state machine is hash-checked
  //      against declarative SQL semantics.
  private def f1StatefulSessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StatefulSessions
    val events = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[StatefulSessions.Event]
    StatefulSessions.closedSessions(events)
      .unionByName(StatefulSessions.openSessionTails(s, events))
      .toDF()
      .select(col("user_id"), col("start_us").as("sess_start_us"),
        col("end_us").as("sess_end_us"), col("n_events"))
      .orderBy("user_id", "sess_start_us")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t4_tumbling_window" -> (t4Tumbling _),
    "t4_sliding_window"  -> (t4Sliding _),
    "t4_session_window"  -> (t4Session _),
    "f1_stateful_sessions" -> (f1StatefulSessions _)
  )

  val oracles: Map[String, String] = Map(
    "t4_tumbling_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS win_start_us,
                event_type, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events
         GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    // window starts covering ts: floor30(ts) and floor30(ts) - 30min
    "t4_sliding_window" ->
      """SELECT win_start_us, count(*) AS n FROM (
           SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)))
                  - o.off * 1800000000 AS win_start_us
           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) o
         )
         GROUP BY win_start_us ORDER BY win_start_us""",

    // one truth, two entries: the built-in session_window and the
    // flatMapGroupsWithState machine must agree with the same SQL
    "t4_session_window"    -> sessionOracle,
    "f1_stateful_sessions" -> sessionOracle
  )

  // Gap sessionization over (us, event_id)-ordered events. BOTH windows
  // carry the event_id tiebreak: with only `ORDER BY us`, a duplicate
  // timestamp at a session boundary could frame the tied peer before
  // the boundary row and count it into the previous session — an
  // assignment neither Spark path can produce.
  private lazy val sessionOracle: String =
      """WITH e AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  event_id
           FROM events
         ),
         marked AS (
           SELECT user_id, us, event_id,
                  CASE WHEN prev_us IS NULL
                         OR us - prev_us > CAST(3600000000 AS BIGINT)
                       THEN 1 ELSE 0 END AS boundary
           FROM (SELECT user_id, us, event_id,
                        lag(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS prev_us
                 FROM e)
         ),
         sess AS (
           SELECT user_id, us,
                  SUM(boundary) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked
         )
         SELECT user_id,
                min(us) AS sess_start_us,
                max(us) + CAST(3600000000 AS BIGINT) AS sess_end_us,
                count(*) AS n_events
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, sess_start_us"""
}
