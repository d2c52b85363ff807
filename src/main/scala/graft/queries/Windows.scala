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

  // ---- W6: rolling active users (the DAU/WAU shape) — DISTINCT users
  //      per sliding 24h window, 6h slide. Distinct-in-window is the
  //      part t4_sliding's plain count doesn't cover; Spark expands
  //      each event into its 4 windows BEFORE the distinct agg, so the
  //      shuffle key is (window, user) and partial aggregation still
  //      applies.
  private def w6ActiveUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "24 hours", "6 hours").as("w"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("win_start_us"),
        col("n_users"), col("n_events"))
      .orderBy("win_start_us")

  // ---- W4: ordered conversion funnel (view → click → purchase, each
  //      stage strictly after the previous). Three user-keyed min-aggs
  //      chained by joins — every groupBy/join shares the user_id
  //      partitioning, so the whole funnel is ONE exchange deep at any
  //      corpus size. Timestamps surface as epoch µs (engine-exact).
  private def w4Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val users = ev.select("user_id").distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("ts_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("ts_view"))
      .groupBy("user_id").agg(min("ts").as("ts_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("ts_click"))
      .groupBy("user_id").agg(min("ts").as("ts_purchase"))
    users.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        unix_micros(col("ts_view")).as("view_us"),
        unix_micros(col("ts_click")).as("click_us"),
        unix_micros(col("ts_purchase")).as("purchase_us"),
        when(col("ts_purchase").isNotNull, 3)
          .when(col("ts_click").isNotNull, 2)
          .when(col("ts_view").isNotNull, 1)
          .otherwise(0).as("stage"))
      .orderBy("user_id")
  }

  // ---- W5: retention cohorts — users bucketed by first-seen date,
  //      counted per (cohort, day offset). Two user-keyed aggs + one
  //      date-keyed agg; the cohort table is user-count-sized metadata.
  private def w5Retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  // ---- W7: event-sequence transition matrix (the Markov view of user
  //      journeys: for each event_type → next_event_type step, the
  //      count and the row-normalized probability). One lead() window
  //      per user sequence + one two-phase aggregation on the pair;
  //      the probability is exact-int count / exact-int row total —
  //      ONE IEEE division, cross-engine bit-stable. Transition
  //      tables are |types|² rows — metadata at any corpus size; the
  //      corpus pays the user-keyed window exchange only.
  private def w7Transitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    pairs
      .withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(tot).cast("double"))
      .orderBy("from_type", "to_type")
  }

  // ---- W8: interval union per user (total covered time + island
  //      count) — the gaps-and-islands sweep: running max of interval
  //      ends marks island starts, a running sum numbers them, two
  //      aggregations collapse to per-user coverage. Durations derive
  //      from the value column (3600 + ⌊value⌋·60 s) so intervals
  //      genuinely overlap; everything is epoch-µs BIGINT — no floats
  //      anywhere. One user-keyed exchange serves both windows and
  //      both aggregations (same sort), the canonical islands shape.
  private def w8IntervalUnion(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_us", "end_us", "event_id")
    val prevMax = max(col("end_us")).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) +
          (lit(3600L) + floor(col("value")).cast("long") * 60L)
            * 1000000L).as("end_us"))
      .withColumn("__new",
        when(prevMax.isNull || col("start_us") > prevMax, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(w))
      .groupBy("user_id", "__island")
      .agg(min(col("start_us")).as("__s"), max(col("end_us")).as("__e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered_us"))
      .orderBy("user_id")
  }

  // ---- W9: calendar gap fill — per user, one row per day between
  //      first and last activity, zero-filled (the "spine" every
  //      time-series report needs before rolling windows make sense).
  //      Per-user bounds are one aggregation; the spine is a
  //      generator (explode of a date sequence — rows scale with
  //      user-days, never materialized corpus-side); the left join
  //      back rides the (user, day) key. No window functions at all.
  /** The spine-join body, testable on any (user_id, ts) frame. */
  private[graft] def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("__n"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(col("user_id"),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("__n"), lit(0L)).as("n_events"))
  }

  private def w9GapFill(s: SparkSession, d: String): DataFrame =
    gapFillDaily(Tables.events(s, d)).orderBy("user_id", "day")

  // ---- T2 extension: WATERMARKED event-time dedup — the bounded-state
  //      form of the reference's unbounded LWW upsert model (SURVEY
  //      §2.7/T2: `withWatermark(...).dropDuplicates`). State holds only
  //      keys with ts above the watermark (1 h behind max event time),
  //      so per-key memory is bounded by the lateness budget, not by
  //      history — the trade: a duplicate arriving LATER than the
  //      budget is dropped as late data (if its ts is below the
  //      watermark) rather than matched against evicted state.
  //      StreamingSpec pins both sides of that trade.

  /** Plant the t2 stream once per (session, dir): three event-time
    * slices (days 1–10 / 11–20 / 21+) as ONE parquet file each with
    * strictly increasing modification times, so the file source's
    * modTime ordering makes batches ≡ slices and the watermark
    * sequence is fully deterministic. Planted inputs: every 37th
    * event appears TWICE in its own slice (in-watermark duplicate →
    * deduped) and every 53rd slice-0 event is REPLAYED in slice 2
    * (ts is then ~10 days below the watermark → dropped as late), so
    * the streamed output must equal exactly the original events table
    * — the batch-distinct oracle. */
  private def t2StreamDir(s: SparkSession, d: String): String =
    SessionMemo(s, d, "t2_watermark_stream") {
      val base = java.nio.file.Files.createTempDirectory("t2_wm").toString
      val e = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type")
      val c1 = to_timestamp(lit("2024-01-11 00:00:00"))
      val c2 = to_timestamp(lit("2024-01-21 00:00:00"))
      val dup = e.filter(pmod(col("event_id"), lit(37)) === 0)
      val late = e.filter(col("ts") < c1 &&
        pmod(col("event_id"), lit(53)) === 0)
      val slices = Seq(
        e.filter(col("ts") < c1)
          .unionByName(dup.filter(col("ts") < c1)),
        e.filter(col("ts") >= c1 && col("ts") < c2)
          .unionByName(dup.filter(col("ts") >= c1 && col("ts") < c2)),
        e.filter(col("ts") >= c2)
          .unionByName(dup.filter(col("ts") >= c2))
          .unionByName(late))
      slices.zipWithIndex.foreach { case (sl, i) =>
        val tmp = s"$base/tmp_$i"
        sl.coalesce(1).write.parquet(tmp)   // fixture: one file per slice
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        val dst = java.nio.file.Paths.get(s"$base/slice_$i.parquet")
        java.nio.file.Files.move(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + i * 60000L))
        graft.sources.TableSwap.deleteRecursively(
          java.nio.file.Paths.get(tmp))
      }
      base
    }

  private def t2WatermarkDedup(s: SparkSession, d: String): DataFrame = {
    val dir = t2StreamDir(s, d)
    val schema = s.read.parquet(s"$dir/slice_0.parquet").schema
    val sink = "t2_wm_dedup_sink"
    s.catalog.dropTempView(sink)            // re-runs re-register
    // state-store sizing: each micro-batch instantiates one
    // HDFS-backed dedup state store PER shuffle partition, and this
    // three-slice fixture pays that setup 3× — at 32 partitions the
    // 96 store instances dominate the wall clock and swing with disk
    // contention (the documented 4–11 s band). 8 partitions keep
    // ~12.5k state rows per store at sf0.1 (far under memory) and cut
    // the fixed store count 4×. At 100 TB the SAME dial scales the
    // other way: size partitions so each store's state fits an
    // executor, not by the default. Scoped to the stream and restored
    // — batch queries keep the session's 32.
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // the stream pins numShufflePartitions from the session conf at
      // its first batch, so the restore must wait for completion
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)    // one slice per micro-batch
        .parquet(dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id", "ts")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(sink)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t2_watermark_dedup" -> (t2WatermarkDedup _),
    "w9_gap_fill" -> (w9GapFill _),
    "w8_interval_union" -> (w8IntervalUnion _),
    "w7_transitions" -> (w7Transitions _),
    "w4_funnel"    -> (w4Funnel _),
    "w5_retention" -> (w5Retention _),
    "w6_active_users" -> (w6ActiveUsers _),
    "t4_tumbling_window" -> (t4Tumbling _),
    "t4_sliding_window"  -> (t4Sliding _),
    "t4_session_window"  -> (t4Session _),
    "f1_stateful_sessions" -> (f1StatefulSessions _)
  )

  /** The slice planting is one-time per (session, dir) — an explicit
    * build line so the streamed entry's bench number reflects the
    * stream run, not the fixture write. */
  override val benchBuilds: Map[String, (SparkSession, String) => Unit] =
    Map("t2_wm_stream_build" -> ((s, d) => { t2StreamDir(s, d); () }))

  val oracles: Map[String, String] = Map(

    // in-watermark duplicates deduped, late replays dropped → the
    // stream converges to exactly the original (event_id-unique)
    // events table: the batch-distinct oracle
    "t2_watermark_dedup" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                user_id, event_type
         FROM events ORDER BY event_id""",

    // generate_series is inclusive on both ends, matching Spark's
    // sequence(d0, d1) — one spine row per user-day
    "w9_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         bounds AS (
           SELECT user_id, min(day) AS d0, max(day) AS d1
           FROM daily GROUP BY user_id),
         spine AS (
           SELECT user_id,
                  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
                    AS day
           FROM bounds)
         SELECT s.user_id, s.day,
                CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
         FROM spine s LEFT JOIN daily d
           ON s.user_id = d.user_id AND s.day = d.day
         ORDER BY s.user_id, s.day""",

    "w8_interval_union" ->
      """WITH iv AS (
           SELECT user_id, event_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
                  epoch_us(CAST(ts AS TIMESTAMP)) +
                    (3600 + CAST(floor(value) AS BIGINT) * 60) * 1000000
                    AS end_us
           FROM events),
         fl AS (
           SELECT user_id, start_us, end_us,
                  CASE WHEN max(end_us) OVER (
                         PARTITION BY user_id
                         ORDER BY start_us, end_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) IS NULL
                         OR start_us > max(end_us) OVER (
                         PARTITION BY user_id
                         ORDER BY start_us, end_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING)
                       THEN 1 ELSE 0 END AS new_island,
                  event_id
           FROM iv),
         isl AS (
           SELECT user_id, start_us, end_us,
                  sum(new_island) OVER (
                    PARTITION BY user_id
                    ORDER BY start_us, end_us, event_id
                    ROWS UNBOUNDED PRECEDING) AS island
           FROM fl),
         agg AS (
           SELECT user_id, island, min(start_us) AS s, max(end_us) AS e
           FROM isl GROUP BY user_id, island)
         SELECT user_id, count(*) AS n_islands,
                CAST(sum(e - s) AS BIGINT) AS covered_us
         FROM agg GROUP BY user_id
         ORDER BY user_id""",

    "w7_transitions" ->
      """WITH seq AS (
           SELECT event_type,
                  lead(event_type) OVER (
                    PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP), event_id)
                    AS next_type
           FROM events),
         pr AS (
           SELECT event_type AS from_type, next_type AS to_type,
                  count(*) AS n
           FROM seq WHERE next_type IS NOT NULL
           GROUP BY 1, 2)
         SELECT from_type, to_type, n,
                CAST(n AS DOUBLE) /
                  CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                  AS p
         FROM pr ORDER BY from_type, to_type""",

    "w4_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
                           CAST(ts AS TIMESTAMP) AS ts FROM events),
         v AS (SELECT user_id, min(ts) AS ts_view FROM e
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS ts_click
               FROM e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > v.ts_view
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS ts_purchase
               FROM e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > c.ts_click
               GROUP BY e.user_id)
         SELECT u.user_id,
                epoch_us(v.ts_view) AS view_us,
                epoch_us(c.ts_click) AS click_us,
                epoch_us(p.ts_purchase) AS purchase_us,
                CASE WHEN p.ts_purchase IS NOT NULL THEN 3
                     WHEN c.ts_click IS NOT NULL THEN 2
                     WHEN v.ts_view IS NOT NULL THEN 1
                     ELSE 0 END AS stage
         FROM (SELECT DISTINCT user_id FROM e) u
         LEFT JOIN v USING (user_id)
         LEFT JOIN c USING (user_id)
         LEFT JOIN p USING (user_id)
         ORDER BY u.user_id""",

    "w5_retention" ->
      """WITH e AS (SELECT user_id,
                           CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                    FROM events),
         cohort AS (SELECT user_id, min(day) AS cohort_day FROM e
                    GROUP BY user_id)
         SELECT cohort_day,
                CAST(date_diff('day', cohort_day, day) AS INT)
                  AS day_offset,
                count(*) AS n_users
         FROM (SELECT DISTINCT c.cohort_day, e.day, e.user_id
               FROM e JOIN cohort c USING (user_id))
         GROUP BY cohort_day, day_offset
         ORDER BY cohort_day, day_offset""",

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

    "w6_active_users" ->
      """SELECT win_start_us, count(DISTINCT user_id) AS n_users,
                count(*) AS n_events
         FROM (
           SELECT user_id,
                  epoch_us(time_bucket(INTERVAL 6 HOUR,
                           CAST(ts AS TIMESTAMP)))
                  - o.off * 21600000000 AS win_start_us
           FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS off) o
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
