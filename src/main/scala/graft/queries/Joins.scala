package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Join conformance queries: SURVEY.md §2.4 (J1-J5) — the merge/probe
  * semantics knightshift delegated to Postgres one row at a time,
  * re-expressed as set-oriented distributed joins, plus the join shapes
  * the engine must offer beyond the reference (full outer, cross,
  * range, as-of).
  *
  * Scale notes: dimension sides broadcast; the as-of join avoids the
  * classic per-key nested loop by a union + running-window scan (one
  * shuffle on the key, linear in events); the disjunctive semi-join
  * avoids an OR-join nested loop by decomposing into two equi
  * semi-joins (SURVEY J2's explode pattern).
  */
object Joins extends QueryModule {

  // ---- J2: disjunctive-key semi-join (the white-OR-black flag update,
  //      backfill_user_profiles.py:223-235). An OR join predicate would
  //      force a nested loop; decompose into two equi semi-joins and
  //      union-distinct — each side a broadcast/hash join at scale.
  private def j2DisjunctiveSemi(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber",
      "l_suppkey", "l_partkey")
    val hiSupp = Tables.supplier(s, d)
      .filter(col("s_acctbal") > 5000.0).select("s_suppkey")
    val hiPart = Tables.part(s, d)
      .filter(col("p_retailprice") > 1500.0).select("p_partkey")
    li.join(broadcast(hiSupp), li("l_suppkey") === hiSupp("s_suppkey"), "left_semi")
      .unionByName(
        li.join(broadcast(hiPart), li("l_partkey") === hiPart("p_partkey"), "left_semi"))
      .select("l_orderkey", "l_linenumber")
      .distinct()
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- J3: keyed upsert merge, last-write-wins (game_upsert.py:84-110).
  //      incoming = re-delivered rows with updated values; merge =
  //      existing ⟕anti incoming ∪ incoming. One shuffle on the key —
  //      the set-oriented MERGE the reference did row-at-a-time.
  private def j3UpsertMerge(s: SparkSession, d: String): DataFrame = {
    val existing = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), lit("existing").as("src"))
    val incoming = Tables.orders(s, d)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        lit("incoming").as("src"))
    existing.join(incoming, Seq("o_orderkey"), "left_anti")
      .unionByName(incoming)
      .orderBy("o_orderkey")
  }

  // ---- S9: insert-if-absent merge, first-write-wins
  //      (backfill_user_profiles.py:169-220): incoming rows whose key
  //      already exists are DISCARDED (asymmetric with J3 — the
  //      reference's games overwrite but users don't).
  private def j3FirstWriteWins(s: SparkSession, d: String): DataFrame = {
    val existing = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
    // re-delivery of known keys (must lose) + genuinely new keys (must win)
    val incoming = Tables.customer(s, d)
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"), lit("UPDATED-MUST-NOT-APPEAR").as("c_name"))
      .unionByName(
        Tables.customer(s, d).filter(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            concat(lit("new-"), col("c_name")).as("c_name")))
    existing.unionByName(
        incoming.join(existing, Seq("c_custkey"), "left_anti"))
      .orderBy("c_custkey")
  }

  // ---- J5 (range): equi + range predicate — lineitems shipped within
  //      60 days of their order date. The equi key carries the shuffle;
  //      the range predicate is evaluated post-match (no nested loop).
  private def j5RangeJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"), sumExact2(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  // ---- J5 (as-of): for each purchase event, the most recent view by
  //      the same user at-or-before it. Implemented scalably: tag and
  //      union both sides, one window scan per user ordered by time —
  //      last("view") over an unbounded-preceding frame. No per-row
  //      probes, no nested loop; one shuffle on user_id.
  private def j5AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val tagged = views.withColumn("purchase_id", lit(null).cast("long"))
      .unionByName(purchases.withColumn("view_id", lit(null).cast("long")))
    // views sort before purchases at equal ts (nulls last) so an
    // exactly-simultaneous view is visible to the purchase — matching
    // the inclusive `p.ts >= v.ts` of a textbook ASOF join.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("view_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("asof_view_id", last(col("view_id"), ignoreNulls = true).over(w))
      .filter(col("purchase_id").isNotNull)
      .select(col("purchase_id"), col("asof_view_id"))
      .orderBy("purchase_id")
  }

  // ---- full outer: per-nation customer vs supplier presence — nulls on
  //      both sides exercised (suppliers cover few nations).
  private def jFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
    val sp = Tables.supplier(s, d).groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"))
    c.join(sp, c("c_nationkey") === sp("s_nationkey"), "full_outer")
      .select(
        coalesce(c("c_nationkey"), sp("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  // ---- J6: salted skew join (ops/Skew) under the oracle — the salt is
  //      pure plan plumbing, so the aggregate must equal the plain join
  //      exactly. Revenue per nation through the salted path, exact
  //      decimal sums (order-independent → salt-layout-independent).
  private def j6SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_totalprice")
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    graft.ops.Skew.saltedJoin(o, c, "o_custkey", buckets = 8)
      .groupBy("c_nationkey")
      .agg(sumExact4(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_nationkey")
  }

  // ---- cross join (small × small): region pairs.
  private def jCross(s: SparkSession, d: String): DataFrame = {
    val r1 = Tables.region(s, d).select(col("r_regionkey").as("rk1"))
    val r2 = Tables.region(s, d).select(col("r_regionkey").as("rk2"))
    r1.crossJoin(r2).filter(col("rk1") < col("rk2")).orderBy("rk1", "rk2")
  }

  // ---- J7: Bloom-pruned semi join — lineitem rows whose order passed
  //      a value gate. The sketch prefilters the fact side before its
  //      exchange; the inner exact semi join removes false positives,
  //      so the result hash-matches the plain semi-join oracle (the
  //      no-false-negatives guarantee, proven end-to-end).
  private def j7BloomSemi(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
    graft.ops.BloomPrune.semiJoin(li, "l_orderkey", o, "o_orderkey",
        expectedItems = 100000)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        Exact.sumExact2(col("l_quantity")).as("sum_qty"))
      .orderBy("l_orderkey")
  }

  // ---- J8: SCD-2 history — each user's event_type changelog collapsed
  //      to validity intervals (third upsert flavor beside LWW/FWW:
  //      keep every version, not just the winner).
  private def j8Scd2History(s: SparkSession, d: String): DataFrame =
    graft.ops.Upsert.scd2FromChangelog(
        Tables.events(s, d).select("user_id", "ts", "event_type", "event_id"),
        key = "user_id", ts = "ts", attr = "event_type",
        tieBreak = "event_id")
      .select("user_id", "event_id", "event_type", "valid_from",
        "valid_to", "is_current")
      .orderBy("user_id", "valid_from", "event_id")

  // ---- J8 (merge): incremental SCD-2 — history derived from the
  //      first half-month of the changelog, then the second half
  //      folded in with scd2MergeSlice. Shares j8_scd2_history's
  //      oracle: the driver hash-proves merge(derive(prefix), slice)
  //      ≡ derive(full changelog).
  private def j8Scd2Merge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select("user_id", "ts", "event_type", "event_id")
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val hist = graft.ops.Upsert.scd2FromChangelog(
        ev.filter(col("ts") < split),
        key = "user_id", ts = "ts", attr = "event_type",
        tieBreak = "event_id")
      .select("user_id", "event_id", "event_type", "valid_from",
        "valid_to", "is_current")
    graft.ops.Upsert.scd2MergeSlice(hist, ev.filter(col("ts") >= split),
        key = "user_id", ts = "ts", attr = "event_type",
        tieBreak = "event_id")
      .select("user_id", "event_id", "event_type", "valid_from",
        "valid_to", "is_current")
      .orderBy("user_id", "valid_from", "event_id")
  }

  // ---- J8 (lookup): the temporal dimension join the SCD-2 history
  //      exists FOR — each "purchase" event picks up the event_type
  //      version valid at its timestamp. Interval predicate on top of
  //      the user_id equi-key: the shuffle key stays user_id and the
  //      history side is version-count-sized, so the range filter runs
  //      inside each key's (small) match group. Every event matches
  //      exactly one interval by construction (intervals partition
  //      [first_event, ∞) per user).
  private def j8Scd2Lookup(s: SparkSession, d: String): DataFrame = {
    val hist = graft.ops.Upsert.scd2FromChangelog(
        Tables.events(s, d).select("user_id", "ts", "event_type", "event_id"),
        key = "user_id", ts = "ts", attr = "event_type",
        tieBreak = "event_id")
      .select(col("user_id"), col("event_type").as("state_at_purchase"),
        col("valid_from"), col("valid_to"))
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts"))
    purchases.join(hist,
        col("p_user") === col("user_id") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("state_at_purchase"))
      .orderBy("event_id")
  }

  // ---- J9: fuzzy entity match — corrupted customer names against the
  //      master table. Synthesis (every 3rd customer): one letter
  //      substituted in the 9-digit zone; every 15th gets a second
  //      substitution (zone-A position); every 21st is corrupted
  //      beyond τ (4 chars) — candidates that the Levenshtein confirm
  //      must reject. Blocks sit on the HIGH-ENTROPY tail digits —
  //      (14,3) and (17,2): zero-padded keys make the leading digits
  //      near-constant, so a prefix block degenerates into one hot
  //      key (measured 56 s at sf0.1 before this choice; ~1 s after).
  //      Any single edit leaves at least one of {10-13 untouched
  //      blocks, (14,3), (17,2)} intact, so ≤1-edit recall stays
  //      exact; two-edit rows match whenever an intact block remains.
  private def j9FuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select("c_custkey", "c_name")
    val d1 = expr("concat(substring(c_name, 1, 9 + c_custkey % 9), 'x', " +
      "substring(c_name, 11 + c_custkey % 9))")
    val d2 = expr("concat(substring(__d1, 1, 9 + (c_custkey DIV 3) % 4), " +
      "'y', substring(__d1, 11 + (c_custkey DIV 3) % 4))")
    val dirty = cust.filter(col("c_custkey") % 3 === 0)
      .withColumn("__d1", d1)
      .select((col("c_custkey") + 100000L).as("dirty_id"),
        when(col("c_custkey") % 21 === 0,
            expr("concat(substring(c_name, 1, 9), 'zzzz', " +
              "substring(c_name, 14))"))
          .when(col("c_custkey") % 15 === 0, d2)
          .otherwise(col("__d1")).as("dirty_name"))
    // Deletion-neighborhood blocking over the 9-digit tail (10, 9):
    // ≤2-edit recall is EXACT (subs and indels), so the entry's
    // contract is the true τ-NN join — blocking-independent — and
    // candidate volume is near-linear where fixed windows saturate
    // (the former (17,2) pass alone was n²/100: 75 M pairs and a
    // 1.78 scaling exponent at the 10× stress scale, vs ~1.0 now).
    graft.ops.FuzzyJoin.bestMatch(dirty, cust,
        "dirty_id", "dirty_name", "c_custkey", "c_name",
        blocks = Nil, tau = 2, delBlock = Some((10, 9)))
      .orderBy("dirty_id")
  }

  // ---- J8 streaming form: the CDC changelog split into 3 date-cut
  //      slices and applied through Scd2Stream.applyBatch (the
  //      foreachBatch unit) — the resulting table must converge to
  //      EXACTLY the full-changelog derivation, which is what the
  //      shared scd2HistoryOracle checks. Same e2e discipline as
  //      pgn_stream_e2e: the streamed path is hash-proven against the
  //      batch truth, not just row-counted.
  // the 3-batch merge is a side-effecting build (parquet writes +
  // swaps) — memoized per (session, dir) so bench reruns, Explain,
  // and sibling callers pay it once and share one temp dir
  private def scd2StreamTable(s: SparkSession, d: String): String =
    SessionMemo(s, d, "scd2_stream_table") {
      val log = Tables.events(s, d)
        .select("user_id", "ts", "event_type", "event_id")
      val dir = java.nio.file.Files.createTempDirectory("scd2_stream")
        .toString + "/hist"
      val c1 = to_timestamp(lit("2024-01-11 00:00:00"))
      val c2 = to_timestamp(lit("2024-01-21 00:00:00"))
      val slices = Seq(
        log.filter(col("ts") < c1),
        log.filter(col("ts") >= c1 && col("ts") < c2),
        log.filter(col("ts") >= c2))
      // data-derived per-batch merge partitioning: task/file/state-store
      // counts follow the batch source's size, capped at the core count
      // (graft.queries.ScopedConf.streamPartitions; r20 t2 precedent)
      graft.queries.ScopedConf.withStreamPartitions(s, log) {
        slices.foreach(sl => graft.streaming.Scd2Stream.applyBatch(
          sl, dir, "user_id", "ts", "event_type", "event_id"))
      }
      dir
    }

  private def j8Scd2Stream(s: SparkSession, d: String): DataFrame =
    s.read.parquet(scd2StreamTable(s, d))
      .select("user_id", "event_id", "event_type", "valid_from",
        "valid_to", "is_current")
      .orderBy("user_id", "valid_from", "event_id")

  /** The streamed SCD-2 table build (3 CDC slices applied through
    * Scd2Stream.applyBatch), benched as its own entry — see
    * [[QueryModule.benchBuilds]]. */
  override val benchBuilds: Map[String, (SparkSession, String) => Unit] =
    Map("j8_scd2_stream_build" ->
      ((s, d) => { scd2StreamTable(s, d); () }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j8_scd2_stream"       -> (j8Scd2Stream _),
    "j9_fuzzy_match"       -> (j9FuzzyMatch _),
    "j2_disjunctive_semi"  -> (j2DisjunctiveSemi _),
    "j7_bloom_semi"        -> (j7BloomSemi _),
    "j8_scd2_history"      -> (j8Scd2History _),
    "j8_scd2_lookup"       -> (j8Scd2Lookup _),
    "j8_scd2_merge"        -> (j8Scd2Merge _),
    "j3_upsert_merge"      -> (j3UpsertMerge _),
    "j3_first_write_wins"  -> (j3FirstWriteWins _),
    "j5_range_join"        -> (j5RangeJoin _),
    "j5_asof_join"         -> (j5AsofJoin _),
    "j_full_outer"         -> (jFullOuter _),
    "j_cross"              -> (jCross _),
    "j6_salted_join"       -> (j6SaltedJoin _)
  )

  private lazy val scd2HistoryOracle: String =
    """WITH ordered AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                event_id,
                lag(event_type) OVER w AS prev,
                row_number() OVER w AS rn
         FROM events
         WINDOW w AS (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP), event_id)
       ),
       chg AS (
         SELECT user_id, ts, event_type, event_id FROM ordered
         WHERE rn = 1 OR prev IS DISTINCT FROM event_type
       )
       SELECT user_id, event_id, event_type,
              ts AS valid_from,
              lead(ts) OVER w2 AS valid_to,
              (lead(ts) OVER w2) IS NULL AS is_current
       FROM chg
       WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
       ORDER BY user_id, valid_from, event_id"""

  val oracles: Map[String, String] = Map(
    // mirrors j9FuzzyMatch: same synthesis splices, same two blocking
    // passes, same unit-cost levenshtein confirm, same (dist, key)
    // arg-min — DuckDB's levenshtein is the identical classic DP
    "j9_fuzzy_match" ->
      """WITH dirty AS (
           SELECT c_custkey + 100000 AS dirty_id,
                  CASE WHEN c_custkey % 21 = 0
                         THEN substr(c_name, 1, 9) || 'zzzz' ||
                              substr(c_name, 14)
                       WHEN c_custkey % 15 = 0
                         THEN substr(d1, 1, 9 + (c_custkey // 3) % 4)
                              || 'y' ||
                              substr(d1, 11 + (c_custkey // 3) % 4)
                       ELSE d1 END AS dirty_name
           FROM (SELECT c_custkey, c_name,
                        substr(c_name, 1, 9 + c_custkey % 9) || 'x' ||
                        substr(c_name, 11 + c_custkey % 9) AS d1
                 FROM customer WHERE c_custkey % 3 = 0)
         ),
         del AS (
           SELECT i, j
           FROM generate_series(0, 9) g1(i), generate_series(0, 9) g2(j)
           WHERE (i = 0 AND j = 0) OR (i = 0 AND j > 0)
              OR (i > 0 AND j > i)
         ),
         dsig AS (
           SELECT DISTINCT dirty_id, dirty_name,
                  CASE WHEN i = 0 AND j = 0
                         THEN substr(dirty_name, 10, 9)
                       WHEN i = 0
                         THEN substr(substr(dirty_name, 10, 9), 1, j - 1)
                              || substr(substr(dirty_name, 10, 9), j + 1, 9)
                       ELSE substr(substr(dirty_name, 10, 9), 1, i - 1)
                            || substr(substr(dirty_name, 10, 9), i + 1,
                                      j - i - 1)
                            || substr(substr(dirty_name, 10, 9), j + 1, 9)
                  END AS sig
           FROM dirty, del
         ),
         csig AS (
           SELECT DISTINCT c_custkey, c_name,
                  CASE WHEN i = 0 AND j = 0
                         THEN substr(c_name, 10, 9)
                       WHEN i = 0
                         THEN substr(substr(c_name, 10, 9), 1, j - 1)
                              || substr(substr(c_name, 10, 9), j + 1, 9)
                       ELSE substr(substr(c_name, 10, 9), 1, i - 1)
                            || substr(substr(c_name, 10, 9), i + 1,
                                      j - i - 1)
                            || substr(substr(c_name, 10, 9), j + 1, 9)
                  END AS sig
           FROM customer, del
         ),
         cand AS (
           SELECT DISTINCT dirty_id, dirty_name, c_custkey, c_name
           FROM dsig d JOIN csig c ON d.sig = c.sig
         ),
         conf AS (
           SELECT dirty_id, c_custkey,
                  levenshtein(dirty_name, c_name) AS dist
           FROM cand
           WHERE levenshtein(dirty_name, c_name) <= 2
         ),
         best AS (
           SELECT dirty_id, c_custkey AS matched_key, dist AS edit_dist,
                  count(*) OVER (PARTITION BY dirty_id) AS n_candidates,
                  row_number() OVER (PARTITION BY dirty_id
                                     ORDER BY dist, c_custkey) AS rn
           FROM conf
         )
         SELECT dirty_id, matched_key, edit_dist, n_candidates
         FROM best WHERE rn = 1
         ORDER BY dirty_id""",

    "j7_bloom_semi" ->
      """SELECT l_orderkey, count(*) AS n_lines,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_totalprice > 400000.0)
         GROUP BY l_orderkey ORDER BY l_orderkey""",

    "j8_scd2_history" -> scd2HistoryOracle,
    // the streamed table must converge to the identical full-log truth
    "j8_scd2_stream" -> scd2HistoryOracle,

    // incremental merge reduces to the SAME full-derivation truth —
    // sharing the oracle is the equivalence proof
    "j8_scd2_merge" -> scd2HistoryOracle,

    "j8_scd2_lookup" ->
      """WITH ordered AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                  event_id,
                  lag(event_type) OVER w AS prev,
                  row_number() OVER w AS rn
           FROM events
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ),
         chg AS (
           SELECT user_id, ts, event_type, event_id FROM ordered
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type
         ),
         hist AS (
           SELECT user_id, event_type AS state_at_purchase,
                  ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS valid_to
           FROM chg
         )
         SELECT p.event_id, h.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
                h.state_at_purchase
         FROM events p
         JOIN hist h ON p.user_id = h.user_id
           AND CAST(p.ts AS TIMESTAMP) >= h.valid_from
           AND (h.valid_to IS NULL OR CAST(p.ts AS TIMESTAMP) < h.valid_to)
         WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""",

    "j2_disjunctive_semi" ->
      """SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
         WHERE EXISTS (SELECT 1 FROM supplier
                       WHERE s_suppkey = l_suppkey AND s_acctbal > 5000.0)
            OR EXISTS (SELECT 1 FROM part
                       WHERE p_partkey = l_partkey AND p_retailprice > 1500.0)
         ORDER BY l_orderkey, l_linenumber""",

    "j3_upsert_merge" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                     ELSE o_totalprice END AS o_totalprice,
                CASE WHEN o_orderkey % 3 = 0 THEN 'incoming'
                     ELSE 'existing' END AS src
         FROM orders ORDER BY o_orderkey""",

    "j6_salted_join" ->
      """SELECT c_nationkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "j3_first_write_wins" ->
      """SELECT c_custkey, c_name FROM customer
         UNION ALL
         SELECT c_custkey + 1000000 AS c_custkey, 'new-' || c_name AS c_name
         FROM customer WHERE c_custkey % 7 = 0
         ORDER BY c_custkey""",

    "j5_range_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "j5_asof_join" ->
      """SELECT p.purchase_id, v.view_id AS asof_view_id
         FROM (SELECT event_id AS purchase_id, user_id,
                      CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT event_id AS view_id, user_id,
                      CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id AND p.ts >= v.ts
         ORDER BY p.purchase_id""",

    "j_full_outer" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
                COALESCE(c.n_cust, 0) AS n_cust,
                COALESCE(s.n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
               GROUP BY c_nationkey) c
         FULL OUTER JOIN
              (SELECT s_nationkey, count(*) AS n_supp FROM supplier
               GROUP BY s_nationkey) s
           ON c.c_nationkey = s.s_nationkey
         ORDER BY nationkey""",

    "j_cross" ->
      """SELECT r1.r_regionkey AS rk1, r2.r_regionkey AS rk2
         FROM region r1 CROSS JOIN region r2
         WHERE r1.r_regionkey < r2.r_regionkey
         ORDER BY rk1, rk2"""
  )
}
