package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

import graft.Tables
import Exact._

/** Relational conformance queries over the synthetic TPC-H-ish tables.
  *
  * Each query re-expresses one operator class from SURVEY.md §2 (the
  * knightshift operator inventory) as an idiomatic Spark plan, with a
  * DuckDB oracle. Scale notes are on each query: these plans are written
  * to survive a 1000-executor / 100 TB scale-up — dimension joins are
  * broadcast, aggregates are partial+final hash aggs, scans are pruned
  * to the referenced columns and pushed-down predicates.
  */
object Relational extends QueryModule {

  // ---- S3: full-table scan (cleaning pass input; reference did SELECT *
  //      then client-side filtering — validate_tv_channel_games.py:168).
  //      Here the scan stays distributed; ORDER BY only for determinism.
  private def s3ScanFull(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).orderBy("r_regionkey")

  // ---- S4: projection scan with column pruning reaching the parquet
  //      reader (backfill_user_profiles.py:136-140).
  private def s4ScanProject(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // ---- S5: filtered scan, 6-way disjunctive predicate pushed into the
  //      scan (backfill_opening_names.py:88-106).
  private def s5ScanFilteredDisjunctive(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(
        o("o_orderstatus") === "F" ||
        o("o_orderpriority") === "1-URGENT" ||
        o("o_totalprice") > 400000.0)
      .select("o_orderkey")
      .orderBy("o_orderkey")
  }

  // ---- A2: COUNT(*) health probe (knightshift_dag.py:34-37).
  private def a2CountStar(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"))

  // ---- A5: top-k popularity ("most popular openings" analog,
  //      docs/CHANGELOG.md:52-53). Two-phase hash agg then tiny sorted
  //      limit — at 100 TB the shuffle carries only (group, partial count).
  private def a5TopkPopularity(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(desc("n_parts"), asc("p_brand"))
      .limit(10)

  // ---- Flagship: TPC-H Q1-style pricing summary. Exercises the typed
  //      cast pipeline (F5-F7 null-safe numeric handling) + grouped
  //      aggregation. Exact decimal arithmetic → order-independent sums.
  private def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val one = lit(new java.math.BigDecimal("1.00"))
    l.filter(l("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumExact2(col("l_quantity")).as("sum_qty"),
        sumExact2(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
            * (one + dec2(col("l_tax"))))
          .cast("double").as("sum_charge"),
        avgExact2(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---- J4: read-side equi-join games⋈users analog: revenue per nation.
  //      nation (25 rows) broadcasts; customer⋈orders shuffles on the
  //      join key — the partitioning a real cluster would use at 100 TB.
  private def j4JoinRevenuePerNation(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sumExact4(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  // ---- J1 (semi): PK existence probe as a set-oriented left-semi join
  //      (game_upsert.py:92-94 did it one row at a time).
  private def j1SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  // ---- J1 (anti): insert-if-absent probe (backfill_user_profiles.py:
  //      169-175) — customers with no orders at all.
  private def j1AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---- A1/W2: keyed dedup, last-write-wins (game_upsert.py:96-101):
  //      arg-max by recency via row_number. At scale this is one shuffle
  //      on the key — exactly the MERGE the reference pushed to Postgres.
  private def a1DedupLastWrite(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey").as("latest_orderkey"),
        to_date(col("o_orderdate")).as("latest_orderdate"))
      .orderBy("o_custkey")
  }

  // ---- U1/A4: distinct union of two key projections (the white∪black
  //      user-key extraction, backfill_user_profiles.py:140-141).
  private def u1UnionDistinct(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  // ---- O2: pagination (Flask read API, docs/CHANGELOG.md:50-51): page 3
  //      of 50 by (price desc, key) via row_number window filter. The
  //      numbering window is global-order, so a distributed top-150
  //      (TakeOrderedAndProject) bounds its input first — the single-
  //      partition window sees 150 rows at any corpus size, and the
  //      total order (unique o_orderkey tiebreak) makes the top-k
  //      prefix identical to rows 1..150 of the global numbering.
  private def o2Pagination(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.orderBy(desc("o_totalprice"), asc("o_orderkey"))
    o.orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(150)
      .withColumn("page_row", row_number().over(w))
      .filter(col("page_row") > 100)
      .select("page_row", "o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("page_row")
  }

  // ---- Keyed diff between two table versions (the pipeline
  //      regression check). The "new" version is derived
  //      deterministically: every 13th key dropped, every 7th price
  //      bumped (+1.0 on a 2-dp double — exact), every 11th re-keyed
  //      as an addition — all four verdicts live.
  private def opsDiffVersions(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    // same fail-fast discipline as Planting.requireHeadroom, at this
    // entry's own offset (orderkeys exceed the shared 1e5 offset at
    // sf0.1, so the re-key uses 1e6 — guard against SF growth past it)
    val maxKey = o.agg(max("o_orderkey")).head()
    require(maxKey.isNullAt(0) || maxKey.getLong(0) < 1000000L,
      "ops_diff_versions re-keying assumes o_orderkey < 1e6")
    val n = o.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus")))
    graft.ops.Diff.diff(o, n, "o_orderkey").orderBy("o_orderkey")
  }

  // ---- Declarative expectations gate: four rules, ONE aggregation
  //      pass (conditional sums), unpivoted to a per-rule report.
  private def opsQualityReport(s: SparkSession, d: String): DataFrame =
    graft.ops.Validation.report(Tables.orders(s, d), Seq(
      graft.ops.Validation.Rule("price_positive", col("o_totalprice") > 0),
      graft.ops.Validation.Rule("status_domain",
        col("o_orderstatus").isin("F", "O", "P")),
      graft.ops.Validation.Rule("custkey_nonnull",
        col("o_custkey").isNotNull),
      graft.ops.Validation.Rule("priority_format",
        col("o_orderpriority").rlike("^[1-5]-"))))
      .orderBy("rule")

  // ---- Column profile: the "describe" card published next to a
  //      dataset — per column null/distinct/min/max in ONE pass
  //      (distincts plan as a single Expand over one scan). Profiled
  //      columns are int/string/date — engine-portable string forms.
  private def opsProfile(s: SparkSession, d: String): DataFrame =
    graft.ops.Validation.profile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_orderpriority"))
      .orderBy("col_name")

  // ---- Schema contract over the lineitem scan: the consumer-declared
  //      logical schema the pipeline binds to, conformed at the source.
  //      Every drift class is live against the REAL testdata physique:
  //      l_linenumber int32→BIGINT (widened), l_shipdate
  //      TIMESTAMP_NTZ→TIMESTAMP (tz_reinterpreted under pinned UTC),
  //      l_receiptdate absent (missing_filled_null — the generator
  //      omits it), six undeclared columns dropped. If a future
  //      testdata regeneration changes a physical type again, the
  //      pinned drift oracle below goes red and NAMES the drift —
  //      one sentinel row instead of 28 silently broken queries.
  private val LineitemContract = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", LongType),
    StructField("l_quantity", DoubleType),
    StructField("l_receiptdate", TimestampType),
    StructField("l_shipdate", TimestampType),
    StructField("l_returnflag", StringType)))

  private def opsSchemaConform(s: SparkSession, d: String): DataFrame =
    graft.ops.SchemaContract.conform(Tables.lineitem(s, d),
        LineitemContract, strict = true)
      .filter(col("l_returnflag") === "R")
      .orderBy("l_orderkey", "l_linenumber")

  private def opsSchemaDrift(s: SparkSession, d: String): DataFrame = {
    val report = graft.ops.SchemaContract.drift(
      Tables.lineitem(s, d), LineitemContract)
    import s.implicits._
    report.toDF().select(
        col("column").as("col_name"), col("expected"),
        col("found"), col("action"))
      .orderBy("col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ops_diff_versions"       -> (opsDiffVersions _),
    "ops_quality_report"      -> (opsQualityReport _),
    "ops_profile"             -> (opsProfile _),
    "ops_schema_conform"      -> (opsSchemaConform _),
    "ops_schema_drift"        -> (opsSchemaDrift _),
    "s3_scan_full"            -> (s3ScanFull _),
    "s4_scan_project"         -> (s4ScanProject _),
    "s5_scan_filtered"        -> (s5ScanFilteredDisjunctive _),
    "a2_count_star"           -> (a2CountStar _),
    "a5_topk_popularity"      -> (a5TopkPopularity _),
    "q1_pricing_summary"      -> (q1PricingSummary _),
    "j4_join_revenue_nation"  -> (j4JoinRevenuePerNation _),
    "j1_semi_join"            -> (j1SemiJoin _),
    "j1_anti_join"            -> (j1AntiJoin _),
    "a1_dedup_lastwrite"      -> (a1DedupLastWrite _),
    "u1_union_distinct"       -> (u1UnionDistinct _),
    "o2_pagination"           -> (o2Pagination _)
  )

  val oracles: Map[String, String] = Map(
    "ops_diff_versions" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                    FROM orders),
         n AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS o_totalprice,
                  o_orderstatus
           FROM o WHERE o_orderkey % 13 <> 0
           UNION ALL
           SELECT o_orderkey + 1000000 AS o_orderkey, o_totalprice,
                  o_orderstatus
           FROM o WHERE o_orderkey % 11 = 0
         )
         SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                CASE WHEN o.o_orderkey IS NULL THEN 'added'
                     WHEN n.o_orderkey IS NULL THEN 'removed'
                     WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                       THEN 'changed'
                     ELSE 'unchanged' END AS status
         FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
         ORDER BY o_orderkey""",

    // min/max computed on native types, stringified only for the long
    // format; one agg row unpivoted by UNION ALL (DuckDB's stack)
    "ops_profile" ->
      """WITH a AS (
           SELECT count(*) AS n,
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
                  count(DISTINCT o_orderkey) AS nd1,
                  CAST(min(o_orderkey) AS VARCHAR) AS mn1,
                  CAST(max(o_orderkey) AS VARCHAR) AS mx1,
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
                  count(DISTINCT o_custkey) AS nd2,
                  CAST(min(o_custkey) AS VARCHAR) AS mn2,
                  CAST(max(o_custkey) AS VARCHAR) AS mx2,
                  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
                  count(DISTINCT o_orderstatus) AS nd3,
                  min(o_orderstatus) AS mn3,
                  max(o_orderstatus) AS mx3,
                  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
                  count(DISTINCT o_orderdate) AS nd4,
                  CAST(min(o_orderdate) AS VARCHAR) AS mn4,
                  CAST(max(o_orderdate) AS VARCHAR) AS mx4,
                  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn5,
                  count(DISTINCT o_orderpriority) AS nd5,
                  min(o_orderpriority) AS mn5,
                  max(o_orderpriority) AS mx5
           FROM orders)
         SELECT col_name, n AS n_rows, n_nulls, n_distinct,
                min_value, max_value
         FROM (
           SELECT n, 'o_orderkey' AS col_name, nn1 AS n_nulls,
                  nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value
           FROM a
           UNION ALL
           SELECT n, 'o_custkey', nn2, nd2, mn2, mx2 FROM a
           UNION ALL
           SELECT n, 'o_orderstatus', nn3, nd3, mn3, mx3 FROM a
           UNION ALL
           SELECT n, 'o_orderdate', nn4, nd4, mn4, mx4 FROM a
           UNION ALL
           SELECT n, 'o_orderpriority', nn5, nd5, mn5, mx5 FROM a)
         ORDER BY col_name""",

    // the conform projection in SQL: widen, reinterpret, null-fill,
    // drop — identical cell values, so the hash pins the coercions
    "ops_schema_conform" ->
      """SELECT l_orderkey,
                CAST(l_linenumber AS BIGINT) AS l_linenumber,
                l_quantity,
                CAST(NULL AS TIMESTAMP) AS l_receiptdate,
                CAST(l_shipdate AS TIMESTAMP) AS l_shipdate,
                l_returnflag
         FROM lineitem
         WHERE l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",

    // pinned to the CURRENT physical schema of the driver testdata —
    // a regeneration that changes a physical type flips exactly this
    // row red and names the drifted column (the sentinel is the point)
    "ops_schema_drift" ->
      """SELECT * FROM (VALUES
           ('l_discount',      'ABSENT',        'DOUBLE',        'dropped'),
           ('l_extendedprice', 'ABSENT',        'DOUBLE',        'dropped'),
           ('l_linenumber',    'BIGINT',        'INT',           'widened'),
           ('l_linestatus',    'ABSENT',        'STRING',        'dropped'),
           ('l_orderkey',      'BIGINT',        'BIGINT',        'ok'),
           ('l_partkey',       'ABSENT',        'BIGINT',        'dropped'),
           ('l_quantity',      'DOUBLE',        'DOUBLE',        'ok'),
           ('l_receiptdate',   'TIMESTAMP',     'ABSENT',        'missing_filled_null'),
           ('l_returnflag',    'STRING',        'STRING',        'ok'),
           ('l_shipdate',      'TIMESTAMP',     'TIMESTAMP_NTZ', 'tz_reinterpreted'),
           ('l_suppkey',       'ABSENT',        'BIGINT',        'dropped'),
           ('l_tax',           'ABSENT',        'DOUBLE',        'dropped')
         ) AS t(col_name, expected, found, action)
         ORDER BY col_name""",

    "ops_quality_report" ->
      """WITH c AS (
           SELECT count(*) AS n_rows,
                  sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                    AS price_positive,
                  sum(CASE WHEN o_orderstatus IN ('F','O','P')
                           THEN 1 ELSE 0 END) AS status_domain,
                  sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS custkey_nonnull,
                  sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                           THEN 1 ELSE 0 END) AS priority_format
           FROM orders
         )
         SELECT rule, n_rows, CAST(n_pass AS BIGINT) AS n_pass,
                CAST(n_rows - n_pass AS BIGINT) AS n_fail,
                CAST(n_pass AS DOUBLE) / n_rows AS pass_frac
         FROM (
           SELECT 'price_positive' AS rule, n_rows, price_positive AS n_pass FROM c
           UNION ALL
           SELECT 'status_domain', n_rows, status_domain FROM c
           UNION ALL
           SELECT 'custkey_nonnull', n_rows, custkey_nonnull FROM c
           UNION ALL
           SELECT 'priority_format', n_rows, priority_format FROM c)
         ORDER BY rule""",

    "s3_scan_full" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    "s4_scan_project" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",

    "s5_scan_filtered" ->
      """SELECT o_orderkey FROM orders
         WHERE o_orderstatus = 'F' OR o_orderpriority = '1-URGENT'
            OR o_totalprice > 400000.0
         ORDER BY o_orderkey""",

    "a2_count_star" ->
      "SELECT count(*) AS n_rows FROM lineitem",

    "a5_topk_popularity" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
         GROUP BY p_brand ORDER BY n_parts DESC, p_brand LIMIT 10""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "j4_join_revenue_nation" ->
      """SELECT n_name,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                COUNT(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "j1_semi_join" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         ORDER BY c_custkey""",

    "j1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 450000.0)
         ORDER BY c_custkey""",

    "a1_dedup_lastwrite" ->
      """SELECT o_custkey,
                o_orderkey AS latest_orderkey,
                CAST(o_orderdate AS DATE) AS latest_orderdate
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1
         ORDER BY o_custkey""",

    "u1_union_distinct" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         UNION
         SELECT DISTINCT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",

    "o2_pagination" ->
      """SELECT page_row, o_orderkey, o_custkey, o_totalprice
         FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                      row_number() OVER
                        (ORDER BY o_totalprice DESC, o_orderkey) AS page_row
               FROM orders)
         WHERE page_row > 100 AND page_row <= 150
         ORDER BY page_row"""
  )
}
