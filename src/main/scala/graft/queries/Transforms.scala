package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.SafeCasts

/** Scalar-transform conformance queries: SURVEY.md §2.2 (F4-F16) and
  * §2.3 (P1-P2) re-expressed over the synthetic tables.
  *
  * The reference implemented all of these as per-row Python functions
  * (null-on-error casts, CASE-style normalizations, notes accumulation);
  * here each is a single codegen'd projection — no UDFs, so the whole
  * stage stays inside WholeStageCodegen and scales linearly with input.
  *
  * ANSI note: the driver's sessions run with ANSI mode ON (Spark 4
  * default), so every potentially-failing cast uses try_cast /
  * try_to_date / try_to_timestamp — reproducing the reference's
  * pervasive null-on-error semantics (game_upsert.py:21-51).
  */
object Transforms extends QueryModule {

  // ---- F4: key extraction from a delimited string (game-id from URL,
  //      game_upsert.py:61) — last segment after '#'.
  // Sort-first pattern (here and below): `orderBy` BEFORE the computed
  // projection. Range partitioning samples its child to pick bounds —
  // with the projection on top of the sort, the sample pass re-executes
  // only the narrow scan, not the expensive expressions, which then run
  // exactly once above the sort.
  private def f4ExtractKey(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .orderBy("c_custkey")
      .select(
        col("c_custkey"),
        substring_index(col("c_name"), "#", -1).as("name_seg"),
        SafeCasts.tryToLong(substring_index(col("c_name"), "#", -1))
          .as("name_num"))

  // ---- F5: null-safe int cast (_parse_int, game_upsert.py:21-29):
  //      '1-URGENT' → 1 via prefix, whole string → NULL.
  private def f5TryCastInt(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        SafeCasts.tryToInt(substring_index(col("o_orderpriority"), "-", 1))
          .as("prio_num"),
        // every value fails this cast — the guarded form is where the
        // measured 7× exception-path win comes from
        SafeCasts.tryToInt(col("o_orderpriority")).as("prio_bad"))

  // ---- F6: null-safe date parse 'yyyy.MM.dd' (_parse_date,
  //      game_upsert.py:32-41). Dates are round-tripped through the
  //      reference's dotted format; every 7th row is corrupted to the
  //      dashed format and must come back NULL.
  private def f6TryParseDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy("o_orderkey")
      .withColumn("raw",
        when(col("o_orderkey") % 7 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .otherwise(date_format(col("o_orderdate"), "yyyy.MM.dd")))
      .select(
        col("o_orderkey"),
        col("raw"),
        SafeCasts.tryToDate(col("raw"), "yyyy.MM.dd").as("parsed"))

  // ---- F7: null-safe time parse → canonical HH:mm:ss string
  //      (_parse_time, game_upsert.py:43-51; TIME stored as string per
  //      SURVEY §1.2). Non-padded 'H:m:s' input is rebuilt from event
  //      timestamps, then canonicalized.
  private def f7TimeCanonical(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .orderBy("event_id")
      .withColumn("raw", concat_ws(":",
        hour(col("ts")), minute(col("ts")), second(col("ts"))))
      .select(
        col("event_id"),
        col("raw"),
        date_format(try_to_timestamp(col("raw"), lit("H:m:s")), "HH:mm:ss")
          .as("canonical"))

  // ---- F10: title normalization (_clean_title,
  //      validate_tv_channel_games.py:78-83): falsy/none-ish → 'None',
  //      else trim+upper.
  private def f10CaseNormalize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        when(lower(trim(col("event_type"))).isin("view", "error") ||
             col("event_type").isNull || trim(col("event_type")) === "",
          lit("None"))
        .otherwise(upper(trim(col("event_type")))).as("type_norm"))
      .orderBy("event_id")

  // ---- F11: sentinel → NULL rewrite (eco '?' cleanup,
  //      validate_tv_channel_games.py:125-131).
  private def f11SentinelNull(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(trim(col("o_orderstatus")) === "P", lit(null))
          .otherwise(col("o_orderstatus")).as("status_clean"))
      .orderBy("o_orderkey")

  // ---- F12: dict-lookup canonicalization with default (termination map,
  //      validate_tv_channel_games.py:134-141) — a literal map lookup
  //      with coalesce default, the codegen-friendly CASE form.
  private val termMap = Map(
    "CLICK" -> "CLICK", "VIEW" -> "VIEW",
    "PURCHASE" -> "CONVERSION", "SIGNUP" -> "CONVERSION")
  private def f12MapCanonicalize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(coalesce(
          element_at(typedLit(termMap), upper(trim(col("event_type")))),
          lit("NORMAL")).as("type_canon"))
      .groupBy("type_canon")
      .agg(count(lit(1)).as("n"))
      .orderBy("type_canon")

  // ---- F13: typed sentinel cleaner (_clean_value,
  //      backfill_user_profiles.py:156-166): {'<null>','null','none',''}
  //      case-insensitively → NULL, else typed cast.
  private def f13TypedSentinel(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .orderBy("p_partkey")
      .withColumn("raw",
        when(col("p_partkey") % 11 === 0, lit("null"))
        .when(col("p_partkey") % 13 === 0, lit("<NULL>"))
        .when(col("p_partkey") % 17 === 0, lit(" "))
        .otherwise(col("p_size").cast("string")))
      .select(
        col("p_partkey"),
        when(lower(trim(col("raw"))).isin("<null>", "null", "none", ""),
          lit(null))
        .otherwise(SafeCasts.tryToInt(trim(col("raw")))).as("size_clean"))

  // ---- F14: JSON flattening (nested profile JSON,
  //      backfill_user_profiles.py:178-214) over the events props column.
  private def f14JsonFlatten(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .orderBy("event_id")
      .select(
        col("event_id"),
        SafeCasts.tryToInt(get_json_object(col("props"), "$.k")).as("k_val"))

  // ---- F15: validation-notes accumulation (join of conditional note
  //      strings, default 'Valid' — validate_tv_channel_games.py:103-155).
  private def f15NotesAccum(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("notes", concat_ws(", ",
        when(col("o_totalprice") > 400000.0, lit("high value")),
        when(col("o_orderstatus") === "F", lit("finished")),
        when(col("o_orderpriority").startsWith("1"), lit("urgent"))))
      .select(
        col("o_orderkey"),
        when(length(col("notes")) === 0, lit("Valid"))
          .otherwise(col("notes")).as("val_notes"))
      .orderBy("o_orderkey")

  // ---- F16: timestamp formatting (backfill_opening_names.py:146).
  private def f16TsFormat(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("dt_str"))
      .orderBy("o_orderkey")

  // ---- P1: required-fields predicate with delete-on-invalid split
  //      (_validate_required, validate_tv_channel_games.py:65-67 + S10):
  //      rows with falsy required fields are dropped, survivors kept.
  private def p1RequiredFields(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("name_maybe",
        when(col("p_partkey") % 17 === 0, lit(""))
        .otherwise(col("p_name")))
      .filter(!(col("name_maybe").isNull || col("name_maybe") === "" ||
                col("p_brand").isNull || col("p_brand") === ""))
      .select("p_partkey", "name_maybe")
      .orderBy("p_partkey")

  // ---- P2: domain-membership validation (_validate_result,
  //      validate_tv_channel_games.py:70-75): rows outside the legal
  //      result set are rejected; counts per kept domain value.
  private def p2DomainMembership(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  // ---- F17 (breadth): the string-function surface a full engine
  //      offers — pad/translate/repeat/reverse/edit-distance — all
  //      codegen'd, all portable.
  private def f17StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .orderBy("p_partkey")
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        translate(col("p_type"), "AEIOU", "aeiou").as("translated"),
        reverse(col("p_name")).as("reversed"),
        repeat(col("p_brand"), 2).as("repeated"),
        levenshtein(col("p_name"), col("p_brand")).as("edit_dist"))

  // ---- A8 (breadth): array-function surface over grouped data —
  //      collect, sort, dedupe, slice, positional access.
  private def a8ArrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
      .select(
        col("l_orderkey"),
        size(col("lines")).as("n_lines"),
        element_at(col("lines"), 1).as("first_line"),
        element_at(col("lines"), -1).as("last_line"),
        // Arrays serialized to CSV strings: the driver's pandas compare
        // cannot hash array cells, and the semantics are unchanged.
        array_join(slice(col("lines"), 1, 2).cast("array<string>"), ",")
          .as("first_two"),
        array_join(array_sort(array_distinct(col("lines"))).cast("array<string>"), ",")
          .as("distinct_lines"),
        array_contains(col("lines"), 1).as("has_line1"))
      .orderBy("l_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f17_string_funcs"     -> (f17StringFuncs _),
    "a8_array_funcs"       -> (a8ArrayFuncs _),
    "f4_extract_key"       -> (f4ExtractKey _),
    "f5_try_cast_int"      -> (f5TryCastInt _),
    "f6_try_parse_date"    -> (f6TryParseDate _),
    "f7_time_canonical"    -> (f7TimeCanonical _),
    "f10_case_normalize"   -> (f10CaseNormalize _),
    "f11_sentinel_null"    -> (f11SentinelNull _),
    "f12_map_canonicalize" -> (f12MapCanonicalize _),
    "f13_typed_sentinel"   -> (f13TypedSentinel _),
    "f14_json_flatten"     -> (f14JsonFlatten _),
    "f15_notes_accum"      -> (f15NotesAccum _),
    "f16_ts_format"        -> (f16TsFormat _),
    "p1_required_fields"   -> (p1RequiredFields _),
    "p2_domain_membership" -> (p2DomainMembership _)
  )

  val oracles: Map[String, String] = Map(
    "f17_string_funcs" ->
      """SELECT p_partkey,
                lpad(p_brand, 12, '*') AS padded,
                translate(p_type, 'AEIOU', 'aeiou') AS translated,
                reverse(p_name) AS reversed,
                repeat(p_brand, 2) AS repeated,
                CAST(levenshtein(p_name, p_brand) AS INT) AS edit_dist
         FROM part ORDER BY p_partkey""",

    "a8_array_funcs" ->
      """SELECT l_orderkey,
                len(lines) AS n_lines,
                lines[1] AS first_line,
                lines[-1] AS last_line,
                array_to_string(lines[1:2], ',') AS first_two,
                array_to_string(list_sort(list_distinct(lines)), ',') AS distinct_lines,
                list_contains(lines, 1) AS has_line1
         FROM (SELECT l_orderkey,
                      list(l_linenumber ORDER BY l_linenumber) AS lines
               FROM lineitem GROUP BY l_orderkey)
         ORDER BY l_orderkey""",

    "f4_extract_key" ->
      """SELECT c_custkey, split_part(c_name, '#', 2) AS name_seg,
                TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS name_num
         FROM customer ORDER BY c_custkey""",

    "f5_try_cast_int" ->
      """SELECT o_orderkey,
                TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS prio_num,
                TRY_CAST(o_orderpriority AS INT) AS prio_bad
         FROM orders ORDER BY o_orderkey""",

    "f6_try_parse_date" ->
      """SELECT o_orderkey, raw,
                CAST(try_strptime(raw, '%Y.%m.%d') AS DATE) AS parsed
         FROM (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 7 = 0
                           THEN strftime(o_orderdate, '%Y-%m-%d')
                           ELSE strftime(o_orderdate, '%Y.%m.%d') END AS raw
               FROM orders)
         ORDER BY o_orderkey""",

    "f7_time_canonical" ->
      """SELECT event_id, raw,
                strftime(try_strptime(raw, '%H:%M:%S'), '%H:%M:%S') AS canonical
         FROM (SELECT event_id,
                      concat_ws(':', hour(CAST(ts AS TIMESTAMP)),
                                     minute(CAST(ts AS TIMESTAMP)),
                                     CAST(floor(second(CAST(ts AS TIMESTAMP))) AS INT)) AS raw
               FROM events)
         ORDER BY event_id""",

    "f10_case_normalize" ->
      """SELECT event_id,
                CASE WHEN lower(trim(event_type)) IN ('view','error')
                       OR event_type IS NULL OR trim(event_type) = ''
                     THEN 'None'
                     ELSE upper(trim(event_type)) END AS type_norm
         FROM events ORDER BY event_id""",

    "f11_sentinel_null" ->
      """SELECT o_orderkey,
                CASE WHEN trim(o_orderstatus) = 'P' THEN NULL
                     ELSE o_orderstatus END AS status_clean
         FROM orders ORDER BY o_orderkey""",

    "f12_map_canonicalize" ->
      """SELECT type_canon, count(*) AS n
         FROM (SELECT CASE upper(trim(event_type))
                        WHEN 'CLICK' THEN 'CLICK'
                        WHEN 'VIEW' THEN 'VIEW'
                        WHEN 'PURCHASE' THEN 'CONVERSION'
                        WHEN 'SIGNUP' THEN 'CONVERSION'
                        ELSE 'NORMAL' END AS type_canon
               FROM events)
         GROUP BY type_canon ORDER BY type_canon""",

    "f13_typed_sentinel" ->
      """SELECT p_partkey,
                CASE WHEN lower(trim(raw)) IN ('<null>','null','none','')
                     THEN NULL
                     ELSE TRY_CAST(trim(raw) AS INT) END AS size_clean
         FROM (SELECT p_partkey,
                      CASE WHEN p_partkey % 11 = 0 THEN 'null'
                           WHEN p_partkey % 13 = 0 THEN '<NULL>'
                           WHEN p_partkey % 17 = 0 THEN ' '
                           ELSE CAST(p_size AS VARCHAR) END AS raw
               FROM part)
         ORDER BY p_partkey""",

    "f14_json_flatten" ->
      """SELECT event_id, TRY_CAST(props->>'k' AS INT) AS k_val
         FROM events ORDER BY event_id""",

    "f15_notes_accum" ->
      """SELECT o_orderkey,
                CASE WHEN length(notes) = 0 THEN 'Valid' ELSE notes END AS val_notes
         FROM (SELECT o_orderkey,
                      concat_ws(', ',
                        CASE WHEN o_totalprice > 400000.0 THEN 'high value' END,
                        CASE WHEN o_orderstatus = 'F' THEN 'finished' END,
                        CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent' END) AS notes
               FROM orders)
         ORDER BY o_orderkey""",

    "f16_ts_format" ->
      """SELECT o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dt_str
         FROM orders ORDER BY o_orderkey""",

    "p1_required_fields" ->
      """SELECT p_partkey, name_maybe
         FROM (SELECT p_partkey, p_brand,
                      CASE WHEN p_partkey % 17 = 0 THEN '' ELSE p_name END AS name_maybe
               FROM part)
         WHERE NOT (name_maybe IS NULL OR name_maybe = ''
                    OR p_brand IS NULL OR p_brand = '')
         ORDER BY p_partkey""",

    "p2_domain_membership" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
         WHERE o_orderstatus IN ('F','O')
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
