package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F3-F8: `build_game_data` (game_upsert.py:59-81) as one projection.
  *
  * Semantics preserved exactly:
  *   - missing string headers default to "" (not NULL) — the reference's
  *     empty-string convention (SURVEY.md §1.2);
  *   - `id_game` = last path segment of the site URL (game_upsert.py:61);
  *   - dates parse 'yyyy.MM.dd' null-on-error; time parses 'HH:mm:ss' to
  *     a canonical string; elos int-cast null-on-error;
  *   - rows with no site header are dropped (P7,
  *     get_games_from_tv.py:208-209);
  *   - `tm_ingested` is injectable for deterministic tests (the
  *     reference stamps datetime.utcnow() per row, game_upsert.py:80).
  */
object Normalize {

  private def h(key: String): Column = col("headers").getItem(key)
  private def hs(key: String): Column = coalesce(h(key), lit(""))

  /** @param keepCols extra input columns carried through unchanged —
    *   typically a per-row delivery sequence so the downstream
    *   last-write-wins merge has a total order (see Upsert). */
  def buildGameData(raw: DataFrame,
      ingestedAt: Column = current_timestamp(),
      keepCols: Seq[String] = Nil): DataFrame =
    raw
      .filter(h("site").isNotNull && h("site") =!= "")   // P7 falsy-key guard
      .select(keepCols.map(col) ++ Seq(
        element_at(split(h("site"), "/"), -1).as("id_game"),
        hs("event").as("val_event_name"),
        hs("site").as("val_site_url"),
        try_to_date(h("date"), "yyyy.MM.dd").as("dt_game"),
        hs("white").as("id_user_white"),
        hs("black").as("id_user_black"),
        hs("result").as("val_result"),
        try_to_date(h("utcdate"), "yyyy.MM.dd").as("dt_game_utc"),
        date_format(try_to_timestamp(h("utctime"), lit("HH:mm:ss")),
          "HH:mm:ss").as("tm_game_utc"),
        expr("try_cast(headers['whiteelo'] AS INT)").as("val_elo_white"),
        expr("try_cast(headers['blackelo'] AS INT)").as("val_elo_black"),
        hs("whitetitle").as("val_title_white"),
        hs("blacktitle").as("val_title_black"),
        hs("variant").as("val_variant"),
        hs("timecontrol").as("val_time_control"),
        hs("eco").as("val_opening_eco_code"),
        hs("termination").as("val_termination"),
        coalesce(col("moves"), lit("")).as("val_moves_pgn"),
        hs("opening").as("val_opening_name"),
        ingestedAt.as("tm_ingested"),
        lit(null).cast("timestamp").as("tm_validated"),
        lit(false).as("ind_validated"),
        lit(null).cast("string").as("val_validation_notes"),
        lit(false).as("ind_profile_updated")): _*)
}
