package graft.schema

import org.apache.spark.sql.types._

/** Canonical schemas for the chess domain — the single source of truth
  * the reference kept in three hand-synced copies (SQL DDL
  * `schemas/init/2025-05-01__tv_channel_games.sql:3-28`, SQLAlchemy
  * mirrors `get_games_from_tv.py:80-103`, and the prose dictionary).
  *
  * Type decisions (SURVEY.md §1.2):
  *   - Postgres TIME (`tm_game_utc`) has no stable Spark type → canonical
  *     `HH:mm:ss` string.
  *   - Lichess epoch millis (`tm_created`/`tm_seen`) stay LongType as the
  *     reference stores them raw (backfill_user_profiles.py:203-204).
  *   - All casts are null-on-error (`try_cast`), matching `_parse_int` /
  *     `_parse_date` / `_parse_time` (game_upsert.py:21-51).
  */
object ChessSchema {

  /** tv_channel_games — one row per ingested game
    * (tv_channel_games.sql:3-28). */
  val tvChannelGames: StructType = StructType(Seq(
    StructField("id_game", StringType, nullable = false),
    StructField("val_event_name", StringType),
    StructField("val_site_url", StringType),
    StructField("dt_game", DateType),
    StructField("id_user_white", StringType),
    StructField("id_user_black", StringType),
    StructField("val_result", StringType),
    StructField("dt_game_utc", DateType),
    StructField("tm_game_utc", StringType),          // canonical HH:mm:ss
    StructField("val_elo_white", IntegerType),
    StructField("val_elo_black", IntegerType),
    StructField("val_title_white", StringType),
    StructField("val_title_black", StringType),
    StructField("val_variant", StringType),
    StructField("val_time_control", StringType),
    StructField("val_opening_eco_code", StringType),
    StructField("val_termination", StringType),
    StructField("val_moves_pgn", StringType),
    StructField("val_opening_name", StringType),
    StructField("tm_ingested", TimestampType),
    StructField("tm_validated", TimestampType),
    StructField("ind_validated", BooleanType),
    StructField("val_validation_notes", StringType),
    StructField("ind_profile_updated", BooleanType)
  ))

  /** lichess_users — one row per player profile
    * (lichess_users.sql:2-30). */
  val lichessUsers: StructType = StructType(Seq(
    StructField("id_user", StringType, nullable = false),
    StructField("val_username", StringType),
    StructField("val_title", StringType),
    StructField("val_url", StringType),
    StructField("val_real_name", StringType),
    StructField("val_location", StringType),
    StructField("val_bio", StringType),
    StructField("val_rating_fide", IntegerType),
    StructField("val_rating_uscf", IntegerType),
    StructField("val_rating_bullet", IntegerType),
    StructField("val_rating_blitz", IntegerType),
    StructField("val_rating_classical", IntegerType),
    StructField("val_rating_rapid", IntegerType),
    StructField("val_rating_chess960", IntegerType),
    StructField("val_rating_ultra_bullet", IntegerType),
    StructField("val_country_code", StringType),
    StructField("tm_created", LongType),
    StructField("tm_seen", LongType),
    StructField("n_playtime_total", IntegerType),
    StructField("n_playtime_tv", IntegerType),
    StructField("n_games_all", IntegerType),
    StructField("n_games_rated", IntegerType),
    StructField("n_games_win", IntegerType),
    StructField("n_games_loss", IntegerType),
    StructField("n_games_draw", IntegerType),
    StructField("ind_patron", BooleanType),
    StructField("ind_streaming", BooleanType)
  ))

  /** Nested shape of the Lichess user-profile JSON consumed at
    * backfill_user_profiles.py:178-214 (fixture: FIXTURES.md A3). All
    * leaves are read as strings so the sentinel cleaner (`_clean_value`)
    * owns the typing, exactly like the reference. */
  val profileJson: StructType = {
    def rating = StructType(Seq(StructField("rating", StringType)))
    StructType(Seq(
      StructField("id", StringType),
      StructField("username", StringType),
      StructField("patron", StringType),
      StructField("streaming", StringType),
      StructField("createdAt", LongType),
      StructField("seenAt", LongType),
      StructField("profile", StructType(Seq(
        StructField("title", StringType),
        StructField("url", StringType),
        StructField("realName", StringType),
        StructField("location", StringType),
        StructField("bio", StringType),
        StructField("fideRating", StringType),
        StructField("uscfRating", StringType),
        StructField("flag", StringType)
      ))),
      StructField("perfs", StructType(Seq(
        StructField("bullet", rating),
        StructField("blitz", rating),
        StructField("classical", rating),
        StructField("rapid", rating),
        StructField("chess960", rating),
        StructField("ultraBullet", rating)
      ))),
      StructField("playTime", StructType(Seq(
        StructField("total", StringType),
        StructField("tv", StringType)
      ))),
      StructField("count", StructType(Seq(
        StructField("all", StringType),
        StructField("rated", StringType),
        StructField("win", StringType),
        StructField("loss", StringType),
        StructField("draw", StringType)
      )))
    ))
  }
}
