package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.ChessSchema

/** Enrichment passes (SURVEY.md §3.4): user-profile backfill
  * (backfill_user_profiles.py) and opening backfill
  * (backfill_opening_names.py), with the HTTP fetch as a pluggable seam
  * — the build environment is offline, matching how the reference's own
  * tests mock `requests` (test_get_games_from_tv.py:64-69). A live
  * deployment would implement the seam with `mapPartitions` + a
  * per-partition rate-limited HTTP client (S6/S7, T5).
  */
object Enrich {

  // ---- A4/U1: distinct user keys from the two player columns
  //      (backfill_user_profiles.py:136-141). explode → filter → distinct:
  //      one shuffle, no double scan.
  def distinctUsers(games: DataFrame, forceRevalidate: Boolean = true): DataFrame = {
    val base = if (forceRevalidate) games
      else games.filter(!col("ind_profile_updated"))   // P6 gate :137-138
    base
      .select(explode(array(col("id_user_white"), col("id_user_black")))
        .as("id_user"))
      .filter(col("id_user").isNotNull && col("id_user") =!= "")  // P7
      .distinct()
  }

  /** `_clean_value` (backfill_user_profiles.py:156-166) — the typed
    * sentinel cleaner (F13). */
  private val sentinels = Seq("<null>", "null", "none", "")
  private def cleanStr(c: Column): Column =
    when(c.isNull || lower(trim(c)).isin(sentinels: _*), lit(null))
      .otherwise(trim(c))
  private def cleanBool(c: Column): Column =
    when(c.isNull || lower(trim(c)).isin(sentinels: _*), lit(null))
      .otherwise(lower(trim(c)).isin("true", "1"))

  /** S6/S7: the per-key lookup source — `mapPartitions` with one
    * client + rate limiter per partition (connection reuse ≈ the
    * reference's requests.Session, backfill_user_profiles.py:123-129;
    * throttle ≈ TIME_PER_USER). `mkClient` runs ONCE per partition on
    * the executor (HTTP session setup); `fetch` runs per key under the
    * limiter, None on any error after retries (S6's error contract).
    * Output: (id_user, json) for successful lookups.
    */
  def lookupPartitioned(keys: DataFrame,
      mkClient: () => String => Option[String],
      ratePerSec: Double = 0.0): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col("id_user")).as[String].mapPartitions { it =>
      val fetch = mkClient()
      val limiter = if (ratePerSec > 0)
        Some(new graft.streaming.SourceGuard.RateLimiter(ratePerSec))
      else None
      it.flatMap { key =>
        limiter.foreach(_.acquire())
        graft.streaming.SourceGuard.retry(attempts = 3, pauseMillis = 0) {
          fetch(key)
        }.flatten.map(json => (key, json))
      }
    }.toDF("id_user", "json")
  }

  /** F14: flatten profile JSON bodies (id_user, json) → lichess_users
    * rows (backfill_user_profiles.py:178-214). Rows with no `id` in the
    * body are dropped (P7 guard :240-241).
    */
  def flattenProfiles(bodies: DataFrame): DataFrame = {
    val j = from_json(col("json"), ChessSchema.profileJson)
    bodies
      .select(j.as("j"))
      .filter(col("j.id").isNotNull && col("j.id") =!= "")
      .select(
        col("j.id").as("id_user"),
        col("j.username").as("val_username"),
        cleanStr(col("j.profile.title")).as("val_title"),
        cleanStr(col("j.profile.url")).as("val_url"),
        cleanStr(col("j.profile.realName")).as("val_real_name"),
        cleanStr(col("j.profile.location")).as("val_location"),
        cleanStr(col("j.profile.bio")).as("val_bio"),
        expr("try_cast(j.profile.fideRating AS INT)").as("val_rating_fide"),
        expr("try_cast(j.profile.uscfRating AS INT)").as("val_rating_uscf"),
        expr("try_cast(j.perfs.bullet.rating AS INT)").as("val_rating_bullet"),
        expr("try_cast(j.perfs.blitz.rating AS INT)").as("val_rating_blitz"),
        expr("try_cast(j.perfs.classical.rating AS INT)").as("val_rating_classical"),
        expr("try_cast(j.perfs.rapid.rating AS INT)").as("val_rating_rapid"),
        expr("try_cast(j.perfs.chess960.rating AS INT)").as("val_rating_chess960"),
        expr("try_cast(j.perfs.ultraBullet.rating AS INT)").as("val_rating_ultra_bullet"),
        cleanStr(col("j.profile.flag")).as("val_country_code"),
        col("j.createdAt").as("tm_created"),
        col("j.seenAt").as("tm_seen"),
        expr("try_cast(j.playTime.total AS INT)").as("n_playtime_total"),
        expr("try_cast(j.playTime.tv AS INT)").as("n_playtime_tv"),
        expr("try_cast(j.count.all AS INT)").as("n_games_all"),
        expr("try_cast(j.count.rated AS INT)").as("n_games_rated"),
        expr("try_cast(j.count.win AS INT)").as("n_games_win"),
        expr("try_cast(j.count.loss AS INT)").as("n_games_loss"),
        expr("try_cast(j.count.draw AS INT)").as("n_games_draw"),
        cleanBool(col("j.patron")).as("ind_patron"),
        cleanBool(col("j.streaming")).as("ind_streaming"))
  }

  /** J2: disjunctive-key flag update (`_mark_profile_done`,
    * backfill_user_profiles.py:223-235) — `ind_profile_updated = true`
    * where white OR black is a profiled user. The OR predicate is
    * decomposed: explode the two key columns, equi-semi-join against the
    * done set, then flag matched game ids. No nested loop; two shuffles.
    */
  def markProfileDone(games: DataFrame, doneUsers: DataFrame): DataFrame = {
    val done = doneUsers.select(col("id_user"))
    val matched = games
      .select(col("id_game"),
        explode(array(col("id_user_white"), col("id_user_black"))).as("u"))
      .join(done, col("u") === done("id_user"), "left_semi")
      .select("id_game").distinct()
      .withColumn("__flag", lit(true))
    games.join(matched, Seq("id_game"), "left")
      .withColumn("ind_profile_updated",
        coalesce(col("__flag"), col("ind_profile_updated")))
      .drop("__flag")
  }

  // ---- Opening backfill (backfill_opening_names.py) ----

  /** P5: the 6-way unenriched filter (:88-106). */
  def unenrichedGames(games: DataFrame): DataFrame =
    games.filter(
      col("val_opening_name").isNull || col("val_opening_name") === "?" ||
      col("val_opening_eco_code").isNull || col("val_opening_eco_code") === "?" ||
      col("val_elo_white").isNull || col("val_elo_black").isNull)
      .select("id_game")

  /** F9: tag scrape from exported PGN text (:118-129) — 4 regexp
    * extracts; empty match → NULL. Input (id_game, pgn_text). */
  def scrapeTags(exports: DataFrame): DataFrame = {
    def tag(name: String) = {
      val e = regexp_extract(col("pgn_text"), s"""\\[$name "([^"]*)"\\]""", 1)
      when(e === "", lit(null)).otherwise(e)
    }
    exports.select(
      col("id_game"),
      tag("ECO").as("eco"),
      tag("Opening").as("opening"),
      expr("""try_cast(regexp_extract(pgn_text, '\\[WhiteElo "([^"]*)"\\]', 1) AS INT)""").as("elo_white"),
      expr("""try_cast(regexp_extract(pgn_text, '\\[BlackElo "([^"]*)"\\]', 1) AS INT)""").as("elo_black"))
  }

  /** S8 conditional rewrite: apply scraped values only when BOTH eco
    * and name are present (:151-152, :171-173) — and then ALL four
    * scraped columns overwrite (the reference upserts the whole
    * game_data dict, `_update_opening_info` :139-155, so a NULL scraped
    * elo overwrites too).
    */
  def applyOpeningBackfill(games: DataFrame, scraped: DataFrame): DataFrame = {
    val sc = scraped
      .withColumnRenamed("id_game", "s_id_game")
    val joined = games.join(broadcast(sc),
      games("id_game") === sc("s_id_game"), "left")
    val hasBoth = col("eco").isNotNull && col("opening").isNotNull
    joined
      .withColumn("val_opening_eco_code",
        when(hasBoth, col("eco")).otherwise(col("val_opening_eco_code")))
      .withColumn("val_opening_name",
        when(hasBoth, col("opening")).otherwise(col("val_opening_name")))
      .withColumn("val_elo_white",
        when(hasBoth, col("elo_white")).otherwise(col("val_elo_white")))
      .withColumn("val_elo_black",
        when(hasBoth, col("elo_black")).otherwise(col("val_elo_black")))
      .drop("s_id_game", "eco", "opening", "elo_white", "elo_black")
  }
}
