package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.ReadApi

/** Oracle conformance for the read-side API surface
  * (reference/docs/CHANGELOG.md:50-55 — the Flask layer's "player
  * statistics, game history, and ratings", "most popular game
  * openings", "pagination and filtering") via [[graft.ops.ReadApi]].
  *
  * The games table is synthesized deterministically from `orders` so
  * players repeat (~70 games each), results mix all four outcomes, and
  * one opening slot is NULL — exercising every branch the API filters
  * on, while staying a one-to-one SQL mirror for DuckDB.
  */
object ApiQueries extends QueryModule {

  /** 211 players, keys from o_custkey; result/elo/opening keyed off
    * o_orderkey. All arithmetic is on positive ints → pmod ≡ %. */
  private def synthGames(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(s, d).select(
      concat(lit("g"), k).as("id_game"),
      concat(lit("u"), pmod(col("o_custkey"), lit(211))).as("id_user_white"),
      concat(lit("u"), pmod(col("o_custkey") * 7 + 13, lit(211))).as("id_user_black"),
      element_at(
        array(lit("1-0"), lit("0-1"), lit("1/2-1/2"), lit("*")),
        pmod(k, lit(4)).cast("int") + 1).as("val_result"),
      (pmod(k, lit(1500)) + 1000).cast("int").as("val_elo_white"),
      (pmod(k * 3, lit(1500)) + 1000).cast("int").as("val_elo_black"),
      col("o_orderdate").as("dt_game"),
      lit(true).as("ind_validated"),
      when(pmod(k, lit(6)) === 5, lit(null).cast("string"))
        .otherwise(element_at(
          array(lit("Sicilian"), lit("French"), lit("Caro-Kann"),
            lit("Ruy Lopez"), lit("Italian")),
          pmod(k, lit(6)).cast("int") + 1)).as("val_opening_name"))
  }

  private val synthCte =
    """WITH games AS (
         SELECT 'g' || o_orderkey AS id_game,
                'u' || (o_custkey % 211) AS id_user_white,
                'u' || ((o_custkey * 7 + 13) % 211) AS id_user_black,
                CASE o_orderkey % 4 WHEN 0 THEN '1-0' WHEN 1 THEN '0-1'
                     WHEN 2 THEN '1/2-1/2' ELSE '*' END AS val_result,
                CAST(o_orderkey % 1500 + 1000 AS INT) AS val_elo_white,
                CAST((o_orderkey * 3) % 1500 + 1000 AS INT) AS val_elo_black,
                o_orderdate AS dt_game,
                TRUE AS ind_validated,
                CASE o_orderkey % 6 WHEN 5 THEN NULL
                     WHEN 0 THEN 'Sicilian' WHEN 1 THEN 'French'
                     WHEN 2 THEN 'Caro-Kann' WHEN 3 THEN 'Ruy Lopez'
                     ELSE 'Italian' END AS val_opening_name
         FROM orders
       )"""

  private def apiPlayerStats(s: SparkSession, d: String): DataFrame =
    ReadApi.playerStats(synthGames(s, d)).orderBy("id_user")

  private def apiTopOpenings(s: SparkSession, d: String): DataFrame =
    ReadApi.topOpenings(synthGames(s, d), 3)

  private def apiGameHistory(s: SparkSession, d: String): DataFrame =
    ReadApi.gameHistory(synthGames(s, d), "u42", page = 0, pageSize = 20)
      .select("id_game", "id_user_white", "id_user_black", "val_result",
        "dt_game")
      .orderBy(desc("dt_game"), asc("id_game"))

  // Keyset pagination (the scale form of O2 — no global row numbering;
  // plans as TakeOrderedAndProject). Fixed literal cursor so the oracle
  // is an exact mirror.
  private def apiGameHistoryKeyset(s: SparkSession, d: String): DataFrame =
    ReadApi.gameHistoryAfter(synthGames(s, d), "u42",
      Some((java.sql.Date.valueOf("1998-06-01"), "g0")), pageSize = 20)
      .select("id_game", "id_user_white", "id_user_black", "val_result",
        "dt_game")
      .orderBy(desc("dt_game"), asc("id_game"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "api_player_stats" -> (apiPlayerStats _),
    "api_top_openings" -> (apiTopOpenings _),
    "api_game_history" -> (apiGameHistory _),
    "api_game_history_keyset" -> (apiGameHistoryKeyset _)
  )

  val oracles: Map[String, String] = Map(
    // Both color perspectives union'd, then one group-by — elo ints sum
    // exactly, the closing division is one IEEE op in both engines.
    "api_player_stats" -> (synthCte +
      """, persp AS (
           SELECT id_user_white AS id_user, val_result AS res,
                  'white' AS color, val_elo_black AS opp_elo FROM games
           UNION ALL
           SELECT id_user_black AS id_user, val_result AS res,
                  'black' AS color, val_elo_white AS opp_elo FROM games
         )
         SELECT id_user,
                count(*) AS n_games,
                CAST(count(CASE WHEN (color = 'white' AND res = '1-0')
                                  OR (color = 'black' AND res = '0-1')
                                THEN 1 END) AS BIGINT) AS n_wins,
                CAST(count(CASE WHEN (color = 'white' AND res = '0-1')
                                  OR (color = 'black' AND res = '1-0')
                                THEN 1 END) AS BIGINT) AS n_losses,
                CAST(count(CASE WHEN res = '1/2-1/2' THEN 1 END) AS BIGINT)
                  AS n_draws,
                CAST(sum(opp_elo) AS DOUBLE) / count(opp_elo)
                  AS avg_opponent_elo
         FROM persp
         WHERE id_user IS NOT NULL AND id_user <> ''
         GROUP BY id_user ORDER BY id_user"""),

    "api_top_openings" -> (synthCte +
      """
         SELECT val_opening_name, count(*) AS n_games
         FROM games
         WHERE ind_validated AND val_opening_name IS NOT NULL
           AND val_opening_name <> ''
         GROUP BY val_opening_name
         ORDER BY n_games DESC, val_opening_name
         LIMIT 3"""),

    "api_game_history_keyset" -> (synthCte +
      """
         SELECT id_game, id_user_white, id_user_black, val_result, dt_game
         FROM games
         WHERE (id_user_white = 'u42' OR id_user_black = 'u42')
           AND (dt_game < DATE '1998-06-01'
                OR (dt_game = DATE '1998-06-01' AND id_game > 'g0'))
         ORDER BY dt_game DESC, id_game
         LIMIT 20"""),

    "api_game_history" -> (synthCte +
      """
         SELECT id_game, id_user_white, id_user_black, val_result, dt_game
         FROM (SELECT *, row_number() OVER
                 (ORDER BY dt_game DESC, id_game) AS rn
               FROM games
               WHERE id_user_white = 'u42' OR id_user_black = 'u42')
         WHERE rn > 0 AND rn <= 20
         ORDER BY dt_game DESC, id_game""")
  )
}
