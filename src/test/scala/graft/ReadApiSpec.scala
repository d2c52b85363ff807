package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ReadApi

/** Read-side API surface tests (the reference's Flask capabilities). */
class ReadApiSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def games = Seq(
    ("g1", "alice", "bob", "1-0", "Sicilian", java.sql.Date.valueOf("2025-01-03"), Some(2000), Some(1900), true),
    ("g2", "bob", "alice", "1-0", "Sicilian", java.sql.Date.valueOf("2025-01-02"), Some(1900), Some(2000), true),
    ("g3", "alice", "carol", "1/2-1/2", "French", java.sql.Date.valueOf("2025-01-01"), Some(2000), Some(1800), true),
    ("g4", "dave", "alice", "0-1", "Caro-Kann", java.sql.Date.valueOf("2025-01-04"), Some(1700), Some(2000), false))
    .toDF("id_game", "id_user_white", "id_user_black", "val_result",
      "val_opening_name", "dt_game", "val_elo_white", "val_elo_black",
      "ind_validated")

  test("playerStats: per-user W/D/L from both colors") {
    val stats = ReadApi.playerStats(games).orderBy("id_user").collect()
      .map(r => r.getAs[String]("id_user") ->
        (r.getAs[Long]("n_games"), r.getAs[Long]("n_wins"),
         r.getAs[Long]("n_draws"))).toMap
    assert(stats("alice") == (4L, 2L, 1L))   // g1 W-win, g2 B-loss, g3 draw, g4 B-win
    assert(stats("bob") == (2L, 1L, 0L))
    assert(stats("carol") == (1L, 0L, 1L))
  }

  test("gameHistory: paged, newest first, either color") {
    val p0 = ReadApi.gameHistory(games, "alice", 0, 2)
      .select("id_game").as[String].collect().toSeq
    val p1 = ReadApi.gameHistory(games, "alice", 1, 2)
      .select("id_game").as[String].collect().toSeq
    assert(p0 == Seq("g4", "g1"))
    assert(p1 == Seq("g2", "g3"))
  }

  test("gameHistoryAfter: keyset pages tile exactly like offset pages") {
    // chain keyset pages over the alice fixture and compare with the
    // offset pagination of the same order
    val all = ReadApi.gameHistory(games, "alice", 0, 100)
      .select("id_game", "dt_game")
      .as[(String, java.sql.Date)].collect().toSeq
    assert(all.size == 4)
    val page1 = ReadApi.gameHistoryAfter(games, "alice", None, 2)
      .select("id_game", "dt_game")
      .as[(String, java.sql.Date)].collect().toSeq
    val cursor = Some((page1.last._2, page1.last._1))
    val page2 = ReadApi.gameHistoryAfter(games, "alice", cursor, 2)
      .select("id_game", "dt_game")
      .as[(String, java.sql.Date)].collect().toSeq
    assert(page1 ++ page2 == all)
    // a cursor at the very end yields an empty page, not an error
    val end = Some((page2.last._2, page2.last._1))
    assert(ReadApi.gameHistoryAfter(games, "alice", end, 2).count() == 0)
  }

  test("gameHistoryAfter: null game dates stay reachable and page last") {
    val withNulls = Seq(
      ("gA", "dana", "x", "1-0", java.sql.Date.valueOf("2025-05-02")),
      ("gB", "dana", "x", "0-1", null.asInstanceOf[java.sql.Date]),
      ("gC", "dana", "x", "1-0", java.sql.Date.valueOf("2025-05-01")),
      ("gD", "dana", "x", "0-1", null.asInstanceOf[java.sql.Date]))
      .toDF("id_game", "id_user_white", "id_user_black", "val_result",
        "dt_game")
    def page(cur: Option[(java.sql.Date, String)]) =
      ReadApi.gameHistoryAfter(withNulls, "dana", cur, 2)
        .select("id_game").as[String].collect().toSeq
    val p1 = page(None)
    assert(p1 == Seq("gA", "gC"))
    // cursor at the last dated row: the null-date tail must follow
    val p2 = page(Some((java.sql.Date.valueOf("2025-05-01"), "gC")))
    assert(p2 == Seq("gB", "gD"))
    // null-date cursor pages within the tail and terminates
    assert(page(Some((null, "gB"))) == Seq("gD"))
    assert(page(Some((null, "gD"))).isEmpty)
  }

  test("topOpenings: validated games only, count desc") {
    val top = ReadApi.topOpenings(games, 2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("Sicilian", 2L), ("French", 1L)))
  }

  test("gamesWithProfiles: both sides joined, missing profiles null") {
    val users = Seq(("alice", 2700), ("bob", 2650))
      .toDF("id_user", "val_rating_bullet")
    val joined = ReadApi.gamesWithProfiles(games, users)
    assert(joined.count() == 4)
    val g3 = joined.filter(col("id_game") === "g3").head()
    assert(g3.getAs[Int]("w_val_rating_bullet") == 2700)
    assert(g3.isNullAt(g3.fieldIndex("b_val_rating_bullet")))  // carol: none
  }
}
