package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pgn.PgnParser

/** Property tests (SURVEY.md §5.3): PGN render→parse round-trips and
  * parser totality on adversarial input. */
class PgnPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val tagKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)
  // values: anything printable without '"' or newline (PGN quoting)
  private val tagValue: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '-', '/', '?', '!')))
      .map(_.mkString.trim)
  private val movesLine: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("1.", "e4", "e5", "Nf3", "Nc6", "1-0"))
      .map(_.mkString(" "))

  private val gameGen: Gen[(Map[String, String], String)] = for {
    n <- Gen.choose(1, 8)
    keys <- Gen.listOfN(n, tagKey)
    vals <- Gen.listOfN(n, tagValue)
    mv <- movesLine
  } yield {
    // lowercased-last-wins, matching dict construction in the parser
    val m = keys.zip(vals).map { case (k, v) => k.toLowerCase -> v }.toMap
    (m, mv)
  }

  private def render(games: Seq[(Map[String, String], String)]): String =
    games.map { case (headers, moves) =>
      headers.map { case (k, v) => s"""[$k "$v"]""" }.mkString("\n") +
        "\n" + moves
    }.mkString("\n")

  test("render → splitBlocks round-trips headers and moves") {
    check(Prop.forAll(Gen.listOfN(3, gameGen)) { games =>
      val parsed = PgnParser.splitBlocks(render(games))
      parsed.length == games.length &&
        parsed.zip(games).forall { case (p, (h, mv)) =>
          p.headers == h && p.moves == mv.trim
        }
    })
  }

  test("splitBlocks is total on arbitrary text (never throws)") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      PgnParser.splitBlocks(s)
      true
    })
  }

  test("block count equals number of move lines") {
    check(Prop.forAll(Gen.listOfN(5, gameGen)) { games =>
      PgnParser.splitBlocks(render(games)).length == games.length
    })
  }
}
