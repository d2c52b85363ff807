package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{CountMin, TextAnalysis}

/** The deterministic count-min / Misra–Gries guarantees behind
  * `text_heavy_hitters` (rows-only registry entry; its exact twin is
  * hash-green): estimates never undercount, the flagged set never
  * loses a true heavy hitter, and the MG candidate union keeps every
  * frequent item under adversarial partitioning. */
class CountMinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val toks = Tables.documents(spark, sf0001)
    .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    .filter(length(col("token")) > 0)
    .cache()

  private lazy val exact: Map[String, Long] =
    toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap

  test("CMS estimate ≥ true count for EVERY token (one-sided error)") {
    val cells = CountMin.buildCells(toks, "token")
    val est = CountMin.estimate(toks.distinct(), "token", cells)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    val under = exact.filter { case (t, n) => est(t) < n }
    assert(under.isEmpty, s"undercounted: ${under.take(5)}")
    // and the summary stayed bounded: ≤ Depth·Width occupied cells
    assert(cells.count() <= CountMin.Depth.toLong * CountMin.Width)
  }

  test("every exact φ=1% heavy hitter survives the MG→CMS→threshold " +
      "pipeline (guaranteed superset)") {
    val n = exact.values.sum
    val trueHh = exact.filter { case (_, c) => c * 100 >= n }.keySet
    assert(trueHh.nonEmpty)   // fixture must exercise the claim
    val flagged = graft.queries.TokenOps
      .queries("text_heavy_hitters")(spark, sf0001)
      .select("token").as[String].collect().toSet
    assert(trueHh.subsetOf(flagged),
      s"lost hitters: ${(trueHh -- flagged).take(5)}")
  }

  test("Misra–Gries: items with local count ≥ N_p/k survive, under " +
      "forced repartitioning") {
    // k ≥ 1/φ with φ = 1%: any token at ≥ 1% globally must be kept
    val n = exact.values.sum
    val trueHh = exact.filter { case (_, c) => c * 100 >= n }.keySet
    for (parts <- Seq(1, 3, 13)) {
      val cand = CountMin.misraGriesCandidates(
          toks.repartition(parts), "token", k = 256)
        .as[String].collect().toSet
      assert(trueHh.subsetOf(cand),
        s"parts=$parts lost: ${(trueHh -- cand).take(5)}")
    }
  }

  test("sketch addition: cells of split streams merge to exactly the " +
      "one-shot sketch, in any association order") {
    val parts = (0 to 2).map(i =>
      CountMin.buildCells(
        toks.filter(pmod(xxhash64(col("token")), lit(3)) === i), "token"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Long)].collect().toSet
    val oneShot = cells(CountMin.buildCells(toks, "token"))
    val left = cells(CountMin.mergeCells(
      CountMin.mergeCells(parts(0), parts(1)), parts(2)))
    val right = cells(CountMin.mergeCells(
      parts(0), CountMin.mergeCells(parts(1), parts(2))))
    assert(left == oneShot)
    assert(right == oneShot)
  }

  test("estimate of an absent item is bounded by collisions, not " +
      "invented mass (empty-cell probe → 0 under no collision)") {
    // a probe set disjoint from the stream: estimates may collide into
    // real cells but can never exceed the total stream count
    val n = exact.values.sum
    val ghosts = Seq("⟂ghost1⟂", "⟂ghost2⟂", "⟂ghost3⟂").toDF("token")
    val cells = CountMin.buildCells(toks, "token")
    val est = CountMin.estimate(ghosts, "token", cells)
      .as[(String, Long)].collect().toMap
    assert(est.values.forall(v => v >= 0L && v <= n))
  }
}
