package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bm25

/** Pins BM25 against a hand-computed score and the ranking contract
  * (term coverage beats repetition; longer docs are length-penalized). */
class Bm25Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark window spark"),          // tf(spark)=2, len 3
    (2L, "spark window table join"),     // both terms, len 4
    (3L, "table join group order"),      // no query terms
    (4L, "window")                       // tf(window)=1, len 1
  ).toDF("doc_id", "text")

  test("score matches the closed-form BM25 for a one-term query") {
    val out = Bm25.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=4, avgdl=(3+4+4+1)/4=3.0, df(spark)=2
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    def w(tf: Long, len: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len / 3.0))
    assert(out.keySet === Set(1L, 2L))
    assert(math.abs(out(1L) - w(2, 3)) < 1e-12)
    assert(math.abs(out(2L) - w(1, 4)) < 1e-12)
  }

  test("covering both terms outranks repeating one at equal length") {
    val docs = Seq(
      (1L, "spark spark pad pad"),   // one term twice
      (2L, "spark window pad pad")   // both terms once
    ).toDF("doc_id", "text")
    val top = Bm25.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "window"), k = 2).collect()
    assert(top.head.getLong(0) === 2L)
    assert(top.head.getAs[Long]("n_terms_hit") === 2L)
  }

  test("rrfFuse: hand-computed fusion, overlap outranks single-list hits") {
    import graft.sim.Hybrid
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Hybrid.rrfFuse(a, b, "id", k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("rrf_score"))).toMap
    assert(math.abs(out(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(out(10L) - 1.0 / 61) < 1e-15)
    assert(math.abs(out(40L) - 1.0 / 62) < 1e-15)
    // the doc in BOTH lists wins despite rank 2 in one of them
    val top = Hybrid.rrfFuse(a, b, "id", k = 1).head().getLong(0)
    assert(top === 20L)
  }

  test("pinned twin: closed-form rational-odds score, no ln") {
    val out = Bm25.bm25PinnedTopK(corpus, "doc_id", "text", Seq("spark"),
      k = 10).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = (4 - 2 + 0.5) / (2 + 0.5)   // raw odds, NOT ln(1+·)
    def w(tf: Long, len: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len / 3.0))
    assert(out.keySet === Set(1L, 2L))
    assert(math.abs(out(1L) - w(2, 3)) < 1e-12)
    assert(math.abs(out(2L) - w(1, 4)) < 1e-12)
  }

  test("pinned twin ranks identically to production per term") {
    // x ↦ ln(1+x) is strictly monotone, so any SINGLE-term query must
    // produce the same ranking from both scorers — the twin's oracle
    // therefore hash-anchors production's tf/len/df plumbing end to end
    for (term <- Seq("spark", "window")) {
      val prod = Bm25.bm25TopK(corpus, "doc_id", "text", Seq(term), k = 10)
        .collect().map(_.getLong(0)).toSeq
      val pinned = Bm25.bm25PinnedTopK(corpus, "doc_id", "text",
        Seq(term), k = 10).collect().map(_.getLong(0)).toSeq
      assert(prod === pinned, s"ranking diverged for '$term'")
    }
  }

  test("registry entry returns k-bounded, score-ordered rows") {
    val out = SparkEntry.queries("text_bm25_topk")(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
