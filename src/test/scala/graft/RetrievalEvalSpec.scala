package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.RetrievalEval

/** Hand-computed pins for the retrieval-eval metrics (`eval_*`):
  * recall@k, exact-rational MRR numerators, pinned-weight nDCG —
  * including the no-relevant-retrieved and perfect-ranking edges. */
class RetrievalEvalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val W = RetrievalEval.DcgWeights

  // q1: relevant 11 (rel 2, ranked #2), 13 (rel 1, ranked #4), 99
  //     (rel 1, not retrieved)
  // q2: relevant 50 only — never retrieved
  // q3: perfectly ranked by grade
  private lazy val ranking = Seq(
    (1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L), (1L, 4, 13L),
    (2L, 1, 60L), (2L, 2, 61L),
    (3L, 1, 70L), (3L, 2, 71L))
    .toDF("query_id", "rank", "cand_id")
  private lazy val qrels = Seq(
    (1L, 11L, 2), (1L, 13L, 1), (1L, 99L, 1),
    (2L, 50L, 1),
    (3L, 70L, 2), (3L, 71L, 1))
    .toDF("query_id", "cand_id", "rel")

  test("pinned DCG weight table: w(1) = 1e9, strictly decreasing") {
    assert(W.head == 1000000000L)
    assert(W.sliding(2).forall { case Seq(a, b) => a > b })
    assert(W.length == RetrievalEval.MaxK)
  }

  test("recall@3: hits over relevant, zero-hit query included") {
    val r = RetrievalEval.recallAtK(ranking, qrels, 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((1L, 3L, 1.0 / 3.0)))
    assert(r(2L) == ((0L, 1L, 0.0)))
    assert(r(3L) == ((2L, 2L, 1.0)))
  }

  test("mrr: exact rational numerators; 0 when nothing relevant " +
      "retrieved") {
    val m = RetrievalEval.mrr(ranking, qrels, 4)
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)).map(_.asInstanceOf[Int]), x.getLong(2)))
      .toMap
    assert(m(1L) == ((Some(2), RetrievalEval.RankLcm / 2)))
    assert(m(2L) == ((None, 0L)))
    assert(m(3L) == ((Some(1), RetrievalEval.RankLcm)))
  }

  test("ndcg: graded pinned-weight sums; perfect ranking scores " +
      "exactly 1.0; unretrieved query scores 0") {
    val n = RetrievalEval.ndcgAtK(ranking, qrels, 4)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    val dcg1 = 3 * W(1) + 1 * W(3)          // rel2@rank2 + rel1@rank4
    val idcg1 = 3 * W(0) + 1 * W(1) + 1 * W(2)
    assert(n(1L) == ((dcg1, idcg1, dcg1.toDouble / idcg1.toDouble)))
    assert(n(2L)._1 == 0L && n(2L)._3 == 0.0)
    val d3 = 3 * W(0) + 1 * W(1)
    assert(n(3L) == ((d3, d3, 1.0)))
  }
}
