package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.BigramLm

/** Hand-computed pins for the bigram LM (`text_lm_*`): the add-one
  * conditionals, the BIGINT pinned score, the ln cross-entropy, the
  * unseen-context backoff, and empty-doc totality. Corpus:
  * doc1 "a b a", doc2 "b a" →
  *   counts: (<s>,a)=1 (a,b)=1 (b,a)=2 (<s>,b)=1
  *   totals: <s>=2 a=1 b=2 ; V = 2.
  */
class BigramLmSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "a b a"), (2L, "b a"), (3L, "")).toDF("doc_id", "text")
  private lazy val counts =
    BigramLm.trainCounts(docs, "doc_id", "text").cache()
  private lazy val totals = BigramLm.contextTotals(counts).cache()
  private lazy val v = BigramLm.vocabSize(docs, "text")

  test("trained counts and totals match the hand derivation") {
    val c = counts.as[(String, String, Long)].collect().toSet
    assert(c == Set(("<s>", "a", 1L), ("a", "b", 1L), ("b", "a", 2L),
      ("<s>", "b", 1L)))
    val t = totals.as[(String, Long)].collect().toSet
    assert(t == Set(("<s>", 2L), ("a", 1L), ("b", 2L)))
    assert(v == 2L)
  }

  test("pinned score: exact integer arithmetic, empty doc total") {
    val byId = BigramLm
      .pinnedScore(docs, "doc_id", "text", counts, totals, v)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2))))
      .toMap
    // doc1: ⌊2e9/4⌋ + ⌊2e9/3⌋ + ⌊3e9/4⌋
    assert(byId(1L) == ((3L, 500000000L + 666666666L + 750000000L)))
    // doc2: ⌊2e9/4⌋ + ⌊3e9/4⌋
    assert(byId(2L) == ((2L, 500000000L + 750000000L)))
    assert(byId(3L) == ((0L, 0L)))
    assert(byId.size == 3)
  }

  test("ln score matches the closed form; empty doc emits NULLs") {
    val rows = BigramLm.lnScore(docs, "doc_id", "text", counts, totals, v)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double]),
          Option(x.get(3)).map(_.asInstanceOf[Double]))).toMap
    val d1 = (math.log(0.5) + math.log(2.0 / 3.0) + math.log(0.75)) / 3
    val d2 = (math.log(0.5) + math.log(0.75)) / 2
    assert(rows(1L)._1 == 3L)
    assert(math.abs(rows(1L)._2.get - d1) < 1e-12)
    assert(math.abs(rows(1L)._3.get - math.exp(-d1)) < 1e-12)
    assert(math.abs(rows(2L)._2.get - d2) < 1e-12)
    assert(rows(3L) == ((0L, None, None)))
  }

  test("1-token doc yields exactly its one BOS bigram (no reversed " +
      "sequence crash) through train, pinned and ln paths") {
    val one = Seq((7L, "a"), (8L, "a b"), (9L, "")).toDF("doc_id", "text")
    val bg = BigramLm.bigrams(one, "doc_id", "text")
      .as[(Long, String, String)].collect().toSet
    assert(bg == Set((7L, "<s>", "a"), (8L, "<s>", "a"), (8L, "a", "b")))
    val c1 = BigramLm.trainCounts(one, "doc_id", "text")
    val t1 = BigramLm.contextTotals(c1)
    val v1 = BigramLm.vocabSize(one, "text")
    val pinned = BigramLm.pinnedScore(one, "doc_id", "text", c1, t1, v1)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    // doc7: one bigram (<s>,a): ⌊(2+1)·1e9 / (2+2)⌋ = 750000000
    assert(pinned(7L) == ((1L, 750000000L)))
    assert(pinned(9L) == ((0L, 0L)))
    val ln7 = BigramLm.lnScore(one, "doc_id", "text", c1, t1, v1)
      .filter(_.getLong(0) == 7L).collect().head
    assert(ln7.getLong(1) == 1L)
    assert(math.abs(ln7.getDouble(2) - math.log(0.75)) < 1e-12)
  }

  test("held-out scoring: unseen bigram and unseen context back off " +
      "to add-one over V") {
    val held = Seq((9L, "c a")).toDF("doc_id", "text")
    val r = BigramLm.lnScore(held, "doc_id", "text", counts, totals, v)
      .collect().head
    // (<s>,c): context <s> seen (C=2), bigram unseen → (0+1)/(2+2)
    // (c,a): context c unseen (C=0) → (0+1)/(0+2)
    val expected = (math.log(0.25) + math.log(0.5)) / 2
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - expected) < 1e-12)
  }
}
