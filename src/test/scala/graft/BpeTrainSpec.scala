package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.BpeTrain

/** BPE merge-table training: hand-checked induction on tiny corpora —
  * the argmax tie-break, the greedy overlap rule, and early exhaustion
  * when no adjacent pairs remain. */
class BpeTrainSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def train(texts: Seq[String], n: Int) =
    BpeTrain.trainMerges(texts.toDF("text"), "text", n)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  test("hand corpus: ranks, tie-breaks, and early stop") {
    // histogram: the×2, cat×1. Rank 0 ties (t,h)=2 vs (h,e)=2 —
    // l-asc tie-break picks (h,e); then (t,he)=2; then the 1-count
    // ties (a,t) < (c,a+) resolve by l asc; rank 4 finds no pairs.
    val out = train(Seq("the cat", "the"), 8)
    assert(out === Seq(
      (0, "h", "e", "he", 2L),
      (1, "t", "he", "the", 2L),
      (2, "a", "t", "at", 1L),
      (3, "c", "at", "cat", 1L)))
  }

  test("greedy left-to-right overlap: aaa yields [aa, a]") {
    // pairs of a a a = (a,a)×2; after the merge the word is [aa, a],
    // so rank 1 sees (aa, a)×1 — the classic application order, not
    // the all-occurrences string replace
    val out = train(Seq("aaa"), 8)
    assert(out === Seq(
      (0, "a", "a", "aa", 2L),
      (1, "aa", "a", "aaa", 1L)))
  }

  test("counts weight by word frequency, case-folded") {
    // "AB" and "ab" are the same histogram entry (×3); "xy" ×1
    val out = train(Seq("AB ab xy", "ab"), 2)
    assert(out === Seq(
      (0, "a", "b", "ab", 3L),
      (1, "x", "y", "xy", 1L)))
  }

  test("nulls and empty text contribute nothing") {
    val out = BpeTrain.trainMerges(
      Seq(Some("aa"), None, Some("")).toDF("text"), "text", 8)
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(3) === "aa")
  }
}
