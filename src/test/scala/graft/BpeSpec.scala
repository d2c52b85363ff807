package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** The pinned-merge BPE tokenizer: merge-table consistency invariants
  * (what the sequential-apply equivalence argument needs), equivalence
  * against a reference implementation of the CLASSIC BPE apply loop
  * (min-rank adjacent pair, merged leftmost-non-overlapping, repeat),
  * the detokenize∘tokenize identity, and hand-computed examples. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --- reference: the classic BPE apply loop ------------------------
  private val rank: Map[(String, String), Int] =
    Bpe.Merges.zipWithIndex.toMap

  private def classic(text: String): Vector[String] = {
    var toks = text.toLowerCase.replace(Bpe.Sep, "")
      .map(_.toString).toVector
    var done = toks.size < 2
    while (!done) {
      val best = toks.zip(toks.tail).flatMap(rank.get).sorted.headOption
      best match {
        case None => done = true
        case Some(r) =>
          val (x, y) = Bpe.Merges(r)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.size) {
            if (i + 1 < toks.size && toks(i) == x && toks(i + 1) == y) {
              out += (x + y); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
          done = toks.size < 2
      }
    }
    toks.filter(t => t.nonEmpty && t != " ")
  }

  private def engine(texts: Seq[String]): Seq[Vector[String]] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select($"i", Bpe.tokens($"t").as("toks"))
      .orderBy("i")
      .collect()
      .map(_.getSeq[String](1).toVector).toSeq

  test("merge table is consistent: unique products born of earlier symbols") {
    val products = Bpe.Merges.map { case (x, y) => x + y }
    assert(products.distinct.size === products.size, "duplicate product")
    Bpe.Merges.zipWithIndex.foreach { case ((x, y), i) =>
      val earlier = products.take(i).toSet
      Seq(x, y).foreach { op =>
        assert(op.length === 1 || earlier.contains(op),
          s"rank $i operand '$op' is neither a char nor an earlier product")
        assert(!op.contains(" ") && !op.contains(Bpe.Sep),
          s"rank $i operand '$op' contains a frame char")
      }
    }
  }

  test("hand-computed examples (greedy min-rank order, not longest match)") {
    val out = engine(Seq(
      "the", "nation", "ing", "thing", "that is it", "", "   ", "zzz"))
    assert(out(0) === Vector("the"))
    // o,n wins at rank 6 before t,i (12) and a,t (9) carve the rest
    assert(out(1) === Vector("n", "at", "i", "on"))
    // (i,n) at rank 3 beats (n,g) at 18 — so never "ing" from cold chars
    assert(out(2) === Vector("in", "g"))
    assert(out(3) === Vector("th", "in", "g"))
    assert(out(4) === Vector("that", "is", "it"))
    assert(out(5) === Vector.empty)
    assert(out(6) === Vector.empty)
    assert(out(7) === Vector("z", "z", "z")) // chars outside any merge
  }

  test("sequential replace chain ≡ classic BPE apply on random strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghilmnoprstuwy    " // spaces weighted in
    val cases = Seq("aaaa", "ababab", "thethethe", "inginging",
      "t h e", "xx  yy") ++
      (1 to 300).map { _ =>
        val n = rnd.nextInt(40)
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
    val got = engine(cases)
    cases.zip(got).foreach { case (s, g) =>
      assert(g === classic(s), s"input '$s'")
    }
  }

  test("sequential ≡ classic on real corpus text (sf0.001 documents)") {
    val texts = Tables.documents(spark, SparkEntry.TinySfDir)
      .select(coalesce($"text", lit("")))
      .limit(60).as[String].collect().toSeq
    val got = engine(texts)
    texts.zip(got).foreach { case (s, g) =>
      assert(g === classic(s), s"doc '${s.take(40)}…'")
    }
  }

  test("detokenize ∘ tokenize is the identity (modulo spaces and case)") {
    val texts = Seq("the nation of things", "a", "", "for each other",
      "communication comes first")
    val got = engine(texts)
    texts.zip(got).foreach { case (s, g) =>
      assert(g.mkString === s.toLowerCase.replace(" ", ""), s"input '$s'")
    }
  }

  test("whole-text tokenization equals per-word tokenization flattened") {
    val text = "the things that matter most"
    val whole = engine(Seq(text)).head
    val perWord = text.split(" +").toVector.flatMap(w => classic(w))
    assert(whole === perWord)
  }
}
