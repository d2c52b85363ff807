package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sampling.Sampling
import graft.sim.Quantize
import graft.text.{Packing, SegmentDedup, TextAnalysis}

/** Semantic checks for the round-4 training-prep tier (beyond the
  * DuckDB hash conformance): segment-dedup keep rules, quantizer
  * exactness and tile invariance, packing conservation, temperature
  * rates, normalization idempotence, tf-idf ordering. */
class TrainPrepSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --- SegmentDedup -------------------------------------------------

  test("dedupSegments: exact copy loses everything, first doc keeps all") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),        // 2 segments of 8 -> [8w][2w]
      (2L, "a b c d e f g h i j"),        // exact copy: all dropped
      (3L, "x y z a b c d e f g h i j")   // different 8-grams: kept
    ).toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(df, "doc_id", "text", 8)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int, Int)].collect()
    assert(out(0) == ((1L, "a b c d e f g h i j", 2, 2, 0)))
    assert(out(1) == ((2L, "", 2, 0, 2)))
    // doc 3's windows differ from doc 1's, so both survive intact
    assert(out(2) == ((3L, "x y z a b c d e f g h i j", 2, 2, 0)))
  }

  test("dedupSegments: within-doc repeats drop; reassembly preserves order") {
    // segWords=2 -> segments: [p q][p q][r s] — the second [p q] drops
    val df = Seq((7L, "p q p q r s")).toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(df, "doc_id", "text", 2)
      .as[(Long, String, Int, Int, Int)].head()
    assert(out == ((7L, "p q r s", 3, 2, 1)))
  }

  test("dedupSegments: hash-keyed production path ≡ text-keyed output") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val byText = SegmentDedup.dedupSegments(docs, "doc_id", "text", 8)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int, Int)].collect()
    val byHash = SegmentDedup
      .dedupSegments(docs, "doc_id", "text", 8, hashKeys = true)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int, Int)].collect()
    assert(byText.sameElements(byHash))
  }

  test("segments: empty text yields no segments") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(SegmentDedup.segments(df, "doc_id", "text", 4).count() == 0)
  }

  test("dedupSegments property: on an all-unique corpus the pass is identity") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // docs of random word counts (including non-multiples of segWords);
    // per-doc distinct vocabularies => no segment can repeat anywhere,
    // so every segment survives and reassembly must reproduce the
    // whitespace-normalized text exactly
    val gen = Gen.choose(1, 40)
    val prop = Prop.forAll(Gen.listOfN(6, gen), Gen.choose(1, 9)) {
      (lens: List[Int], segWords: Int) =>
        val rows = lens.zipWithIndex.map { case (n, i) =>
          (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
        }
        val out = SegmentDedup
          .dedupSegments(rows.toDF("doc_id", "text"), "doc_id", "text",
            segWords)
          .orderBy("doc_id")
          .as[(Long, String, Int, Int, Int)].collect()
        out.length == rows.length && out.zip(rows).forall {
          case ((id, clean, nSeg, nKept, nDrop), (rid, text)) =>
            id == rid && clean == text && nKept == nSeg && nDrop == 0 &&
              nSeg == math.ceil(text.split(" ").length / segWords.toDouble).toInt
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  // --- Quantize -----------------------------------------------------

  test("q8Codes: clamp and floor semantics, scale must be a power of two") {
    val df = Seq((1L, Array(0.5f, -0.5f, 3.0f, -3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val codes = df.select(Quantize.q8Codes(col("embedding"), 64))
      .as[Seq[Byte]].head()
    assert(codes == Seq[Byte](32, -32, 127, -128, 0))
    intercept[IllegalArgumentException](Quantize.q8Codes(col("embedding"), 48))
  }

  test("quantize: n_clipped counts saturated dims") {
    val df = Seq((1L, Array(3.0f, -3.0f, 0.1f))).toDF("vec_id", "embedding")
    val n = Quantize.quantize(df).select("n_clipped").as[Int].head()
    assert(n == 2)
  }

  test("q8TopK: tile count does not change results; agrees with direct recompute") {
    val emb = Tables.embeddings(spark, sf0001)
    val pred = col("vec_id") % 50 === 0
    val t1 = Quantize.q8TopK(emb, pred, k = 5, numTiles = 1)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect()
    val t3 = Quantize.q8TopK(emb, pred, k = 5, numTiles = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect()
    assert(t1.sameElements(t3))
    // direct recompute of one query's ranking on the driver
    val all = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    def code(x: Float): Long =
      math.max(-128L, math.min(127L, math.floor(x.toDouble * 64).toLong))
    val q = all.find(_._1 == t1.head._1).get
    val qc = q._2.map(code)
    val expect = all.filter(_._1 != q._1)
      .map { case (id, v) =>
        (id, v.map(code).zip(qc).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, d) => (-d, id) }.take(5)
    val got = t1.filter(_._1 == q._1).map(r => (r._3, r._4))
    assert(got.toSeq == expect.toSeq)
  }

  test("q8Rerank: exact-cosine re-ranking of the quantized candidate pool") {
    val emb = Tables.embeddings(spark, sf0001)
    val pred = col("vec_id") % 50 === 0
    val out = Quantize.q8Rerank(emb, pred, k = 5, m = 20)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect()
    val all = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    def code(x: Float): Long =
      math.max(-128L, math.min(127L, math.floor(x.toDouble * 64).toLong))
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val q = all.find(_._1 == out.head._1).get
    val qc = q._2.map(code)
    val qd = q._2.map(_.toDouble)
    val qn = math.sqrt(dot(qd, qd))
    val pool = all.filter(_._1 != q._1)
      .map { case (id, v) =>
        (id, v.map(code).zip(qc).map { case (a, b) => a * b }.sum, v) }
      .sortBy { case (id, d, _) => (-d, id) }.take(20)
    val expect = pool.map { case (id, _, v) =>
        val vd = v.map(_.toDouble)
        (id, dot(qd, vd) / (qn * math.sqrt(dot(vd, vd)))) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    val got = out.filter(_._1 == q._1).map(r => (r._3, r._4))
    assert(got.toSeq == expect.toSeq)
  }

  // --- Packing ------------------------------------------------------

  test("packSequences: offsets are per-bucket prefix sums; bins by start token") {
    val docs = Tables.documents(spark, sf0001).withColumn("n_tokens",
      size(filter(TextAnalysis.tokens(col("text")), w => length(w) > 0)))
    val out = Packing.packSequences(docs, "doc_id", "n_tokens", 512)
      .select("doc_id", "n_tokens", "bucket", "offset", "bin_id")
      .as[(Long, Int, String, Long, Long)].collect()
    assert(out.length == docs.count())
    // per bucket: sorted offsets tile exactly (conservation: next offset
    // = prev offset + prev length), and every bin_id = offset div 512
    out.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._2)
        case _ =>
      }
      sorted.foreach(r => assert(r._5 == r._4 / 512))
    }
    // deterministic: same assignment on re-run
    val again = Packing.packSequences(docs, "doc_id", "n_tokens", 512)
      .select("doc_id", "n_tokens", "bucket", "offset", "bin_id")
      .as[(Long, Int, String, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("pack_sft: mask spans cover exactly the completion tokens") {
    val out = SparkEntry.queries("pack_sft")(spark, sf0001)
      .select("doc_id", "n_prompt", "n_completion", "tok_offset",
        "mask_start", "mask_end")
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, np, nc, off, ms, me) =>
      assert(ms == off + np)       // mask starts after the prompt
      assert(me - ms == nc)        // mask length = completion tokens
      assert(np > 0 && nc > 0)     // 'q: ' / 'a: ' prefixes guarantee ≥1
    }
    // within a bucket the example spans tile without overlap, so the
    // mask spans are pairwise disjoint (loss never double-counts)
    SparkEntry.queries("pack_sft")(spark, sf0001)
      .select("bucket", "tok_offset", "mask_end")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).foreach { case (_, rows) =>
        rows.sortBy(_._2).sliding(2).foreach {
          case Array(a, b) => assert(a._3 <= b._2)
          case _ =>
        }
      }
  }

  // --- temperature mix ----------------------------------------------

  test("temperatureSqrtMix: dominant group fully kept, rates ~ sqrt(n/nmax)") {
    val docs = Tables.documents(spark, sf001)
    val before = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val nmax = before.values.max
    val after = Sampling.temperatureSqrtMix(docs, "source", "doc_id")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val dominant = before.maxBy(_._2)._1
    assert(after(dominant) == before(dominant))
    // every group's realized rate is within 4 sigma of sqrt(n/nmax)
    before.foreach { case (src, n) =>
      val rate = math.sqrt(n.toDouble / nmax)
      val kept = after.getOrElse(src, 0L).toDouble
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - n * rate) <= 4 * sigma + 1,
        s"$src: kept $kept of $n, expected ~${n * rate}")
    }
  }

  // --- normalize / tf-idf -------------------------------------------

  test("normalize is idempotent and strips to [a-z0-9 ]") {
    val df = Seq((1L, "  Hello,   WORLD!! x_1  ")).toDF("doc_id", "text")
    val once = TextAnalysis.normalize(df).select("norm_text").as[String].head()
    assert(once == "hello world x 1")
    val twice = TextAnalysis.normalize(
      Seq((1L, once)).toDF("doc_id", "text"))
      .select("norm_text").as[String].head()
    assert(twice == once)
  }

  test("distinctiveTerms ranks by (tf desc, df asc, term)") {
    val df = Seq(
      (1L, "zz zz zz common rare"),
      (2L, "common common other")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.distinctiveTerms(df, "doc_id", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long, Long)].collect()
    // doc 1: zz tf=3 wins; tie tf=1 between common(df=2) and rare(df=1)
    // -> rare first by df asc
    assert(out(0) == ((1L, 1, "zz", 3L, 1L)))
    assert(out(1) == ((1L, 2, "rare", 1L, 1L)))
    // doc 2: common tf=2; then other (df=1)
    assert(out(2) == ((2L, 1, "common", 2L, 2L)))
    assert(out(3) == ((2L, 2, "other", 1L, 1L)))
  }

  // --- QualityRules line-shape gate ---------------------------------

  test("lineRules: each planted row hits its designed rule branch") {
    import graft.text.QualityRules
    import graft.queries.{Planting, TrainPrep}
    val planted = TrainPrep.LineRows.toDF("doc_id", "text")
    val out = QualityRules.lineRules(planted)
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0) - Planting.Offset, r.getBoolean(1))).toMap
    // 21 clean multi-line doc and 28 under-threshold bullets KEEP;
    // 22 all-bullets, 23 ellipsis-heavy, 24 numeric, 25 stopword-free,
    // 26 lorem-ipsum, 27 curly-brace all DROP
    assert(out === Map(21L -> true, 22L -> false, 23L -> false,
      24L -> false, 25L -> false, 26L -> false, 27L -> false,
      28L -> true))
  }

  test("canonicalize: each planted URL maps to its designed canonical form") {
    import graft.text.UrlOps
    import graft.queries.{Planting, TrainPrep}
    val out = UrlOps.canonicalize(TrainPrep.UrlRows.toDF("doc_id", "url"))
      .select("doc_id", "canon_url").collect()
      .map(r => (r.getLong(0) - Planting.Offset, r.getString(1))).toMap
    assert(out === Map(
      31L -> "https://example.com/A/B?x=2",   // case+port+slash+utm+frag
      32L -> "https://example.com/A/B?x=2",   // converges with 31
      33L -> "http://example.com/",           // default port, bare root
      34L -> "http://example.com/",           // converges with 33
      35L -> "https://example.com:8080/p",    // non-default port KEPT
      36L -> "https://example.com/p?a=1&b=2", // mid-list tracking param
      37L -> "ftp://files.example.com/data",  // non-http scheme untouched port rule
      38L -> "https://example.com/p"))        // ref dropped, empty query elided
  }

  test("domainBlock: label-aligned subdomain semantics, no substring bleed") {
    import graft.text.UrlOps
    val crawl = Seq(
      (1L, "example.com"),            // exact entry
      (2L, "a.b.example.com"),        // deep subdomain of entry
      (3L, "notexample.com"),         // endswith-without-dot trap: KEPT
      (4L, "example.com.evil.net"),   // entry as NON-suffix label run: KEPT
      (5L, "cdn.blocked.org"),        // subdomain of second entry
      (6L, "blocked.org"),            // second entry exact
      (7L, "safe.org")                // no match
    ).toDF("doc_id", "url_host")
    val bl = Seq("example.com", "blocked.org").toDF("domain")
    val out = UrlOps.domainBlock(crawl, bl, "doc_id")
      .select("doc_id", "blocked").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> true, 6L -> true, 7L -> false))
  }

  test("canonicalize is idempotent: the canonical form is a fixed point") {
    import graft.text.UrlOps
    import graft.queries.TrainPrep
    val once = UrlOps.canonicalize(TrainPrep.UrlRows.toDF("doc_id", "url"))
      .select(col("doc_id"), col("canon_url").as("url"))
    val twice = UrlOps.canonicalize(once)
      .select("doc_id", "canon_url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice === first)
  }

  test("lineRules: whitespace-only text yields zero lines and drops") {
    import graft.text.QualityRules
    val out = QualityRules.lineRules(
        Seq((1L, "   \n  \n")).toDF("doc_id", "text"))
      .select("n_lines", "n_words", "keep").head()
    assert(out.getInt(0) === 0 && out.getInt(1) === 0 && !out.getBoolean(2))
  }

  test("collocations: a planted fixed phrase outranks free pairs; " +
      "floor drops rare pairs") {
    import graft.text.TextAnalysis
    val docs = (
      // "hong kong" always adjacent (6×); fillers make a/b common
      Seq.fill(6)("hong kong is far") ++
      Seq.fill(6)("the cat sat on the mat") ++
      Seq.fill(3)("rare pair here")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text",
        minCount = 5, k = 10)
      .select("a", "b", "n_ab", "lift")
      .as[(String, String, Long, Double)].collect()
    val lift = got.map(r => (r._1, r._2) -> r._4).toMap
    // the fixed phrase (always adjacent, exclusive partners) carries
    // maximal lift; pairs with the promiscuous "the" rank strictly
    // below it
    assert(lift(("hong", "kong")) > lift(("the", "cat")))
    assert(lift(("hong", "kong")) > lift(("on", "the")))
    // the 3-occurrence pair is below the floor
    assert(!got.exists(r => r._1 == "rare"))
  }

  test("gap fill: spine covers every day between bounds, zeros filled") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2025-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2025-01-04 10:00:00")),
      (2L, Timestamp.valueOf("2025-02-01 09:00:00")))
      .toDF("user_id", "ts")
    val out = graft.queries.Windows.gapFillDaily(ev)
      .orderBy("user_id", "day")
      .as[(Long, java.sql.Date, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(1L, 0L, 0L, 1L, 1L))
    assert(out.count(_._1 == 1L) == 4)  // Jan 1..4 inclusive
  }

  test("pipeline_curate_v4 coherence: survivors pass every stage's own rule") {
    import graft.queries.TrainPrep
    val out = TrainPrep.queries("pipeline_curate_v4")(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    // canon-URL dedup held: output canon_urls are unique
    val canons = out.map(_.getString(2))
    assert(canons.distinct.length == canons.length)
    // host gate held: every survivor's host is a keeper host per the
    // standalone host-gate entry
    val keepers = TrainPrep.queries("web_host_gate")(spark, sf001)
      .filter(col("keep") === 1).select("url_host")
      .distinct().as[String].collect().toSet
    assert(out.forall(r => keepers.contains(r.getString(1))))
    // shard range
    assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 16))
  }

  test("pipeline_curate_v5 coherence: survivors pass every stage's own rule") {
    import graft.queries.TrainPrep
    val out = TrainPrep.queries("pipeline_curate_v5")(spark, sf001).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    // domain block held: no survivor doc is blocked per the standalone entry
    val blocked = TrainPrep.queries("web_domain_block")(spark, sf001)
      .filter(col("blocked")).select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(blocked).isEmpty)
    // phrase blocklist held: no survivor doc matched any phrase per the
    // standalone text_blocklist entry
    val matched = graft.queries.TokenOps.queries("text_blocklist")(spark, sf001)
      .filter(col("blocked")).select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(matched).isEmpty)
    // token floor + shard range
    val toks = Tables.documents(spark, sf001)
      .select(col("doc_id"), size(graft.text.Tokens.ws(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(ids.forall(id => toks(id) >= 5))
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 16))
  }

  test("pipeline_curate_v6 coherence: verdicts agree with the " +
      "standalone classifier and LM-bucket entries") {
    import graft.queries.TokenOps
    val out = TokenOps.queries("pipeline_curate_v6")(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    val admitted = out.filter(_.getBoolean(6)).map(_.getLong(0)).toSet
    assert(admitted.nonEmpty)          // fixture exercises the pipeline
    assert(admitted.size < out.length) // and the gates actually gate
    // classifier verdict ≡ standalone text_classifier_score keep
    val clsKeep = graft.queries.CorpusOps
      .queries("text_classifier_score")(spark, sf001)
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    assert(out.forall(r => r.getBoolean(3) == clsKeep(r.getLong(0))))
    // LM verdict ≡ standalone text_lm_buckets (tail dropped)
    val tails = TokenOps.queries("text_lm_buckets")(spark, sf001)
      .filter(col("bucket") === "tail").select("doc_id")
      .as[Long].collect().toSet
    assert(out.forall(r => r.getBoolean(4) == !tails(r.getLong(0))))
    // admitted ≡ conjunction of the three stage verdicts
    assert(out.forall(r => r.getBoolean(6) ==
      (r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))))
  }

  test("hostStats/hostGate: mirror host counted after canonicalization, " +
      "clean host kept") {
    import graft.text.UrlOps
    // mirror.test serves 4 docs on 2 canonical URLs (two spellings
    // differ only by tracking params — canon MUST collapse them);
    // clean.test serves 3 docs on 3 URLs
    val docs = Seq(
      (1L, "https://mirror.test/a"),
      (2L, "https://mirror.test/a?utm_source=x"),
      (3L, "https://mirror.test/b"),
      (4L, "https://mirror.test/b?gclid=1"),
      (5L, "https://clean.test/x"),
      (6L, "https://clean.test/y"),
      (7L, "https://clean.test/z")).toDF("doc_id", "url")
    val gated = UrlOps.hostGate(UrlOps.canonicalize(docs),
        maxDupRate = 0.4)
      .select("doc_id", "url_host", "host_docs", "host_urls",
        "dup_url_rate", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getInt(5)))).toMap
    assert(gated(1L) == (("mirror.test", 4L, 2L, 0.5, 0)))
    assert(gated(5L) == (("clean.test", 3L, 3L, 0.0, 1)))
    assert(Seq(1L, 2L, 3L, 4L).forall(gated(_)._5 == 0))
    assert(Seq(5L, 6L, 7L).forall(gated(_)._5 == 1))
  }
}
