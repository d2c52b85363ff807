package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sampling.Sampling

/** Semantic checks for the deterministic sampling/splitting operators
  * (beyond the DuckDB hash conformance): reproducibility, stability
  * under corpus growth, exact per-group quotas. */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs = Tables.documents(spark, sf001)

  test("hashSplit: reproducible, near-fraction, and stable under growth") {
    val full = Sampling.hashSplit(docs, "doc_id", 0.8)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val again = Sampling.hashSplit(docs, "doc_id", 0.8)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full == again)
    val frac = full.count(_._2 == "train").toDouble / full.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // growth stability: the split computed on HALF the corpus agrees
    // with the full-corpus assignment on every shared doc — adding data
    // never reassigns an existing doc (no eval-set contamination)
    val half = Sampling.hashSplit(docs.filter(col("doc_id") < 250),
        "doc_id", 0.8)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, s) => full(id) == s })
    // a different salt is an independent assignment (some docs flip)
    val resalted = Sampling.hashSplit(docs, "doc_id", 0.8, salt = "v2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(resalted.exists { case (id, s) => full(id) != s })
  }

  test("fixedSample: exact size, reproducible, nested across sizes") {
    val s100 = Sampling.fixedSample(docs, "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s100.size == 100)
    val again = Sampling.fixedSample(docs, "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s100 == again)
    // hash-order prefixes nest: the 100-sample is inside the 150-sample
    val s150 = Sampling.fixedSample(docs, "doc_id", 150)
      .select("doc_id").as[Long].collect().toSet
    assert(s100.subsetOf(s150))
    // n >= corpus: returns everything
    val all = Sampling.fixedSample(docs, "doc_id", 1000000)
      .select("doc_id").as[Long].collect()
    assert(all.length == docs.count())
  }

  test("reserved output/temp column names fail fast on collision") {
    intercept[IllegalArgumentException](
      Sampling.hashSplit(docs.withColumn("split", lit("x")), "doc_id", 0.8))
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs.withColumn("__rn", lit(1)),
        "lang", "doc_id", 0.5))
    intercept[IllegalArgumentException](
      Sampling.balancedSample(docs.withColumn("__rn", lit(1)),
        "lang", "doc_id", 10))
    intercept[IllegalArgumentException](
      Sampling.weightedMix(
        Seq((docs.withColumn("mix_source", lit(9)), 0.5)), "doc_id"))
  }

  test("stratifiedSample: exactly ceil(frac·|group|) rows per group") {
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.5)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == full.keySet)
    full.foreach { case (g, n) =>
      assert(got(g) == (n + 1) / 2, s"group $g: ${got(g)} of $n")
    }
    // sampled rows are a subset of the input
    val ids = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(all))
  }

  test("weightedMix: weight-1 source intact, fractional sources near-rate, reproducible") {
    val en = docs.filter(col("lang") === "en")
    val es = docs.filter(col("lang") === "es")
    def mix() = Sampling.weightedMix(Seq(en -> 1.0, es -> 0.25), "doc_id")
    // multiset compare (sorted Seq, not Set): catches duplicate rows a
    // union bug could emit, and repartitioning first makes the second
    // run execute a different physical plan — the decisions must not
    // depend on partitioning
    val m = mix().select("doc_id", "mix_source").as[(Long, Int)]
      .collect().sorted.toSeq
    val m2 = Sampling.weightedMix(
        Seq(en.repartition(7) -> 1.0, es.repartition(3) -> 0.25), "doc_id")
      .select("doc_id", "mix_source").as[(Long, Int)].collect().sorted.toSeq
    assert(m == m2)
    assert(m.count(_._2 == 0).toLong == en.count())   // weight 1.0 = all
    val esKept = m.count(_._2 == 1).toDouble / es.count()
    assert(esKept > 0.1 && esKept < 0.4, s"es kept fraction $esKept")
    // raising a weight only ADDS rows (thresholds nest): 0.25 ⊂ 0.5
    val wider = Sampling.weightedMix(Seq(en -> 1.0, es -> 0.5), "doc_id")
      .select("doc_id", "mix_source").as[(Long, Int)].collect().toSet
    assert(m.toSet.subsetOf(wider))
  }

  test("temperatureMix: α=1/2 reproduces temperatureSqrtMix exactly") {
    // at p/q = 1/2 the adaptive resolutions are a=16, b=32, where the
    // integer grid rule degenerates to t = isqrt(⌊2^32·n/nmax⌋) =
    // ⌊2^16·√(n/nmax)⌋ — the same 16-bit thresholds the sqrt path
    // computes in (correctly-rounded) floating point. Same salt ⇒ the
    // kept sets must be identical row-for-row.
    val sqrtPath = Sampling.temperatureSqrtMix(docs, "source", "doc_id",
        salt = "temp").select("doc_id", "source")
      .as[(Long, String)].collect().sorted.toSeq
    val tablePath = Sampling.temperatureMix(docs, "source", "doc_id",
        alphaNum = 1, alphaDen = 2, salt = "temp")
      .select("doc_id", "source")
      .as[(Long, String)].collect().sorted.toSeq
    assert(tablePath == sqrtPath)
  }

  test("temperatureMix: α=7/10 keeps more than α=1/2 of rare groups, all of max") {
    val byGroup = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val maxGroup = byGroup.maxBy(_._2)._1
    val a07 = Sampling.temperatureMix(docs, "source", "doc_id", 7, 10)
    // the max group is kept whole (rate 1) and reports full rate_q=128
    val maxKept = a07.filter(col("source") === maxGroup)
    assert(maxKept.count() == byGroup(maxGroup))
    assert(maxKept.select("rate_q").distinct().as[Int].collect()
      .toSeq == Seq(128))
    // flattening is monotone in α: (n/nmax)^0.7 ≤ (n/nmax)^0.5 for
    // ratios ≤ 1, so every group's realized integer rate at α=0.7 is
    // ≤ its α=0.5 rate — compare the rate tables directly
    val r07 = a07.select("source", "rate_q").distinct()
      .as[(String, Int)].collect().toMap
    val r05 = Sampling.temperatureMix(docs, "source", "doc_id", 1, 2)
      .select("source", "rate_q").distinct()
      .as[(String, Int)].collect().toMap
    r07.filter(_._2 > 1).foreach { case (g, t7) =>
      // a=7 vs a=16 resolutions: compare in the shared 16-bit space
      // (t7=1 is the min-rate clamp, where the inequality can't hold)
      assert(t7.toLong * 512 <= r05(g).toLong,
        s"group $g: α=0.7 rate ${t7 * 512} > α=0.5 rate ${r05(g)}")
    }
    // extreme α is rejected rather than silently coarse
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(docs, "source", "doc_id", 16, 1))
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(docs.withColumn("rate_q", lit(1)),
        "source", "doc_id", 7, 10))
  }

  test("balancedSample: caps each group, keeps small groups whole") {
    val capped = Sampling.balancedSample(docs, "source", "doc_id", 10)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(capped.values.forall(_ <= 10))
    // cap above every group size = identity
    val loose = Sampling.balancedSample(docs, "source", "doc_id", 100000)
    assert(loose.count() == docs.count())
  }

  test("mixturePlan: hand-computed two-source plan, budget respected") {
    val docs = Seq(
      ("a", "t1 t2 t3 t4 t5 t6 t7 t8 t9"),   // 9 tokens
      ("b", "u1"))                            // 1 token
      .toDF("source", "text")
    val got = Sampling.mixturePlan(docs, "source", "text", 1000L)
      .as[(String, Long, Double, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // independent derivation with the same fold order (a before b)
    val (wa, wb) = (math.sqrt(9.0 / 10.0), math.sqrt(1.0 / 10.0))
    val z = 0.0 + wa + wb
    assert(got("a")._2 === 9L)
    assert(got("a")._3 === wa / z)
    assert(got("a")._4 === math.floor(1000.0 * (wa / z)).toLong)
    assert(got("b")._4 === math.floor(1000.0 * (wb / z)).toLong)
    // both sources oversampled (tiny corpus, large budget)
    assert(got("a")._6 === 1 && got("b")._6 === 1)
    assert(got.values.map(_._4).sum <= 1000L)
  }

  test("mixturePlan: empty source yields NULL rate (not NaN), oversample 0") {
    val docs = Seq(("a", "t1 t2"), ("b", "   ")).toDF("source", "text")
    val got = Sampling.mixturePlan(docs, "source", "text", 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("b").getLong(1) === 0L)          // n_tokens
    assert(got("b").getLong(3) === 0L)          // target_tokens
    assert(got("b").isNullAt(4), "rate must be NULL, not NaN")
    assert(got("b").getInt(5) === 0)            // oversample
    assert(!got("a").isNullAt(4))
  }

  test("mixturePlan: real corpus — shares sum to ~1, floor keeps sum under budget") {
    val plan = Sampling.mixturePlan(
      Tables.documents(spark, sf0001), "source", "text", 1000000L)
      .as[(String, Long, Double, Long, Double, Int)].collect()
    assert(math.abs(plan.map(_._3).sum - 1.0) < 1e-9)
    assert(plan.map(_._4).sum <= 1000000L)
    assert(plan.map(_._4).sum > 1000000L - plan.length) // floor loses < 1/source
  }

  test("executeMixturePlan: per-doc epochs are ⌊rate⌋ or ⌈rate⌉ and the " +
      "realized token mass per source tracks the plan target") {
    val corpus = Tables.documents(spark, sf0001)
    val budget = 1000000L
    val plan = Sampling.mixturePlan(corpus, "source", "text", budget)
      .as[(String, Long, Double, Long, Double, Int)].collect()
      .map(p => p._1 -> (p._2, p._4, p._5)).toMap
    val mix = Sampling.executeMixturePlan(
      corpus, "source", "doc_id", "text", budget)
    // every emitted (doc, epoch) pair is unique; per doc the epoch set
    // is exactly 0..n-1 with n ∈ {⌊rate⌋, ⌊rate⌋+1}
    val perDoc = mix.groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"),
        countDistinct("epoch").as("nd"))
      .as[(String, Long, Long, Long, Long)].collect()
    perDoc.foreach { case (src, id, n, mx, nd) =>
      assert(n == nd && mx == n - 1, s"epoch set not 0..n-1 for $src/$id")
      val rate = plan(src)._3
      assert(n == math.floor(rate).toLong || n == math.floor(rate).toLong + 1,
        s"$src/$id emitted $n epochs at rate $rate")
    }
    // realized token mass per source: n_tokens·rate within the 16-bit
    // draw's binomial noise of the target (loose 4σ-ish band — the
    // point is "tracks the plan", not a statistics exam)
    val toks = corpus.select(col("doc_id"),
        size(graft.text.Tokens.ws(col("text"))).cast("long").as("t"))
      .as[(Long, Long)].collect().toMap
    val realized = mix.select("source", "doc_id").as[(String, Long)]
      .collect().groupBy(_._1).map { case (s, rows) =>
        s -> rows.map(r => toks(r._2)).sum }
    realized.foreach { case (src, got) =>
      val (nTok, target, _) = plan(src)
      // slack: one epoch draw flips at most max-doc-tokens per doc;
      // bound by 4·√docs·maxDoc (generous at this SF)
      val maxDoc = toks.values.max
      val slack = 4 * math.sqrt(toks.size.toDouble) * maxDoc + nTok / 65536.0
      assert(math.abs(got.toDouble - target) <= slack,
        s"$src realized $got vs target $target (slack $slack)")
    }
  }

  test("executeMixturePlan: reproducible, and the fractional draw is " +
      "growth-stable per (salt, doc)") {
    val corpus = Tables.documents(spark, sf0001)
    val a = Sampling.executeMixturePlan(
        corpus, "source", "doc_id", "text", 1000000L)
      .as[(String, Long, Long)].collect().sorted.toSeq
    val b = Sampling.executeMixturePlan(
        corpus, "source", "doc_id", "text", 1000000L)
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("samp_split_safe: no near-dup cluster ever spans train and test, " +
      "and the per-doc split WOULD have leaked") {
    val safe = graft.queries.DataOps
      .queries("samp_split_safe")(spark, sf0001)
      .as[(Long, Long, String)].collect()
    // cluster-granularity invariant: one split value per canonical id
    val perCanonical = safe.groupBy(_._2).mapValues(_.map(_._3).toSet)
    assert(perCanonical.values.forall(_.size == 1))
    // the naive per-DOC rule on the same corpus splits at least one
    // cluster — the leak this operator exists to prevent is real here
    val naive = Sampling.hashSplit(
        safe.toSeq.toDF("doc_id", "canonical_id", "old").drop("old"),
        "doc_id", 0.8)
      .as[(Long, Long, String)].collect()
    val naivePerCanonical = naive.groupBy(_._2).mapValues(_.map(_._3).toSet)
    assert(naivePerCanonical.exists { case (c, splits) =>
      splits.size > 1 })
  }
}
