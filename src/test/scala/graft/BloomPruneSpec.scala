package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomPrune

/** Pins the Bloom semi-join reduction's two contract halves: exactness
  * (no false negatives — the pruned join equals the plain join) and
  * selectivity (the sketch actually prunes, with a false-positive rate
  * in the neighborhood the fpp parameter promises). */
class BloomPruneSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bloom semiJoin equals the plain left-semi join row-for-row") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001).filter(col("o_totalprice") > 400000.0)
    val bloom = BloomPrune.semiJoin(li, "l_orderkey", o, "o_orderkey",
        expectedItems = 10000)
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
    assert(bloom.collect().sameElements(plain.collect()))
  }

  test("sketch has no false negatives and ~fpp false positives") {
    val members = spark.range(0, 1000).select(col("id").as("k"))
    val sketch = BloomPrune.buildKeySketch(members, "k",
      expectedItems = 1000, fpp = 0.01)
    // every member passes
    val passMembers = members
      .filter(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(passMembers === 1000L)
    // non-members pass at ≲ fpp (generous 3× bound: one-sided sampling
    // noise on 10k probes plus the sketch's own rounding of m/k)
    val nonMembers = spark.range(100000, 110000).select(col("id").as("k"))
    val fp = nonMembers
      .filter(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(fp <= 300, s"false-positive count $fp exceeds 3x fpp bound")
  }

  test("plan shape: the might_contain probe sits on the fact scan, below the join") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001).filter(col("o_totalprice") > 400000.0)
    val plan = BloomPrune.semiJoin(li, "l_orderkey", o, "o_orderkey",
      expectedItems = 10000).queryExecution.executedPlan.toString
    // the probe predicate is present and codegen'd (an expression in a
    // Filter, not a UDF invocation)
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(!plan.contains("UDF"), "probe fell back to a UDF")
  }

  test("prefilter prunes the fact side before the exact join") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001).filter(col("o_totalprice") > 450000.0)
    val sketch = BloomPrune.buildKeySketch(o, "o_orderkey",
      expectedItems = 10000)
    val kept = li.filter(BloomPrune.mightContain(sketch, col("l_orderkey")))
      .count()
    val total = li.count()
    val exact = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_semi")
      .count()
    assert(kept < total / 2, s"sketch kept $kept of $total — not selective")
    assert(kept >= exact, "sketch dropped true matches")
  }
}
