package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.LinkGraph

/** Semantic checks for the link-graph tier beyond the DuckDB
  * conformance: hand-computed quantized ranks on a known graph,
  * dangling semantics, and mass accounting. */
class GraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // A: 0 → 1, 0 → 2, 1 → 2; 2 dangling.
  private def v = Seq(0L, 1L, 2L).toDF("id")
  private def e = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")

  test("pageRank: one iteration matches hand-computed integer ranks") {
    val q = 1L << 20 // 1048576; teleport = 157286
    val got = LinkGraph.pageRank(v, e, iters = 1)
      .as[(Long, Long)].collect().toMap
    // contrib(0→x) = ⌊17·2^20 / (20·2)⌋ = ⌊17825792/40⌋ = 445644
    // contrib(1→2) = ⌊17·2^20 / 20⌋    = 891289
    val c0 = 17L * q / 40
    val c1 = 17L * q / 20
    assert(got(0L) == 157286L)               // teleport only (no inlinks)
    assert(got(1L) == 157286L + c0)
    assert(got(2L) == 157286L + c0 + c1)
  }

  test("pageRank: two iterations — dangling vertex 2 contributes nothing") {
    val got = LinkGraph.pageRank(v, e, iters = 2)
      .as[(Long, Long)].collect().toMap
    val q = 1L << 20
    val r1 = Map(0L -> 157286L,
      1L -> (157286L + 17L * q / 40),
      2L -> (157286L + 17L * q / 40 + 17L * q / 20))
    def c(r: Long, od: Long) = 17L * r / (20L * od)
    assert(got(0L) == 157286L)
    assert(got(1L) == 157286L + c(r1(0L), 2))
    // vertex 2's big rank is dropped (dangling), not redistributed
    assert(got(2L) == 157286L + c(r1(0L), 2) + c(r1(1L), 1))
  }

  test("pageRank on the registry graph: mass bounded, hubs outrank leaves") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id").as("id"))
    val u = col("id")
    val edges = docs
      .select(u.as("src"), explode(array(
        u - 1 - u % 13, u - 2 - u % 7, expr("id DIV 2"))).as("dst"))
      .filter(col("dst") >= 0 && col("dst") =!= col("src"))
      .distinct()
    val r = LinkGraph.pageRank(docs, edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val q = 1L << 20
    val n = r.size
    // total mass never exceeds the initial n·q (teleport + damped flow
    // + dropped dangling mass can only lose grid units)
    assert(r.values.sum <= n.toLong * q)
    assert(r.values.forall(_ >= 157286L)) // everyone keeps teleport
    // authority goes to hubs: the top-ranked vertex is one of the
    // 13-block concentrators (in-degree far above the ~3-link median)
    val top = r.maxBy(_._2)._1
    val inDeg = LinkGraph.degrees(docs, edges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(inDeg(top) >= 10,
      s"top-ranked vertex $top has in-degree ${inDeg(top)} — not a hub")
  }

  test("trustRank: trust flows only from seeds; unreachable vertices " +
      "decay to zero however well-linked") {
    // 0 (seed) → 1; 2 → 1 (2 is a non-seed 'link farm' pointing at 1)
    val v3 = Seq(0L, 1L, 2L).toDF("id")
    val e3 = Seq((0L, 1L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = LinkGraph.trustRank(v3, e3, seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    val q = 1L << 20
    // seed keeps its teleport; 2 has no seed path → exactly 0
    assert(got(0L) == 157286L)
    assert(got(2L) == 0L)
    // 1 receives damped flow from the seed only: iter1 r0=q →
    // c = ⌊17q/20⌋; iter2 r(0)=157286 → c' = ⌊17·157286/20⌋
    assert(got(1L) == 17L * 157286L / 20)
    // sanity vs pageRank: under uniform teleport vertex 2 is NOT zero
    val pr = LinkGraph.pageRank(v3, e3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(pr(2L) == 157286L)
  }

  test("hits: hand-computed one-step L∞-normalized scores; sources " +
      "score 0 authority, sinks 0 hub") {
    val vh = Seq(1L, 2L, 3L, 4L).toDF("id")
    val eh = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = LinkGraph.hits(vh, eh, iters = 1, q = 16L)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // h0 = 16 everywhere; araw: 3←32, 4←16, amax 32 → a = (0,0,16,8);
    // hraw: 1←16, 2←16, 3←8, hmax 16 → h = (16,16,8,0)
    assert(got(1L) == ((0L, 16L)))
    assert(got(2L) == ((0L, 16L)))
    assert(got(3L) == ((16L, 8L)))
    assert(got(4L) == ((8L, 0L)))
    // multi-iteration run stays on the grid and keeps the shape
    val g3 = LinkGraph.hits(vh, eh, iters = 3, q = 1L << 20)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(g3(3L)._1 == (1L << 20))   // unique max authority
    assert(g3(1L)._1 == 0L && g3(4L)._2 == 0L)
  }

  test("degrees: census matches brute-force counts; dangling has out 0") {
    val got = LinkGraph.degrees(v, e)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(0L) == ((2L, 0L)))
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((0L, 2L)))
  }
}
