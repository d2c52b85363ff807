package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.LinkGraph

/** Conformance queries for the link-graph tier
  * ([[graft.graph.LinkGraph]]): quantized PageRank and the degree
  * census over a deterministic citation graph synthesized from the
  * documents table (no count pass — targets are arithmetic on the
  * source id, clamped to the id floor, so the same rule scales with
  * the corpus).
  *
  * The synthetic graph: doc u cites u−1−(u%13) (a block-local hub —
  * every 13-run concentrates on one target), u−2−(u%7), and u DIV 2
  * (a halving chain that funnels mass toward low ids). Self-loops and
  * below-floor targets dropped, duplicates deduplicated. Doc 0 has no
  * valid target — a dangling vertex, exercising the dropped-mass
  * branch.
  */
object GraphOps extends QueryModule {

  /** (src, dst) — deduplicated, self-loop-free. */
  private def citeEdges(s: SparkSession, d: String): DataFrame = {
    val u = col("id")
    Tables.documents(s, d).select(col("doc_id").as("id"))
      .select(u.as("src"), explode(array(
        u - 1 - u % 13,
        u - 2 - u % 7,
        expr("id DIV 2"))).as("dst"))
      .filter(col("dst") >= 0 && col("dst") =!= col("src"))
      .distinct()
  }

  private def vertices(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id").as("id"))

  private def graphPagerank(s: SparkSession, d: String): DataFrame =
    LinkGraph.pageRank(vertices(s, d), citeEdges(s, d), iters = 3)
      .orderBy("id")

  private def graphDegrees(s: SparkSession, d: String): DataFrame =
    LinkGraph.degrees(vertices(s, d), citeEdges(s, d))
      .orderBy("id")

  // Trusted seeds: every 50th doc (2%) — trust flows down the citation
  // graph from them; vertices unreachable from any seed decay to 0.
  private def graphTrustrank(s: SparkSession, d: String): DataFrame =
    LinkGraph.trustRank(vertices(s, d), citeEdges(s, d),
        vertices(s, d).filter(col("id") % 50 === 0), iters = 3)
      .orderBy("id")

  // HITS over the same citation graph: the two-sided link signal
  // (hub pages that cite well vs authority pages that get cited) —
  // L∞-normalized onto the integer grid, so hash-green like pagerank
  // (see LinkGraph.hits for why L∞ replaces the classic L2).
  private def graphHits(s: SparkSession, d: String): DataFrame =
    LinkGraph.hits(vertices(s, d), citeEdges(s, d), iters = 3)
      .orderBy("id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank"  -> (graphPagerank _),
    "graph_degrees"   -> (graphDegrees _),
    "graph_trustrank" -> (graphTrustrank _),
    "graph_hits"      -> (graphHits _)
  )

  /** Shared synthesis + degree CTEs: v (vertices), e (edges), od
    * (out-degrees) — one definition behind both oracles. */
  private val GraphCtes =
    """WITH v AS (SELECT doc_id AS id FROM documents),
       e0 AS (
         SELECT id AS src,
                unnest([id - 1 - id % 13,
                        id - 2 - id % 7,
                        id // 2]) AS dst
         FROM v),
       e AS (SELECT DISTINCT src, dst FROM e0
             WHERE dst >= 0 AND dst <> src),
       od AS (SELECT src, count(*) AS od FROM e GROUP BY src)"""

  /** One unrolled propagation step r_prev → r_next (all-BIGINT:
    * ⌊17·r/(20·od)⌋ contributions + per-vertex teleport `tele`). */
  private def stepSql(prev: String, next: String,
      tele: String = "157286"): String =
    s""",
       $next AS (
         SELECT v.id,
                CAST(($tele) + coalesce(s.c, 0) AS BIGINT) AS score
         FROM v LEFT JOIN (
           SELECT e.dst, sum((17 * $prev.score) // (20 * od.od)) AS c
           FROM e JOIN od USING (src)
           JOIN $prev ON e.src = $prev.id
           GROUP BY e.dst) s
         ON v.id = s.dst)"""

  // seed-restricted teleport for the TrustRank oracle
  private val SeedTele = "CASE WHEN v.id % 50 = 0 THEN 157286 ELSE 0 END"

  /** One unrolled HITS step h_{i-1} → (a_i, h_i): in/out sums with
    * L∞ normalization onto the 2^20 grid — digit-for-digit the
    * [[graft.graph.LinkGraph.hits]] arithmetic (scalar-subquery max,
    * `//` ≡ `div` on the non-negative domain). */
  private def hitsStepSql(i: Int): String = {
    val hp = s"h${i - 1}"
    s""",
       ar$i AS (SELECT e.dst AS id, CAST(sum($hp.h) AS BIGINT) AS ar
                FROM e JOIN $hp ON e.src = $hp.id GROUP BY e.dst),
       a$i AS (SELECT v.id,
                 CAST(coalesce((ar.ar * 1048576)
                   // (SELECT max(ar) FROM ar$i), 0) AS BIGINT) AS a
               FROM v LEFT JOIN ar$i ar ON v.id = ar.id),
       hr$i AS (SELECT e.src AS id, CAST(sum(a$i.a) AS BIGINT) AS hr
                FROM e JOIN a$i ON e.dst = a$i.id GROUP BY e.src),
       h$i AS (SELECT v.id,
                 CAST(coalesce((hr.hr * 1048576)
                   // (SELECT max(hr) FROM hr$i), 0) AS BIGINT) AS h
               FROM v LEFT JOIN hr$i hr ON v.id = hr.id)"""
  }

  val oracles: Map[String, String] = Map(
    // 2^20 = 1048576 grid; teleport ⌊3·2^20/20⌋ = 157286 — matches
    // LinkGraph.pageRank's Long arithmetic digit for digit
    "graph_pagerank" ->
      (GraphCtes +
      """,
         r0 AS (SELECT id, CAST(1048576 AS BIGINT) AS score FROM v)""" +
      stepSql("r0", "r1") + stepSql("r1", "r2") + stepSql("r2", "r3") +
      """
         SELECT id, score FROM r3 ORDER BY id"""),

    "graph_trustrank" ->
      (GraphCtes +
      """,
         r0 AS (SELECT id,
                       CAST(CASE WHEN id % 50 = 0 THEN 1048576 ELSE 0
                            END AS BIGINT) AS score FROM v)""" +
      stepSql("r0", "r1", SeedTele) + stepSql("r1", "r2", SeedTele) +
      stepSql("r2", "r3", SeedTele) +
      """
         SELECT id, score FROM r3 ORDER BY id"""),

    "graph_hits" ->
      (GraphCtes +
      """,
         h0 AS (SELECT id, CAST(1048576 AS BIGINT) AS h FROM v)""" +
      hitsStepSql(1) + hitsStepSql(2) + hitsStepSql(3) +
      """
         SELECT a3.id, a3.a AS authority, h3.h AS hub
         FROM a3 JOIN h3 USING (id) ORDER BY a3.id"""),

    "graph_degrees" ->
      (GraphCtes +
      """,
         ind AS (SELECT dst AS id, count(*) AS in_deg FROM e GROUP BY dst)
         SELECT v.id,
                coalesce(od.od, 0) AS out_deg,
                coalesce(ind.in_deg, 0) AS in_deg
         FROM v LEFT JOIN od ON v.id = od.src
                LEFT JOIN ind ON v.id = ind.id
         ORDER BY v.id""")
  )
}
