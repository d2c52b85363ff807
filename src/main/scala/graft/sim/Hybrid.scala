package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — reciprocal-rank fusion (Cormack et al.
  * SIGIR'09): fuse a lexical ranking (BM25) with a semantic ranking
  * (embedding cosine) without score calibration, since only RANKS
  * enter: rrf(d) = Σ_lists 1/(c + rank_d). Rank-based fusion is the
  * production default precisely because the two scores live on
  * incomparable scales.
  *
  * Scale: both inputs are already top-k (query-scale); the fuse is a
  * full-outer join on the doc id + a fixed-order two-addend sum (no
  * float-sum partial-agg nondeterminism), then a TakeOrdered top-k.
  */
object Hybrid {

  /** `a` and `b` carry (idCol, rankCol) with ranks 1-based. Output:
    * (idCol, rrf_score, rank_a, rank_b) — top `k` by score (ties
    * broken by id); the caller's id column name is preserved. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
      c: Int = 60, rankCol: String = "rank"): DataFrame = {
    val l = a.select(col(idCol), col(rankCol).as("rank_a"))
    val r = b.select(col(idCol), col(rankCol).as("rank_b"))
    l.join(r, Seq(idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)))
      .select(idCol, "rrf_score", "rank_a", "rank_b")
      .orderBy(desc("rrf_score"), asc(idCol))
      .limit(k)
  }
}
