package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the metrics a training-data pipeline runs
  * over every retriever it ships (recall@k, MRR, nDCG), as exact
  * distributed operators over a (query_id, rank, cand_id) ranking and
  * a sparse (query_id, cand_id, rel) qrels table.
  *
  * Exactness design (the pinned-twin discipline, applied to metrics):
  *   - counts/hits/ranks are integers;
  *   - MRR's 1/rank is carried as the EXACT rational numerator
  *     `RankLcm / rank` (lcm(1..20) — every reciprocal is integral),
  *     so corpus-level sums stay BIGINT;
  *   - DCG's irrational 1/log2(r+1) weights are a CONSTANT integer
  *     table ⌊10⁹/log2(r+1)⌋ computed ONCE here and rendered as
  *     literals into both engines — the graded gains (2^rel − 1)
  *     and weighted sums are then pure BIGINT;
  *   - each final ratio (recall, nDCG) is ONE IEEE division of
  *     exactly-representable integers — correctly rounded everywhere.
  * Every metric entry is therefore hash-green, not rows-only.
  *
  * Scale shape: rankings are |Q|·k rows and qrels are the sparse
  * relevant set — both metadata next to the corpus; every metric is
  * one equi-join + a two-phase per-query aggregate, no windows over
  * unbounded partitions, nothing corpus-sized anywhere.
  */
object RetrievalEval {

  /** Deepest rank the pinned tables cover. */
  val MaxK = 20

  /** lcm(1..20): `RankLcm / r` is integral for every rank ≤ MaxK. */
  val RankLcm = 232792560L

  /** w(r) = ⌊10⁹ / log2(r+1)⌋ for r = 1..MaxK — the pinned DCG
    * discount table (w(1) = 10⁹ exactly). */
  val DcgWeights: IndexedSeq[Long] =
    (1 to MaxK).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** The weight table as a DuckDB 1-indexed list literal. */
  def dcgWeightsSql: String = DcgWeights.mkString("[", ",", "]")

  private def weightAt(rank: Column): Column =
    element_at(array(DcgWeights.map(lit): _*), rank.cast("int"))

  /** Graded gain 2^rel − 1 over the `rel` column (BIGINT; rel is a
    * small non-negative grade). */
  private def gainExpr: Column = expr("(CAST(1 AS BIGINT) << rel) - 1")

  /** Per-query recall@k: (query_id, n_hits, n_rel, recall). Queries
    * are those present in `qrels` with rel > 0; n_hits counts ranked
    * candidates at rank ≤ k that are relevant. */
  def recallAtK(ranking: DataFrame, qrels: DataFrame, k: Int)
      : DataFrame = {
    val rel = qrels.filter(col("rel") > 0)
    val hits = ranking.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "cand_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_rel"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double")).as("recall"))
  }

  /** Per-query reciprocal rank, exact: (query_id, first_rel_rank,
    * rr_num) with rr_num = RankLcm / first_rel_rank (0 when no
    * relevant candidate appears at rank ≤ k). Corpus MRR is then
    * sum(rr_num) / (n_queries · RankLcm) — one division at the end
    * of an all-BIGINT pipeline. */
  def mrr(ranking: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k <= MaxK, s"k must be <= $MaxK, got $k")
    val rel = qrels.filter(col("rel") > 0)
    val first = ranking.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "cand_id"))
      .groupBy("query_id").agg(min(col("rank")).as("first_rel_rank"))
    rel.select("query_id").distinct()
      .join(first, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rel_rank").cast("int")
          .as("first_rel_rank"),
        coalesce(expr(s"${RankLcm}L div first_rel_rank"), lit(0L))
          .as("rr_num"))
  }

  /** Per-query pinned nDCG@k: (query_id, dcg_q, idcg_q, ndcg) with
    * dcg_q = Σ (2^rel − 1)·w(rank) over relevant ranked candidates
    * and idcg_q the same sum over the query's grades sorted
    * descending — both BIGINT; ndcg is the single closing division.
    * Grade ties need no tiebreak (equal grades swap freely in the
    * ideal ordering without changing the sum). */
  def ndcgAtK(ranking: DataFrame, qrels: DataFrame, k: Int)
      : DataFrame = {
    require(k <= MaxK, s"k must be <= $MaxK, got $k")
    val rel = qrels.filter(col("rel") > 0)
    val dcg = ranking.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "cand_id"))
      .select(col("query_id"),
        (gainExpr * weightAt(col("rank"))).as("__g"))
      .groupBy("query_id").agg(sum(col("__g")).as("dcg_q"))
    val idcg = rel
      .groupBy("query_id")
      .agg(slice(sort_array(collect_list(col("rel")), asc = false),
        1, k).as("__rels"))
      .select(col("query_id"), expr(
        s"""aggregate(
              zip_with(__rels, slice(array(${DcgWeights.mkString(",")}),
                                     1, size(__rels)),
                (r, w) -> ((CAST(1 AS BIGINT) << r) - 1) * w),
              CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("idcg_q"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_q"), lit(0L)).as("dcg_q"), col("idcg_q"),
        when(col("idcg_q") > 0,
          coalesce(col("dcg_q"), lit(0L)).cast("double") /
            col("idcg_q").cast("double"))
          .otherwise(lit(null).cast("double")).as("ndcg"))
  }
}
