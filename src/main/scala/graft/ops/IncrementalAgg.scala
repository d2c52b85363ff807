package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — keep a per-key summary table
  * current by MERGING a delta batch's partial aggregates into it,
  * never rescanning history (the materialized-view / daily-rollup
  * shape; reference analogue: the summary queries the reference's
  * dashboards re-run from scratch each day, e.g.
  * `knightshift/sql/templates` aggregate views).
  *
  * The state row per key is an associative-commutative summary:
  *
  *   n_rows   BIGINT         — count(*)
  *   sum_v    DECIMAL        — exact sum of the value column (decimal,
  *                             so merge order can never change a bit)
  *   min_v / max_v DECIMAL   — extrema of the value column
  *   min_d / max_d           — extrema of the event-time column
  *
  * Every component merges by (+ / min / max), so
  * `merge(summarize(A), summarize(B)) ≡ summarize(A ∪ B)` EXACTLY —
  * the registry entry hash-proves a three-way batch fold against a
  * full DuckDB recompute, and IncrementalAggSpec asserts the algebra
  * (associativity, commutativity, null-value batches) on synthetic
  * frames.
  *
  * Scale shape (100 TB): history is never re-read — each maintenance
  * tick costs one scan of the DELTA plus a merge against state keyed
  * identically (map-side partial aggregation on the delta first, so
  * the shuffle carries one row per delta KEY, not per delta row). At
  * warehouse scale the state table is bucketed by key (see
  * [[graft.sources.Bucketing]]) and the merge is exchange-free on the
  * state side; AQE coalesces the delta side. The averages and other
  * non-associative views are FINALIZED from state on read
  * ([[finalizeView]]), never stored, so state stays mergeable.
  */
object IncrementalAgg {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Partial-aggregate state of one batch: one row per key. */
  def summarize(df: DataFrame, keys: Seq[String], valCol: String,
      dateCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      // state keeps the sum at the WIDEST decimal (38,4): inputs are
      // (18,4) so Spark's sum yields (28,4); pinning to (38,4) keeps
      // the state schema stable across any number of merges WITHOUT
      // narrowing — a cast back to (18,4) would turn a per-key sum
      // >= 10^14 into a silent NULL in non-ANSI mode, permanently
      // corrupting state relative to a recompute. (38,4) overflows
      // only past 10^34 — unreachable even at 100 TB.
      sum(dec(col(valCol))).cast(DecimalType(38, 4)).as("sum_v"),
      min(dec(col(valCol))).as("min_v"),
      max(dec(col(valCol))).as("max_v"),
      min(col(dateCol)).as("min_d"),
      max(col(dateCol)).as("max_d"))

  /** Merge two state tables (either side may cover keys the other
    * lacks). Exact: counts add, decimal sums add, extrema fold —
    * every column's merge is associative and commutative, so any
    * batch arrival order converges to the same state. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String])
      : DataFrame = mergeAll(Seq(state, delta), keys)

  /** N-way [[merge]] as ONE aggregation: union every state, one
    * key-grouped fold. Every column's merge is associative, so this
    * is ≡ `states.reduce(merge)` — which planned k−1 CHAINED shuffled
    * aggregations for k states (guide §2.4). Pairwise merge stays the
    * streaming seam (state + delta); this is the batch fold. */
  def mergeAll(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAll needs at least one state")
    // sum over nullable partials skips nulls — matching a recompute
    // where the value column was null in one batch's rows
    states.reduce(_.unionByName(_)).groupBy(keys.map(col): _*).agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("sum_v")).cast(DecimalType(38, 4)).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"),
      min(col("min_d")).as("min_d"),
      max(col("max_d")).as("max_d"))
  }

  /** The read-side view: exact state surfaced as doubles plus the
    * derived (non-mergeable) average — one IEEE division per key, so
    * Spark and DuckDB agree bit-for-bit. */
  def finalizeView(state: DataFrame): DataFrame =
    state.select(
      state.columns.filterNot(Set("n_rows", "sum_v", "min_v", "max_v",
        "min_d", "max_d")).map(col) ++ Seq(
        col("n_rows"),
        col("sum_v").cast("double").as("sum_v"),
        col("min_v").cast("double").as("min_v"),
        col("max_v").cast("double").as("max_v"),
        (col("sum_v").cast("double") / col("n_rows")).as("avg_v"),
        col("min_d"),
        col("max_d")): _*)
}
