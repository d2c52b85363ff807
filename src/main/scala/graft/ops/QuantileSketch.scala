package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable per-key QUANTILE state — the percentile member of the
  * incremental-maintenance family ([[IncrementalAgg]] rollups, the
  * HLL distinct fold, the CMS heavy-hitter stream): a fixed-width
  * integer histogram over the value in cents,
  *
  *   state row = (keys…, bucket, cnt)   with bucket = cents div W,
  *
  * merged by per-(key, bucket) count addition — associative,
  * commutative, and EXACT, so `merge(summarize(A), summarize(B)) ≡
  * summarize(A ∪ B)` bit-for-bit under any batch arrival order (the
  * t-digest idea with FIXED centroids: giving up adaptive bucket
  * placement buys exact mergeability and cross-engine provability —
  * both registry entries are hash-green against a DuckDB recompute,
  * not rows-only).
  *
  * Quantile read ([[quantiles]]): est(p) = upper bound of the first
  * bucket whose cumulative count reaches ⌈n·p/100⌉ — the bucket of
  * the TRUE rank-⌈n·p/100⌉ element, so the estimate is within one
  * bucket width above the exact quantile: exact_p ≤ est(p) <
  * exact_p + W (QuantileSketchSpec pins the bound against exact
  * order statistics). Rank targets use integer percents and integer
  * cross-multiplication (`cum·100 ≥ n·pct`), so no float touches the
  * pipeline anywhere.
  *
  * Domain: values are non-negative money-scaled decimals (cents fit
  * BIGINT); `div` truncation ≡ DuckDB `//` floor only on that
  * non-negative domain, same constraint as every md5/bucket helper.
  *
  * Scale shape (100 TB): state is ≤ (value range / W) rows per key —
  * bounded by data shape, not history length; each maintenance tick
  * is one map-side-combined scan of the delta plus a (key, bucket)-
  * keyed merge, history never re-read. The quantile read's window
  * partitions by key (per-key bucket lists are small), and the
  * percent fan-out is a literal-array explode. Narrower W trades
  * state rows for accuracy — the resolution knob, like lgK on the
  * HLL fold. */
object QuantileSketch {

  /** Partial-aggregate histogram of one batch: one row per
    * (key, bucket) touched. cents(v) = v as DECIMAL(18,2) · 100 —
    * exact BIGINT for money-shaped doubles (the Exact.dec2 pattern). */
  def summarize(df: DataFrame, keys: Seq[String], valCol: String,
      widthCents: Long): DataFrame = {
    require(widthCents > 0, s"widthCents must be > 0, got $widthCents")
    // FLOOR division, not Spark's truncate-toward-zero `div`: DuckDB's
    // `//` floors, so negative cents would land one bucket apart under
    // plain `div`. pmod is non-negative, so (c - pmod(c, W)) is the
    // largest multiple of W ≤ c and the `div` that follows is exact —
    // identical to `div` on the non-negative domain (existing states
    // unchanged) and to `//` on every sign.
    val bucket: Column = expr(
      s"(CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT) " +
        s"- pmod(CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT)," +
        s" ${widthCents}L)) div ${widthCents}L")
    df.select(keys.map(col) :+ bucket.as("bucket"): _*)
      // a null value (or a DECIMAL(18,2) overflow returning null in
      // non-ANSI mode) must not enter the state: engines disagree on
      // null ORDER BY placement (Spark nulls-first vs DuckDB
      // nulls-last), which would shift every cumulative count in the
      // read-side window — nulls carry no quantile signal anyway
      .filter(col("bucket").isNotNull)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two histogram states: per-(key, bucket) count addition. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String])
      : DataFrame = mergeAll(Seq(state, delta), keys)

  /** N-way [[merge]] as ONE aggregation: union every state, one
    * (key, bucket) groupBy. Count addition is associative, so this is
    * ≡ `states.reduce(merge)` — which planned k−1 CHAINED shuffled
    * aggregations for k states (guide §2.4: one exchange where the
    * fold needs one). The pairwise form stays the streaming seam
    * (state + delta is its real shape); this is the batch fold. */
  def mergeAll(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAll needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Read-side quantile estimates: one row per (key, pct) with
    * `est_cents` = the upper bound of the first bucket whose
    * cumulative count reaches ⌈n·pct/100⌉. `widthCents` must be the
    * width the state was summarized with (a property of the state,
    * threaded alongside the table like the keys are). Pure integer
    * arithmetic end to end. */
  def quantiles(state: DataFrame, keys: Seq[String], pcts: Seq[Int],
      widthCents: Long): DataFrame = {
    require(widthCents > 0, s"widthCents must be > 0, got $widthCents")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in [1,100], got $pcts")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
    // per-key total as an UNBOUNDED window over the same partitioning,
    // not an aggregate joined back: the join referenced `state` twice,
    // and for the batch entries `state` is the whole slice-summary
    // merge chain — it computed twice per call (r21 plan audit). Same
    // values (Σ cnt per key), one shuffle, no self-join.
    val wAll = Window.partitionBy(keys.map(col): _*)
    state.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("pct", explode(array(pcts.map(lit): _*)))
      .filter(col("cum") * 100 >= col("n") * col("pct"))
      .groupBy((keys :+ "pct").map(col): _*)
      .agg(min(col("bucket")).as("__bstar"))
      .withColumn("est_cents",
        (col("__bstar") + 1) * widthCents - 1)
      .drop("__bstar")
  }
}
