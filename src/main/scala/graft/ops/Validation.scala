package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the expectations gate a
  * pipeline runs before publishing a table: each rule is a boolean
  * Column over one row; the report is one aggregation pass however
  * many rules are checked (rules become conditional sums inside a
  * single two-phase agg — no per-rule job, no second scan).
  */
object Validation {

  /** A named per-row expectation. */
  final case class Rule(name: String, predicate: Column)

  private val SafeName = "^[A-Za-z][A-Za-z0-9_]*$".r

  /** One row per rule: (rule, n_rows, n_pass, n_fail, pass_frac).
    * NULL predicate results count as FAILURES (an expectation that
    * cannot be evaluated is not met — the conservative gate); an
    * EMPTY input reports 0 passes, not NULL, so `n_fail > 0` style
    * gates stay well-defined. Rule names are identifiers (they pass
    * through a generated stack() expression — reject metacharacters
    * and the internal alias instead of interpolating them). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    rules.foreach(r => require(
      SafeName.matches(r.name) && r.name != "__n",
      s"rule name '${r.name}' must be a plain identifier (it is " +
        "embedded in a generated expression)"))
    val aggs = rules.map(r =>
      coalesce(
        sum(when(coalesce(r.predicate, lit(false)), 1L).otherwise(0L)),
        lit(0L)).as(r.name))
    val allAggs = count(lit(1)).as("__n") +: aggs
    val counted = df.agg(allAggs.head, allAggs.tail: _*)
    // unpivot via stack: (name, n_pass) pairs from the one agg row
    val stackExpr = rules.map(r => s"'${r.name}', `${r.name}`")
      .mkString(s"stack(${rules.size}, ", ", ", ")")
    counted.select(col("__n"),
        expr(s"$stackExpr AS (rule, n_pass)"))
      .select(col("rule"), col("__n").as("n_rows"), col("n_pass"),
        (col("__n") - col("n_pass")).as("n_fail"),
        (col("n_pass").cast("double") / col("__n")).as("pass_frac"))
  }

  /** Column profile — the "describe this table" every warehouse
    * publishes next to a dataset: per column, null count, exact
    * distinct count, and min/max (computed on the NATIVE type, cast
    * to string only for the long-format output — never lexicographic
    * min over numbers). ONE aggregation pass however many columns
    * (the distinct aggregates plan as a single Expand ×(k+1) over one
    * scan — k passes of data expansion, not k jobs; at petabyte scale
    * swap `countDistinct` for `approx_count_distinct` if the expand
    * dominates — same plan shape, sketched counts).
    *
    * Output: (col_name, n_rows, n_nulls, n_distinct, min_value,
    * max_value). String renderings of int/string/date values are
    * engine-portable; float columns profile fine but their string
    * forms are engine-specific — keep them out of cross-engine
    * comparisons. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns")
    cols.foreach(c => require(SafeName.matches(c),
      s"column name '$c' must be a plain identifier (it is embedded " +
        "in a generated expression)"))
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
        s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(col("__n"), expr(s"$stackExpr AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
