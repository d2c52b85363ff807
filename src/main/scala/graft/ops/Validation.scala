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
}
