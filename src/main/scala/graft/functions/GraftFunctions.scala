package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom expressions.
  *
  * Two entry points:
  *   - [[registerAll]] — register on a live session (temp functions);
  *   - [[GraftExtensions]] — `SparkSessionExtensions` injector for
  *     cluster deploys (`spark.sql.extensions=graft.functions.GraftExtensions`),
  *     the standard way a library ships Catalyst additions.
  */
object GraftFunctions {

  private def arrayDotBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "array_dot(a, b) takes two arguments")
    ArrayDotProduct(exprs.head, exprs(1))
  }

  /** Make `array_dot` callable from SQL on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", arrayDotBuilder, "built-in")

  val arrayDotInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDotProduct].getCanonicalName, null, "array_dot",
    "_FUNC_(a, b) - sequential dot product of two array<double> columns",
    "", "", "", "", "", "", "scala_udf")
}

/** `spark.sql.extensions` injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((FunctionIdentifier("array_dot"),
      GraftFunctions.arrayDotInfo,
      exprs => ArrayDotProduct(exprs.head, exprs(1))))
}
