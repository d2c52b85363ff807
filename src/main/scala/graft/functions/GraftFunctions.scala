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

  private[graft] def arrayDotI8Builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "array_dot_i8(a, b) takes two arguments")
    ArrayDotI8(exprs.head, exprs(1))
  }

  private[graft] def wordNGramsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "word_ngrams(tokens, n) takes two arguments")
    // n must be statically known (it is baked into generated code) but
    // any foldable integral expression qualifies — `1 + 2`, `CAST(3 AS
    // INT)`, a 3L literal — not just a bare int literal.
    val nExpr = exprs(1)
    val n =
      if (nExpr.foldable) nExpr.eval() match {
        case i: Int  => i
        case l: Long => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"word_ngrams: n must be integral, got $other")
      }
      else throw new IllegalArgumentException(
        s"word_ngrams: n must be a constant, got $nExpr")
    WordNGrams(exprs.head, n)
  }

  private[graft] def arrayAdcSumBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "array_adc_sum(codes, lut) takes two arguments")
    ArrayAdcSum(exprs.head, exprs(1))
  }

  private[graft] def nfcNormalizeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "nfc_normalize(text) takes one argument")
    NfcNormalize(exprs.head)
  }

  private[graft] def multiMatchBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "multi_match(text, patterns) takes two arguments")
    // patterns are baked into the automaton, so they must be a
    // constant — any foldable array<string> expression qualifies
    val pExpr = exprs(1)
    require(pExpr.foldable,
      s"multi_match: patterns must be a constant array, got $pExpr")
    val patterns = pExpr.eval() match {
      case null => throw new IllegalArgumentException(
        "multi_match: patterns must be a non-null constant array<string>")
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val u = a.getUTF8String(i)
          if (u == null) throw new IllegalArgumentException(
            "multi_match: patterns must not contain NULL elements")
          u.toString
        }
      case other => throw new IllegalArgumentException(
        s"multi_match: patterns must be array<string>, got $other")
    }
    MultiMatch(exprs.head, patterns)
  }

  /** Make the custom expressions callable from SQL on a live session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", arrayDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", wordNGramsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot_i8", arrayDotI8Builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", nfcNormalizeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_match", multiMatchBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_adc_sum", arrayAdcSumBuilder, "built-in")
  }

  val arrayDotInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDotProduct].getCanonicalName, null, "array_dot",
    "_FUNC_(a, b) - sequential dot product of two array<double> columns",
    "", "", "", "", "", "", "scala_udf")

  val wordNGramsInfo: ExpressionInfo = new ExpressionInfo(
    classOf[WordNGrams].getCanonicalName, null, "word_ngrams",
    "_FUNC_(tokens, n) - space-joined word n-grams of an array<string> column",
    "", "", "", "", "", "", "scala_udf")

  val arrayDotI8Info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDotI8].getCanonicalName, null, "array_dot_i8",
    "_FUNC_(a, b) - integer dot product of two array<tinyint> columns",
    "", "", "", "", "", "", "scala_udf")

  val nfcNormalizeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, null, "nfc_normalize",
    "_FUNC_(text) - Unicode NFC composition of a string column",
    "", "", "", "", "", "", "scala_udf")

  val arrayAdcSumInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayAdcSum].getCanonicalName, null, "array_adc_sum",
    "_FUNC_(codes, lut) - PQ asymmetric-distance sum " +
      "SUM_j lut[j][codes[j]] over array<tinyint|smallint> codes and " +
      "array<array<double|bigint>> lut",
    "", "", "", "", "", "", "scala_udf")

  val multiMatchInfo: ExpressionInfo = new ExpressionInfo(
    classOf[MultiMatch].getCanonicalName, null, "multi_match",
    "_FUNC_(text, patterns) - the constant patterns found in text " +
      "(Aho-Corasick, one pass)",
    "", "", "", "", "", "", "scala_udf")
}

/** `spark.sql.extensions` injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("array_dot"),
      GraftFunctions.arrayDotInfo,
      exprs => ArrayDotProduct(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("word_ngrams"),
      GraftFunctions.wordNGramsInfo,
      GraftFunctions.wordNGramsBuilder))
    e.injectFunction((FunctionIdentifier("array_dot_i8"),
      GraftFunctions.arrayDotI8Info,
      GraftFunctions.arrayDotI8Builder))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      GraftFunctions.nfcNormalizeInfo,
      GraftFunctions.nfcNormalizeBuilder))
    e.injectFunction((FunctionIdentifier("multi_match"),
      GraftFunctions.multiMatchInfo,
      GraftFunctions.multiMatchBuilder))
    e.injectFunction((FunctionIdentifier("array_adc_sum"),
      GraftFunctions.arrayAdcSumInfo,
      GraftFunctions.arrayAdcSumBuilder))
  }
}
