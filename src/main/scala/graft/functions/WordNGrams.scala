package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: space-joined word n-grams of an
  * array<string> token column.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation path): the
  * composable form
  * `transform(sequence(0, greatest(size(ts)-n, 0)), i -> concat_ws(' ', slice(ts, i+1, n)))`
  * interprets two lambdas and allocates a slice per output gram — and
  * it sits on the hottest scan of the dedup pipeline (every document,
  * every token, before MinHash/SimHash/Jaccard). This expression emits
  * one fused loop via `doGenCode`, keeping shingle construction inside
  * whole-stage codegen.
  *
  * Output is EXACTLY the composable form's, including its edge cases:
  * one gram per i in 0..max(size-n, 0) (so a doc shorter than n tokens
  * yields its single partial gram, and an empty array yields one empty
  * string — callers filter empties), grams joined with a single space,
  * null ELEMENTS skipped by the join (concat_ws semantics). Null input
  * array → null (UnaryExpression default).
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"word_ngrams needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires array<string> input, got ${other.simpleString}")
    }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val size = arr.numElements()
    val m = math.max(size - n, 0)
    val out = new Array[AnyRef](m + 1)
    var i = 0
    while (i <= m) {
      val hi = math.min(i + n, size)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    // Array[Any] binds GenericArrayData's primary constructor; the
    // Array[AnyRef] view would fall to the `Any` catch-all and copy
    // the array twice per interpreted evaluation
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep,
        classOf[UTF8String].getName)
      val size = ctx.freshName("size")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val hi = ctx.freshName("hi")
      val parts = ctx.freshName("parts")
      val j = ctx.freshName("j")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $size = $a.numElements();
         |int $m = java.lang.Math.max($size - $n, 0);
         |Object[] $out = new Object[$m + 1];
         |for (int $i = 0; $i <= $m; $i++) {
         |  int $hi = java.lang.Math.min($i + $n, $size);
         |  $utf8[] $parts = new $utf8[$hi - $i];
         |  for (int $j = $i; $j < $hi; $j++) {
         |    $parts[$j - $i] = $a.isNullAt($j) ? null : $a.getUTF8String($j);
         |  }
         |  $out[$i] = $utf8.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** Column-API entry point: `word_ngrams(tokens, n)`. */
  def word_ngrams(tokens: Column, n: Int): Column =
    GraftSqlShim.toColumn(WordNGrams(GraftSqlShim.toExpression(tokens), n))
}
