package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit hash of every word n-gram of an
  * array<string> token column, aligned with [[WordNGrams]] — out[i]
  * hashes exactly the token window WordNGrams joins into gram i (one
  * hash per i in 0..max(size-n, 0)).
  *
  * Purpose (guide §2.3 "shuffle keys and metadata instead of
  * payloads", §4 expression cost): the passage-dedup prefilter only
  * needs to COUNT gram occurrences by key — materializing the gram
  * STRING (k-token concat per position: ~12× the corpus bytes in
  * allocations) just to hash it makes the hash pass as expensive as
  * the exact pass. This kernel folds per-token XXH64 values into a
  * rolling polynomial (h = h·P + xxh64(token)), touching each token
  * once per position window with ZERO allocation beyond the output
  * array.
  *
  * Equality contract: equal token windows ⟹ equal hashes (the
  * prefilter can never LOSE a true duplicate); collisions only add
  * phase-2 candidates, so callers confirming on the exact gram remain
  * exact. The hash is NOT comparable to `xxhash64(gram_string)` — it
  * is an internal key, never an output.
  *
  * Null tokens hash as a fixed sentinel (WordNGrams' concatWs SKIPS
  * nulls, so a null-bearing window could collide with its null-free
  * projection — again only a phase-2 candidate, never a miss, because
  * equal windows still hash equal). Null input array → null.
  */
case class HashedWordNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"hashed_word_ngrams needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_word_ngrams requires array<string> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(HashedWordNGrams.hashes(arr, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.HashedWordNGrams.hashes($a, $n);
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedWordNGrams =
    copy(child = newChild)
}

object HashedWordNGrams {

  /** Polynomial multiplier (odd 64-bit golden-ratio constant — good
    * wrap-around mixing) and the per-token XXH64 seed. */
  private val P = 0x9e3779b97f4a7c15L
  private val Seed = 42L
  private val NullTokenHash = 0x27d4eb2f165667c5L

  /** One hash per window start, windows clamped at the array end like
    * [[WordNGrams]] (the final window of a short array is partial).
    * Shared by interpreted eval and generated code. */
  def hashes(arr: ArrayData, n: Int): Array[Long] = {
    val size = arr.numElements()
    val m = math.max(size - n, 0)
    // per-token hashes once (each token participates in up to n windows)
    val th = new Array[Long](size)
    var j = 0
    while (j < size) {
      th(j) =
        if (arr.isNullAt(j)) NullTokenHash
        else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      j += 1
    }
    val out = new Array[Long](m + 1)
    var i = 0
    while (i <= m) {
      val hi = math.min(i + n, size)
      var h = 1L
      var k = i
      while (k < hi) {
        h = h * P + th(k)
        k += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Column-API entry point: `hashed_word_ngrams(tokens, n)`. */
  def hashed_word_ngrams(tokens: Column, n: Int): Column =
    GraftSqlShim.toColumn(
      HashedWordNGrams(GraftSqlShim.toExpression(tokens), n))
}
