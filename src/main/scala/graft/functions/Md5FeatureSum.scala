package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the hashed-linear-classifier feature sum
  * of [[graft.text.LinearClassifier]] as ONE fused loop.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation path, same
  * rationale as [[WordNGrams]]): the composable form
  * `aggregate(transform(ts, t -> conv(substring(md5(concat(salt, t)), 1, 4), 16, 10) % D * 2654435761 % 4001 - 2000), 0, (a, x) -> a + x)`
  * interprets two lambdas per document and, per FEATURE, allocates a
  * concat buffer, a 32-char hex string, a 4-char substring and a
  * base-16 parse — and it sits on the corpus-gate scan of the curation
  * pipelines (the r21 job profile attributed 6.7 s of
  * pipeline_curate_v3_build to this one projection). This expression
  * computes the identical arithmetic from the raw md5 DIGEST bytes
  * (the first 4 hex digits of md5 ARE the first two digest bytes, so
  * `conv(substring(hex, 1, 4), 16, 10)` ≡ `(d0 << 8) | d1`) with one
  * reused MessageDigest and zero per-feature allocation.
  *
  * Bit parity with the composable form — including its null edges
  * (null array → null, matching `transform`/`aggregate`; null ELEMENT
  * → null sum through `acc + null`; bigram over fewer than 2 tokens →
  * 0) — is pinned in FunctionsSpec. The `when(size >= 2, …)
  * .otherwise(0)` null-ARRAY guard of the composable bigram form lives
  * in [[graft.text.LinearClassifier.biScore]]'s wrapper, not here.
  *
  * `bigram = false`: Σ_t weight(md5(salt ‖ t)).
  * `bigram = true`:  Σ_i weight(md5(salt ‖ t_i ‖ ' ' ‖ t_{i+1})), 0
  * when the array has fewer than 2 elements.
  */
case class Md5FeatureSum(child: Expression, salt: String, mod: Int,
    bigram: Boolean) extends UnaryExpression {

  require(mod > 0, s"md5_feature_sum needs mod > 0, got $mod")

  override def dataType: DataType = LongType

  // a null ELEMENT nulls the sum even when the input array is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_feature_sum requires array<string> input, got ${other.simpleString}")
    }

  private val saltBytes = salt.getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = Md5FeatureSum.digest()
    if (bigram) Md5FeatureSum.biSum(arr, md, saltBytes, mod)
    else Md5FeatureSum.uniSum(arr, md, saltBytes, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val saltRef = ctx.addReferenceObj("saltBytes", saltBytes, "byte[]")
      val md = ctx.addMutableState("java.security.MessageDigest", "md5fsMd",
        v => s"$v = graft.functions.Md5FeatureSum.digest();")
      val fn = if (bigram) "biSum" else "uniSum"
      val boxed = ctx.freshName("boxed")
      s"""
         |Long $boxed = graft.functions.Md5FeatureSum.$fn($a, $md, $saltRef, $mod);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5FeatureSum =
    copy(child = newChild)
}

object Md5FeatureSum {

  def digest(): MessageDigest = MessageDigest.getInstance("MD5")

  private val Space = ' '.toByte

  /** weight of one digest: first two md5 bytes as an int (≡ the first
    * 4 hex digits base-16-parsed, always non-negative), bucketed mod
    * `mod`, Knuth-mixed into [-2000, 2000] — exactly
    * [[graft.text.LinearClassifier]]'s frozen table. */
  private def weight(dg: Array[Byte], mod: Int): Long = {
    val bucket = (((dg(0) & 0xff) << 8) | (dg(1) & 0xff)) % mod
    bucket.toLong * 2654435761L % 4001L - 2000L
  }

  /** Null-element-aware unigram sum; null result ≡ the composable
    * form's `acc + null` poisoning. Called from generated code. */
  def uniSum(arr: ArrayData, md: MessageDigest, salt: Array[Byte],
      mod: Int): java.lang.Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      md.reset()
      md.update(salt)
      md.update(arr.getUTF8String(i).getBytes)
      sum += weight(md.digest(), mod)
      i += 1
    }
    sum
  }

  /** Bigram sum; fewer than 2 elements → 0 (the `when(n >= 2, …)`
    * short-circuit of the composable form). Called from generated
    * code. */
  def biSum(arr: ArrayData, md: MessageDigest, salt: Array[Byte],
      mod: Int): java.lang.Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    if (arr.isNullAt(0)) return null
    var sum = 0L
    var i = 0
    // bytes of token i+1 are reused as the left side of window i+1
    var right: Array[Byte] = arr.getUTF8String(0).getBytes
    while (i < n - 1) {
      if (arr.isNullAt(i + 1)) return null
      val left = right
      right = arr.getUTF8String(i + 1).getBytes
      md.reset()
      md.update(salt)
      md.update(left)
      md.update(Space)
      md.update(right)
      sum += weight(md.digest(), mod)
      i += 1
    }
    sum
  }

  /** Column-API entry points. */
  def uni(tokens: Column, salt: String, mod: Int): Column =
    GraftSqlShim.toColumn(
      Md5FeatureSum(GraftSqlShim.toExpression(tokens), salt, mod,
        bigram = false))

  def bi(tokens: Column, salt: String, mod: Int): Column =
    GraftSqlShim.toColumn(
      Md5FeatureSum(GraftSqlShim.toExpression(tokens), salt, mod,
        bigram = true))
}
