package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: [[graft.text.Bpe]]'s pinned-merge BPE
  * tokenizer as ONE fused per-row kernel.
  *
  * Why a custom Expression (SURVEY.md §7.3, same escalation as
  * [[WordNGrams]]/[[Md5FeatureSum]]): the composable form is a chain of
  * `replace` calls over a separator-framed string — per document it
  * allocates ~3×|text| characters per MERGE RANK (48 full-string
  * rebuilds after the per-char regexp explode), and it sits on every
  * token-budget scan (text_tokens, text_tokens_bpe, vocab_bpe_*,
  * samp_mixture_bpe, curate v7's prompt/completion budgets).
  *
  * This kernel exploits the framing mechanics documented in
  * [[graft.text.Bpe.tokens]]: in the `S t1 S S t2 S S …` encoding, the
  * global leftmost-non-overlapping `replace(S x S S y S → S x y S)` of
  * rank k is EXACTLY "scan the token list left to right; whenever
  * t[i] = x and t[i+1] = y, fuse them and continue from t[i+2]" — the
  * replacement's output is never rescanned within the pass (string
  * replace searches the SOURCE), and separators cannot occur inside
  * tokens (stripped first). Because merges only ever fuse ADJACENT
  * tokens, every intermediate token is a contiguous substring of the
  * lowered/stripped input — so the whole apply loop runs over (offset,
  * length) pairs with zero string allocation; only the surviving output
  * tokens are materialized.
  *
  * Step-for-step parity with the composable form:
  *   1. `lower(c)` → `UTF8String.toLowerCase` (the same call Spark's
  *      `Lower` makes);
  *   2. `replace(·, S, '')` → the same `UTF8String.replace`;
  *   3. `regexp_replace(·, '(?s)(.)', '$1SS')` frames one token per
  *      CODE POINT (Java regex `.` is code-point-aware; UTF-8 code
  *      point boundaries are bytes with `(b & 0xC0) != 0x80`);
  *   4. one scan per merge rank as above;
  *   5. `filter(split(trim(·, S), SS), t -> t <> '' AND t <> ' ')` →
  *      drop empty and single-space tokens (empty text yields the
  *      empty array either way).
  * Bit parity against the replace-chain form over the real corpus plus
  * adversarial shapes (sentinel bytes, surrogate pairs, newlines,
  * repeated operands) is pinned in FunctionsSpec; BpeSpec's
  * classic-loop equivalence suite continues to hold over this kernel
  * because the output is identical.
  *
  * Null input → null (UnaryExpression default), like the composable
  * chain (every step is null-propagating).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires string input, got ${other.simpleString}")
    }

  /** Merge operands as UTF-8 bytes, resolved once per expression. */
  @transient private lazy val table: BpeEncode.MergeTable =
    new BpeEncode.MergeTable(merges)

  override def nullSafeEval(input: Any): Any = {
    val toks = BpeEncode.encode(input.asInstanceOf[UTF8String], table)
    new GenericArrayData(toks.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tableRef = ctx.addReferenceObj("mergeTable", table,
        classOf[BpeEncode.MergeTable].getName)
      val out = ctx.freshName("toks")
      s"""
         |Object[] $out = graft.functions.BpeEncode.encode($a, $tableRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  private val SepByte: Byte = 0x01

  /** Pre-resolved merge operands (UTF-8 bytes, rank order). Serializable:
    * shipped inside the expression to executors. */
  final class MergeTable(merges: Seq[(String, String)]) extends Serializable {
    val left: Array[Array[Byte]] =
      merges.map(_._1.getBytes("UTF-8")).toArray
    val right: Array[Array[Byte]] =
      merges.map(_._2.getBytes("UTF-8")).toArray
  }

  private def rangeEquals(b: Array[Byte], start: Int, len: Int,
      pat: Array[Byte]): Boolean = {
    if (len != pat.length) return false
    var i = 0
    while (i < len) {
      if (b(start + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** The fused tokenizer; returns the output token array (UTF8Strings).
    * Called from generated code. */
  def encode(input: UTF8String, table: MergeTable): Array[AnyRef] = {
    // steps 1+2: lowercase, strip the sentinel — the same UTF8String
    // calls the composable chain's Lower/StringReplace make
    var s = input.toLowerCase
    val sep = UTF8String.fromBytes(Array(SepByte))
    s = s.replace(sep, UTF8String.EMPTY_UTF8)
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new Array[AnyRef](0)
    // step 3: one token per code point — boundaries where the byte is
    // not a UTF-8 continuation byte
    var starts = new Array[Int](n + 1)
    var count = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(count) = i; count += 1 }
      i += 1
    }
    // degenerate non-UTF-8 content (continuation bytes only): the regex
    // framing would also produce no clean per-char split; fall back to
    // a single token covering everything, like one unmatchable char
    if (count == 0) { starts(0) = 0; count = 1 }
    starts(count) = n
    // token i = bytes[starts(i), ends(i)); merges fuse adjacent spans
    var ends = new Array[Int](count)
    i = 0
    while (i < count) { ends(i) = starts(i + 1); i += 1 }
    // step 4: one leftmost-non-overlapping pass per merge rank
    val nextStarts = new Array[Int](count)
    val nextEnds = new Array[Int](count)
    var r = 0
    val ranks = table.left.length
    while (r < ranks) {
      val x = table.left(r)
      val y = table.right(r)
      var read = 0
      var write = 0
      var changed = false
      while (read < count) {
        if (read + 1 < count &&
            rangeEquals(bytes, starts(read), ends(read) - starts(read), x) &&
            rangeEquals(bytes, starts(read + 1),
              ends(read + 1) - starts(read + 1), y)) {
          nextStarts(write) = starts(read)
          nextEnds(write) = ends(read + 1)
          read += 2
          changed = true
        } else {
          nextStarts(write) = starts(read)
          nextEnds(write) = ends(read)
          read += 1
        }
        write += 1
      }
      if (changed) {
        // swap buffers
        val ts = starts; val te = ends
        System.arraycopy(nextStarts, 0, ts, 0, write)
        System.arraycopy(nextEnds, 0, te, 0, write)
        count = write
      }
      r += 1
    }
    // step 5: materialize survivors, dropping '' and ' ' tokens ('' can
    // only arise from empty input, handled above; ' ' is the
    // un-mergeable space char)
    var kept = 0
    i = 0
    while (i < count) {
      val len = ends(i) - starts(i)
      if (!(len == 1 && bytes(starts(i)) == ' '.toByte)) kept += 1
      i += 1
    }
    val out = new Array[AnyRef](kept)
    var o = 0
    i = 0
    while (i < count) {
      val st = starts(i)
      val len = ends(i) - st
      if (!(len == 1 && bytes(st) == ' '.toByte)) {
        val tb = new Array[Byte](len)
        System.arraycopy(bytes, st, tb, 0, len)
        out(o) = UTF8String.fromBytes(tb)
        o += 1
      }
      i += 1
    }
    out
  }

  /** Column-API entry point mirroring [[graft.text.Bpe.tokens]]. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlShim.toColumn(
      BpeEncode(GraftSqlShim.toExpression(text), merges))
}
