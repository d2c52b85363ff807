package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-8 bytes: find which of N fixed
  * patterns occur as substrings of a text in ONE pass, O(len + hits),
  * independent of N.
  *
  * Built once per deserialized expression (one per executor, not per
  * row or per task batch); the trie is byte-keyed, so matching is
  * exactly byte-substring containment — the same predicate as
  * `contains()` on UTF-8 in Spark AND DuckDB, which keeps the
  * composable form and the oracle bit-identical.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everything")

  // Compact trie: children as per-node HashMap (node count = total
  // pattern bytes in the worst case; a 256-wide array per node would
  // be ~1 KB/node — prohibitive at 10⁴ patterns).
  @transient private lazy val (children, fail, out) = build()

  private def build(): (Array[java.util.HashMap[Integer, Integer]],
      Array[Int], Array[Array[Int]]) = {
    val ch = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Integer, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    patterns.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.getBytes("UTF-8").foreach { b =>
        val k = b & 0xff
        val next = ch(node).get(k)
        node = if (next != null) next.intValue()
        else {
          ch += new java.util.HashMap[Integer, Integer]()
          outB += Nil
          ch(node).put(k, ch.size - 1)
          ch.size - 1
        }
      }
      outB(node) = id :: outB(node)
    }
    val failB = new Array[Int](ch.size)
    val queue = new java.util.ArrayDeque[Integer]()
    ch(0).forEach((_, v) => { failB(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      ch(u).forEach { (k, v) =>
        var f = failB(u)
        while (f != 0 && ch(f).get(k) == null) f = failB(f)
        val t = ch(f).get(k)
        failB(v) = if (t != null && t.intValue() != v.intValue())
          t.intValue() else 0
        outB(v) = outB(v) ++ outB(failB(v))
        queue.add(v)
      }
    }
    (ch.toArray, failB, outB.map(_.toArray).toArray)
  }

  private val utf8Patterns = patterns.map(UTF8String.fromString)

  /** Distinct patterns present in `text`, in pattern-id order — the
    * same value as `filter(patterns, p -> contains(text, p))`. */
  def matchesIn(text: UTF8String): GenericArrayData = {
    val found = new Array[Boolean](patterns.length)
    var nFound = 0
    val bytes = text.getBytes
    var state = 0
    var i = 0
    while (i < bytes.length && nFound < patterns.length) {
      val k = bytes(i) & 0xff
      var next = children(state).get(k)
      while (next == null && state != 0) {
        state = fail(state)
        next = children(state).get(k)
      }
      state = if (next != null) next.intValue() else 0
      val hits = out(state)
      var h = 0
      while (h < hits.length) {
        if (!found(hits(h))) { found(hits(h)) = true; nFound += 1 }
        h += 1
      }
      i += 1
    }
    val res = new Array[Any](nFound)
    var (p, w) = (0, 0)
    while (p < found.length) {
      if (found(p)) { res(w) = utf8Patterns(p); w += 1 }
      p += 1
    }
    new GenericArrayData(res)
  }
}

/** Native Catalyst expression: `multi_match(text, patterns)` — the
  * patterns (a fixed blocklist / canary list) found in `text`, in
  * pattern order.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation path): the
  * composable form `filter(array(ps), p -> contains(text, p))` runs
  * N independent substring scans per document — O(len · N). Blocklist
  * filtering at curation scale carries thousands of phrases, where
  * the one-pass automaton's O(len + hits) wins and keeps winning as N
  * grows (measured over sf0.01 documents, median of 3: 520 phrases
  * 0.24 s → 0.13 s; 5000 phrases 1.13 s → 0.20 s — the automaton is
  * near-flat in N, the scan chain linear).
  * Output is EXACTLY the composable form's (byte-substring semantics,
  * pattern order, distinct) — pinned by a bit-parity spec — so the
  * DuckDB oracle stays `list_filter(ps, p -> contains(text, p))`.
  * Null text → null (UnaryExpression default).
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_match requires string input, got ${other.simpleString}")
    }

  @transient private lazy val automaton =
    new AhoCorasick(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.matchesIn(input.asInstanceOf[UTF8String])

  // The automaton rides whole-stage codegen as a referenced object —
  // one virtual call per row, the same shape Spark's own regexp
  // expressions use for their compiled Pattern.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ac = ctx.addReferenceObj("automaton", automaton,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $ac.matchesIn($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {
  /** Column-API entry point: `multi_match(text, patterns)`. */
  def multi_match(text: Column, patterns: Seq[String]): Column =
    GraftSqlShim.toColumn(
      MultiMatch(GraftSqlShim.toExpression(text), patterns))
}
