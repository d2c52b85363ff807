package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC composition of a string column — the canonical-form
  * step of multilingual text normalization (a decomposed `e` +
  * U+0301 combining acute and a precomposed `é` must canonicalize,
  * tokenize, and count identically, or near-dup/dedup keys split on
  * encoding accidents).
  *
  * Why an Expression and not a UDF (SURVEY.md §7.3 escalation path):
  * Spark has no built-in Unicode-normalization function, and this
  * sits on the same every-document scan as the canonicalizer. The
  * fast path below skips the (allocating) `java.text.Normalizer` call
  * entirely for ASCII-only strings — the overwhelming majority of a
  * web corpus — via a byte scan on the UTF8String, and stays inside
  * whole-stage codegen either way.
  *
  * NFC is a Unicode-standard algorithm, so the DuckDB oracle's
  * `nfc_normalize` reproduces it byte-for-byte (pinned by the
  * `text_normalize_uni` conformance entry).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-compose; ASCII input (every byte < 0x80) is returned as-is —
    * ASCII is closed under NFC, so the scan is the only cost on the
    * common path. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { // a non-ASCII byte: take the slow path
        val str = s.toString
        // isNormalized is a cheap verification pass that usually avoids
        // the allocating full normalize for already-composed text
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }

  /** Column-API entry point: `nfc_normalize(text)`. */
  def nfc_normalize(text: Column): Column =
    GraftSqlShim.toColumn(NfcNormalize(GraftSqlShim.toExpression(text)))
}
