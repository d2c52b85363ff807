package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT ≤2-deletion neighborhood
  * of a fixed-length window — [[graft.ops.FuzzyJoin]]'s SymSpell
  * signature set as one per-row kernel.
  *
  * Why a custom Expression: the r20 shape materialized signatures via
  * a broadcast (i, j) mask cross join and then `dropDuplicates(id,
  * sig)` per side — a full SHUFFLE of the ~C(len,≤2)×rows signature
  * stream on each side of the join, paid only to dedup WITHIN each
  * row (leading-repeat windows emit duplicate signatures under
  * different masks). The dedup is row-local by construction, so this
  * kernel emits each row's distinct signature set directly — the two
  * pre-join exchanges disappear from the plan, which is exactly the
  * §2.4 "remove shuffles outright" case (and at 100 TB those were the
  * two largest exchanges of the fuzzy-join plan).
  *
  * Output parity: exactly the mask-join expression's values —
  * signature (0,0) = w, (0,j) = w minus char j, (i,j) = w minus chars
  * i and j (1-based code-point positions, the same `substring`
  * arithmetic via `UTF8String.substringSQL`), deduplicated. Order
  * within the array is mask order (first occurrence wins), which is
  * immaterial: the consumer explodes into a join key. Null window →
  * null (UnaryExpression default; the caller filters short strings
  * before windowing, as before).
  */
case class DeletionSignatures(child: Expression, len: Int)
    extends UnaryExpression {

  require(len >= 1, s"del_signatures needs len >= 1, got $len")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"del_signatures requires string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(DeletionSignatures
      .signatures(input.asInstanceOf[UTF8String], len)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("sigs")
      s"""
         |Object[] $out = graft.functions.DeletionSignatures.signatures($a, $len);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : DeletionSignatures = copy(child = newChild)
}

object DeletionSignatures {

  /** Distinct deletion signatures of `w` in mask order
    * ((0,0), (0,1..len), (i,j) i<j). Called from generated code. */
  def signatures(w: UTF8String, len: Int): Array[AnyRef] = {
    val seen = new java.util.LinkedHashSet[UTF8String]()
    seen.add(w)
    // (0, j): delete char j — concat(substr(1, j-1), substr(j+1, len))
    var j = 1
    while (j <= len) {
      seen.add(UTF8String.concat(
        w.substringSQL(1, j - 1), w.substringSQL(j + 1, len)))
      j += 1
    }
    // (i, j), i < j: delete chars i and j
    var i = 1
    while (i <= len) {
      j = i + 1
      while (j <= len) {
        seen.add(UTF8String.concat(
          w.substringSQL(1, i - 1),
          w.substringSQL(i + 1, j - i - 1),
          w.substringSQL(j + 1, len)))
        j += 1
      }
      i += 1
    }
    seen.toArray(new Array[AnyRef](seen.size))
  }

  /** Column-API entry point: `del_signatures(window, len)`. */
  def del_signatures(window: Column, len: Int): Column =
    GraftSqlShim.toColumn(
      DeletionSignatures(GraftSqlShim.toExpression(window), len))
}
