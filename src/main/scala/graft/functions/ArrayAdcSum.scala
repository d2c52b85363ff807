package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, LongType, ShortType}

/** Native Catalyst expression for the PQ asymmetric-distance (ADC)
  * accumulation: given per-row subspace codes and a query lookup
  * table, compute Σ_j LUT[j][code_j].
  *
  * Why a custom Expression: this is THE inner loop of PQ retrieval —
  * it runs once per (query, candidate) pair, i.e. |Q|·|corpus| times
  * per top-k. The composable form
  * `aggregate(zip_with(codes, lut, ...), ...)` is a higher-order
  * function pair that Spark evaluates INTERPRETED (lambda variables
  * block whole-stage codegen), allocating a zipped intermediate array
  * per pair; at sf1 that made trained PQ slower than exact brute
  * force (the whole point of ADC is to be cheaper than a float dot).
  * Here the m table lookups compile to one fused primitive loop with
  * zero allocation, same shape as [[ArrayDotI8]]'s kernel.
  *
  * Shapes: `codes` is `array<tinyint>` or `array<smallint>` (length
  * m); `lut` is either NESTED — `array<array<double|bigint>>`, one
  * row per subspace — or FLAT — `array<double|bigint>` of length
  * m·ksub laid out row-major, looked up as `lut[j·ksub + code_j]`.
  * The flat layout is the hot-path form: nested `ArrayData.getArray`
  * allocates a view object PER LOOKUP (8 allocations per scored
  * pair — measured still slower than the 64-mult exact dot at sf1),
  * while the flat form is pure offset reads into one Tungsten
  * buffer. The result type follows the LUT cell type, so the
  * production double path and the pinned bigint twin run the SAME
  * kernel.
  *
  * Null semantics mirror the HOF form it replaces
  * ([[graft.sim.Pq.adcSumExpr]]): null if either array is null;
  * `zip_with` length-pads with null and `acc + null` poisons the
  * fold, so a length mismatch (flat: length not a positive multiple
  * of m) or a null element yields null. Out-of-range codes are a
  * deliberate semantic LOOSENING vs the HOF form: the kernel returns
  * null for any code outside the LUT row (including negatives, where
  * `element_at` with index ≤ 0 would THROW, and overlarge codes,
  * `element_at`'s non-ANSI null) — never throws; in-contract inputs
  * always have codes inside the LUT row, where the two forms are
  * bit-identical (ArrayAdcSumSpec).
  */
case class ArrayAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val codesIsByte: Boolean = left.dataType match {
    case ArrayType(ByteType, _) => true
    case _ => false
  }

  private lazy val lutIsFlat: Boolean = right.dataType match {
    case ArrayType(ArrayType(_, _), _) => false
    case _ => true
  }

  override def dataType: DataType = right.dataType match {
    case ArrayType(ArrayType(et, _), _) => et
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(ByteType, _) | ArrayType(ShortType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case ArrayType(ArrayType(LongType, _), _) => true
      case ArrayType(DoubleType, _) | ArrayType(LongType, _) => true
      case _ => false
    }
    if (codesOk && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "array_adc_sum requires array<tinyint|smallint> codes and " +
        "array<array<double|bigint>> (nested) or array<double|bigint> " +
        "(flat, row-major m*ksub) lut, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val isDouble = dataType == DoubleType
    var sd = 0.0
    var sl = 0L
    if (lutIsFlat) {
      val n = lut.numElements()
      if (m <= 0 || n % m != 0) return null
      val ksub = n / m
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val c = if (codesIsByte) codes.getByte(j).toInt
                else codes.getShort(j).toInt
        if (c < 0 || c >= ksub) return null
        val idx = j * ksub + c
        if (lut.isNullAt(idx)) return null
        if (isDouble) sd += lut.getDouble(idx) else sl += lut.getLong(idx)
        j += 1
      }
    } else {
      if (m != lut.numElements()) return null
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j) || lut.isNullAt(j)) return null
        val c = if (codesIsByte) codes.getByte(j).toInt
                else codes.getShort(j).toInt
        val row = lut.getArray(j)
        if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
        if (isDouble) sd += row.getDouble(c) else sl += row.getLong(c)
        j += 1
      }
    }
    if (isDouble) sd else sl
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      val getCode =
        if (codesIsByte) s"(int) $a.getByte($j)"
        else s"(int) $a.getShort($j)"
      val (javaT, getLut, zero) =
        if (dataType == DoubleType) ("double", "getDouble", "0.0")
        else ("long", "getLong", "0L")
      if (lutIsFlat) {
        val ksub = ctx.freshName("ksub")
        val idx = ctx.freshName("idx")
        s"""
           |int $m = $a.numElements();
           |boolean $bad = $m <= 0 || $b.numElements() % $m != 0;
           |int $ksub = $bad ? 0 : $b.numElements() / $m;
           |$javaT $s = $zero;
           |for (int $j = 0; !$bad && $j < $m; $j++) {
           |  if ($a.isNullAt($j)) { $bad = true; break; }
           |  int $c = $getCode;
           |  if ($c < 0 || $c >= $ksub) { $bad = true; break; }
           |  int $idx = $j * $ksub + $c;
           |  if ($b.isNullAt($idx)) { $bad = true; break; }
           |  $s += $b.$getLut($idx);
           |}
           |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         """.stripMargin
      } else {
        val row = ctx.freshName("row")
        val arrayData = classOf[ArrayData].getName
        s"""
           |int $m = $a.numElements();
           |boolean $bad = $m != $b.numElements();
           |$javaT $s = $zero;
           |for (int $j = 0; !$bad && $j < $m; $j++) {
           |  if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; break; }
           |  int $c = $getCode;
           |  $arrayData $row = $b.getArray($j);
           |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
           |    $bad = true; break;
           |  }
           |  $s += $row.$getLut($c);
           |}
           |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAdcSum =
    copy(left = newLeft, right = newRight)
}

object ArrayAdcSum {
  /** Column-API entry point: `array_adc_sum(codes, lut)`. */
  def array_adc_sum(codes: Column, lut: Column): Column =
    GraftSqlShim.toColumn(
      ArrayAdcSum(GraftSqlShim.toExpression(codes),
        GraftSqlShim.toExpression(lut)))
}
