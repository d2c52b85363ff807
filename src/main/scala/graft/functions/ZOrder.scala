package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) curve encoding as a pure Column program — the
  * multi-dimensional clustering lever: sort/range-partition the write
  * by `zValue(x, y)` and BOTH dimensions end up locally bounded in
  * every file, so min/max row-group stats (and range partition bounds)
  * prune 2-D box queries that a single-column sort can only prune on
  * one axis. This is write-time layout, not a new operator: the read
  * path is ordinary parquet scan + filter.
  *
  * Bit-interleave composed from shift/and/or functions — codegen'd
  * end-to-end, no UDF, and expressible in any engine with integer bit
  * ops (the conformance oracle generates the same formula in SQL).
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` and `y` (x at even, y at odd
    * positions): a 2·bits-bit z-value. Inputs are taken mod 2^bits
    * (pmod — sign-safe); callers quantize wider domains first. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    val m = lit(1L << bits)
    val xm = pmod(x.cast("long"), m)
    val ym = pmod(y.cast("long"), m)
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching SQL formula (for oracles / engines without the
    * Column API); `x` and `y` are SQL expressions already reduced to
    * [0, 2^bits). */
  def zSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
}
