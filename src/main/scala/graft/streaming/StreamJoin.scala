package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape
  * (impression ⋈ click within N minutes) and the general form of any
  * two-stream correlation.
  *
  * Why the shape matters at scale: an unconstrained stream-stream join
  * must buffer BOTH streams forever (any future row might match any
  * past row). The interval form bounds state by construction: each
  * side carries an event-time watermark, and the join condition pins
  * the right timestamp into `[leftTs, leftTs + within]`, so Spark's
  * state store evicts a buffered row as soon as the other side's
  * watermark passes its last possible match. State size ≈ (input rate
  * × (within + delay)) per side — constant in stream length.
  *
  * The helper requires disjoint non-key column names across the two
  * sides (fail-fast) and emits the left-side key column once.
  */
object StreamJoin {

  /** Inner interval equi-join: rows pair when keys match and
    * `rightTs ∈ [leftTs, leftTs + within]`. `delay` is each side's
    * max expected out-of-orderness (the watermark). `within`/`delay`
    * are SQL interval strings, e.g. "10 minutes". */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      within: String, delay: String): DataFrame = {
    val overlap = (left.columns.toSet - key)
      .intersect(right.columns.toSet - key)
    require(overlap.isEmpty,
      s"non-key columns must be disjoint; clashes: ${overlap.mkString(",")}")
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"))
      .drop(r(key))
  }
}
