package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.8): K-permutation MinHash signature in ONE
  * aggregation pass.
  *
  * The composable form (cross join with a K-row parameter table, then
  * groupBy(id, k) min) multiplies the shuffle by K; this Aggregator
  * folds all K permutations into a K-long buffer per input row, so the
  * partial state per (doc) is one array — map-side combine keeps the
  * shuffle at one row per doc per partition regardless of K.
  *
  * Hash family matches [[graft.dedup.Dedup.minhashSignatures]] and the
  * DuckDB oracle exactly: h_k(sid) = ((2k+3)·sid + (5k+7)) mod p.
  */
class MinHashAgg(numHashes: Int, p: Long = 100003L)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sid: Long): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      val h = ((2L * k + 3L) * sid + (5L * k + 7L)) % p
      if (h < buf(k)) buf(k) = h
      k += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
