package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared md5-prefix integer bucketing: first 4 hex digits of
  * md5(salt ‖ text) as an int in [0, 65536), mod `mod`. The ONE
  * definition behind classifier feature buckets and export shard
  * assignment — content-addressed, engine-portable.
  *
  * Spark parses the hex with `conv` (one md5 per row); DuckDB has no
  * hex→int cast, so [[bucketSql]] emits per-digit ascii arithmetic —
  * same value (oracle-hash-proven for every consumer).
  */
object Md5Bucket {

  def bucket(salt: String, text: Column, mod: Int): Column =
    conv(substring(md5(concat(lit(salt), text)), 1, 4), 16, 10)
      .cast("long") % mod

  private def hexDigitSql(h: String, i: Int): String =
    s"(ascii(substr($h, $i, 1)) - " +
      s"CASE WHEN substr($h, $i, 1) >= 'a' THEN 87 ELSE 48 END)"

  /** DuckDB SQL for the same bucket; `inner` must already be VARCHAR. */
  def bucketSql(salt: String, inner: String, mod: Int): String = {
    val h = s"md5('$salt' || $inner)"
    s"(CAST((((${hexDigitSql(h, 1)} * 16 + ${hexDigitSql(h, 2)}) * 16 + " +
      s"${hexDigitSql(h, 3)}) * 16 + ${hexDigitSql(h, 4)}) AS BIGINT) " +
      s"% $mod)"
  }
}
