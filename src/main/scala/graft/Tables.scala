package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory.
  * Reads are plain `spark.read.parquet` so Catalyst's column pruning and
  * predicate pushdown reach the scan (`PushedFilters` / `ReadSchema`) —
  * at 100 TB these scans are partition-pruned and row-group-pruned by the
  * same mechanism with zero code change.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped as two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — [PARQUET_TYPE_ILLEGAL] — so it is read as raw
    * nanos via legacy long mode and truncated to micros) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read natively as
    * TIMESTAMP_NTZ). Dispatch on the scanned type and canonicalize both
    * to TIMESTAMP (instant) with the same UTC wall-clock values DuckDB's
    * `CAST(ts AS TIMESTAMP)` yields, so oracle comparisons align exactly
    * regardless of which generation of testdata is on disk. The NTZ→
    * instant cast is wall-clock-preserving only under a UTC session
    * timezone — Verify/Bench/specs all pin `spark.sql.session.timeZone`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long generation
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already an instant
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
