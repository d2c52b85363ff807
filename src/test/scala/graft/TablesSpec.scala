package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `events.ts` physical-type dispatch in [[Tables.events]].
  *
  * The driver's testdata generator has shipped `ts` as parquet
  * TIMESTAMP(NANOS) (read as raw Long under legacy nanos mode) and as
  * TIMESTAMP(MICROS) isAdjustedToUTC=false (read as TIMESTAMP_NTZ); a
  * type change between rounds once broke 28 registry queries at the
  * driver only — this spec makes any future drift fail here first.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark._

  private val epochUs = 1700000000000000L // 2023-11-14T22:13:20 UTC

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name")
    d.toFile.deleteOnExit()
    s"$d/events.parquet"
  }

  private def writeEvents(path: String, tsField: StructField,
      tsValue: Any): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, tsValue, 7L)), schema)
    df.write.mode("overwrite").parquet(path)
  }

  private def canonical(dir: String): (DataType, Long) = {
    val out = Tables.events(spark, dir)
    val ts = out.select(unix_micros(col("ts"))).head.getLong(0)
    (out.schema("ts").dataType, ts)
  }

  test("nanos-as-long generation: Long ts is truncated to micro instant") {
    val p = tmp("evlong")
    writeEvents(p, StructField("ts", LongType), epochUs * 1000L + 999L)
    val (dt, ts) = canonical(new java.io.File(p).getParent)
    assert(dt === TimestampType)
    assert(ts === epochUs) // sub-µs nanos truncated, like DuckDB's cast
  }

  test("timestamp[us] NTZ generation: wall clock preserved as UTC instant") {
    val p = tmp("evntz")
    writeEvents(p, StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(
        epochUs / 1000000L, ((epochUs % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    val (dt, ts) = canonical(new java.io.File(p).getParent)
    assert(dt === TimestampType)
    assert(ts === epochUs)
  }

  test("instant generation: already-TIMESTAMP ts passes through") {
    val p = tmp("evltz")
    writeEvents(p, StructField("ts", TimestampType),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        epochUs / 1000000L, (epochUs % 1000000L) * 1000L)))
    val (dt, ts) = canonical(new java.io.File(p).getParent)
    assert(dt === TimestampType)
    assert(ts === epochUs)
  }

  test("driver testdata loads with a micro-instant ts") {
    val out = Tables.events(spark, sf0001)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.limit(1).count() === 1)
  }
}
