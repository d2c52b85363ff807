package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamMerge

/** Structured-Streaming sink semantics:
  *   - StreamMerge: checkpointed incremental processing + idempotent
  *     merge = effectively-once across restarts and replays;
  *   - append-mode watermarking: late rows are dropped and only
  *     finalized windows emit — the state-bounding contract that makes
  *     streaming aggs safe at scale.
  */
class StreamMergeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("StreamMerge: checkpointed foreachBatch merge is incremental and replay-safe") {
    val src = Files.createTempDirectory("sm_src").toString
    val cp = Files.createTempDirectory("sm_cp").toString
    val table = Files.createTempDirectory("sm_tbl").toString + "/games"

    def fileA() = Seq(
      ("g1", "alice", ts("2025-05-01 10:00:00")),
      ("g2", "bob", ts("2025-05-01 10:00:00")))
      .toDF("id_game", "id_user_white", "tm_ingested")
    def fileB() = Seq(
      ("g1", "alice_updated", ts("2025-05-01 10:05:00")),
      ("g3", "carol", ts("2025-05-01 10:05:00")))
      .toDF("id_game", "id_user_white", "tm_ingested")

    def runOnce(checkpoint: String): Unit = {
      val stream = spark.readStream.schema(fileA().schema).parquet(src)
      val q = StreamMerge.start(stream, table, checkpoint,
        key = "id_game", orderCols = Seq(desc("tm_ingested")))
      q.awaitTermination(60000)
    }
    def tableRows(): Set[(String, String)] =
      spark.read.parquet(table).select("id_game", "id_user_white")
        .as[(String, String)].collect().toSet

    fileA().write.mode("append").parquet(src)
    runOnce(cp)
    assert(tableRows() === Set("g1" -> "alice", "g2" -> "bob"))

    // second delivery overlaps g1: the checkpoint must make this run
    // process ONLY the new file, and the merge must overwrite g1
    fileB().write.mode("append").parquet(src)
    runOnce(cp)
    val expected = Set("g1" -> "alice_updated", "g2" -> "bob", "g3" -> "carol")
    assert(tableRows() === expected)

    // full replay (lost checkpoint): reprocessing everything converges
    // to the same table — idempotent merge absorbs at-least-once
    val cp2 = Files.createTempDirectory("sm_cp2").toString
    runOnce(cp2)
    assert(tableRows() === expected)
  }

  test("mergeParquet recovers the table from a backup left by a crashed swap") {
    import java.nio.file.Paths
    import graft.streaming.MicroBatchIngest.mergeParquet
    val table = Files.createTempDirectory("rc").toString + "/t"
    val batch1 = Seq(("k1", "v1", ts("2025-05-01 10:00:00")),
      ("k2", "v1", ts("2025-05-01 10:00:00")))
      .toDF("id_game", "id_user_white", "tm_ingested")
    mergeParquet(spark, batch1, table, "id_game", Seq(desc("tm_ingested")))
    // simulate a crash in the swap window: old table moved to .bak, the
    // new table never arrived
    Files.move(Paths.get(table), Paths.get(table + ".bak"))
    val batch2 = Seq(("k2", "v2", ts("2025-05-01 10:05:00")),
      ("k3", "v1", ts("2025-05-01 10:05:00")))
      .toDF("id_game", "id_user_white", "tm_ingested")
    mergeParquet(spark, batch2, table, "id_game", Seq(desc("tm_ingested")))
    val rows = spark.read.parquet(table)
      .select("id_game", "id_user_white")
      .as[(String, String)].collect().toSet
    // batch1's rows survived the crash; batch2 merged on top
    assert(rows === Set("k1" -> "v1", "k2" -> "v2", "k3" -> "v1"))
  }

  test("append-mode watermark: late rows dropped, only finalized windows emit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Timestamp]
    val agg = input.toDF().withColumnRenamed("value", "ts")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()

    // batch 1: 2 / 3 / 1 / 4 events in the 10:00 / 11:00 / 12:00 / 13:00
    // hourly windows; max ts 13:59 → watermark advances to 13:29, which
    // finalizes (emits + evicts) the 10/11/12 windows
    input.addData(Seq(
      "2025-05-01 10:10:00", "2025-05-01 10:20:00",
      "2025-05-01 11:05:00", "2025-05-01 11:15:00", "2025-05-01 11:25:00",
      "2025-05-01 12:30:00",
      "2025-05-01 13:10:00", "2025-05-01 13:20:00", "2025-05-01 13:30:00",
      "2025-05-01 13:59:00").map(ts))
    q.processAllAvailable()

    // batch 2: one LATE row (10:15 — below the 13:29 watermark, its
    // window is already finalized → must be dropped) and one on-time
    // row (14:30 — advances the watermark to 14:00, finalizing 13:00;
    // its own 14:00 window stays open and must NOT emit)
    input.addData(Seq("2025-05-01 10:15:00", "2025-05-01 14:30:00").map(ts))
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("wm_out")
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    // 10:00 stays at 2 — the late row was dropped, not re-aggregated;
    // 13:00 emitted once finalized; 14:00 absent (still open state)
    assert(emitted === Map(
      "10:00" -> 2L, "11:00" -> 3L, "12:00" -> 1L, "13:00" -> 4L))
  }
}
