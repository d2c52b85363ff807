package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.IncrementalAgg

/** Streaming maintenance of an [[graft.ops.IncrementalAgg]] state
  * table: each micro-batch's partial aggregates merge into the parquet
  * summary via `foreachBatch`, so the table converges to exactly
  * `summarize(all rows ever delivered)` — the continuously-maintained
  * rollup shape (batch twin: `ops_incr_agg`).
  *
  * Crash-safety & idempotence: the checkpoint gives at-least-once
  * delivery, and unlike SCD-2 (whose high-water mark makes replays
  * self-identifying) a replayed COUNT/SUM batch would silently
  * double-count — so idempotence here is by BATCH ID: the swapped
  * state directory carries the id of the last applied batch in a
  * marker file written in the same atomic promote
  * ([[graft.sources.TableSwap]]), and any batch at or below the marker
  * is skipped. Batch ids are what Structured Streaming itself replays
  * deterministically after a crash, so marker-vs-id comparison is
  * exact (the standard idempotent-foreachBatch protocol from the
  * Structured Streaming guide).
  *
  * Scale: per tick, one scan of the micro-batch (map-side combined to
  * one row per touched key) plus a keyed merge with the state table —
  * history is never re-read; streaming operator state stays empty, so
  * there is nothing to watermark and memory is flat however long the
  * stream runs. */
object IncrementalAggStream {

  private val Marker = "_applied_batch"

  def start(stream: DataFrame, tablePath: String, checkpoint: String,
      keys: Seq[String], valCol: String, dateCol: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, tablePath, keys, valCol, dateCol)
        ()
      }
      .start()

  private def appliedBatch(tablePath: String): Long = {
    val m = Paths.get(tablePath, Marker)
    if (Files.exists(m)) new String(Files.readAllBytes(m), "UTF-8")
      .trim.toLong
    else -1L
  }

  /** One micro-batch against the state table — also the seam the spec
    * drives directly (incl. replaying a batch id to prove the no-op).
    * Returns true iff the batch was applied (false = replay skipped). */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
      tablePath: String, keys: Seq[String], valCol: String,
      dateCol: String): Boolean = {
    val spark = batch.sparkSession
    graft.sources.TableSwap.recover(tablePath)
    val exists = Files.exists(Paths.get(tablePath))
    if (exists && batchId <= appliedBatch(tablePath)) return false
    val delta = IncrementalAgg.summarize(batch, keys, valCol, dateCol)
    val merged =
      if (!exists) delta
      else IncrementalAgg.merge(spark.read.parquet(tablePath), delta, keys)
    val tmp = tablePath + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // marker rides the same directory move as the data — state and
    // applied-id can never diverge across a crash
    Files.write(Paths.get(tmp, Marker),
      batchId.toString.getBytes("UTF-8"))
    graft.sources.TableSwap.promoteTmp(tablePath)
    true
  }
}
