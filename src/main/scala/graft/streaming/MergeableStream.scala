package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** The ONE copy of the idempotent mergeable-state maintenance
  * protocol: a parquet state table updated per micro-batch by
  * `merge(state, summarize(batch))`, with batch-id replay protection
  * riding the atomic table swap. Any ASSOCIATIVE-COMMUTATIVE summary
  * plugs in — per-key rollups ([[IncrementalAggStream]]), count-min
  * cells, HLL sketch tables — and converges to exactly
  * `summarize(all rows ever delivered)` regardless of batch
  * boundaries.
  *
  * Idempotence is by BATCH ID (the marker file moves in the same
  * directory promote as the data, so state and applied-id cannot
  * diverge across a crash): unlike SCD-2's high-water mark, a
  * replayed additive batch would silently double-count, so anything
  * at or below the marker is skipped — the standard idempotent-
  * foreachBatch protocol from the Structured Streaming guide. */
object MergeableStream {

  private val Marker = "_applied_batch"

  private def appliedBatch(tablePath: String): Long = {
    val m = Paths.get(tablePath, Marker)
    if (Files.exists(m)) new String(Files.readAllBytes(m), "UTF-8")
      .trim.toLong
    else -1L
  }

  /** Returns true iff the batch was applied (false = replay skipped). */
  def applyBatch(batch: DataFrame, batchId: Long, tablePath: String,
      summarize: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): Boolean = {
    val spark = batch.sparkSession
    // marker + swap are nio local-only — fail fast before any state
    // mutation rather than silently losing replay protection on a
    // remote tablePath (TableSwap.requireLocal documents the scale
    // path: Hadoop FS + committer)
    graft.sources.TableSwap.requireLocal(tablePath)
    graft.sources.TableSwap.recover(tablePath)
    val exists = Files.exists(Paths.get(tablePath))
    if (exists && batchId <= appliedBatch(tablePath)) return false
    val delta = summarize(batch)
    val merged =
      if (!exists) delta
      else merge(spark.read.parquet(tablePath), delta)
    val tmp = tablePath + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    Files.write(Paths.get(tmp, Marker),
      batchId.toString.getBytes("UTF-8"))
    graft.sources.TableSwap.promoteTmp(tablePath)
    true
  }
}
