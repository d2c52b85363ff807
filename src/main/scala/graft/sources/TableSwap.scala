package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one copy of the crash-safe parquet-directory swap protocol:
  * write tmp → move live to .bak → move tmp to live → drop .bak.
  * A crash at ANY point leaves the old or the new table reachable —
  * PROVIDED every reader first runs [[recover]] (a missing live dir
  * with a .bak present means the crash hit between the two moves).
  * [[graft.streaming.MicroBatchIngest.mergeParquet]] (keyed merge) and
  * [[graft.streaming.StreamAdmission]] (state tables) both build on
  * this; keeping the dance in one place is what keeps their recovery
  * semantics from drifting apart. */
object TableSwap {

  /** Roll a half-completed previous swap forward: if the live dir is
    * missing but its backup exists, restore the backup. Idempotent;
    * call before ANY read or swap of `tablePath`. */
  def recover(tablePath: String): Unit = {
    val target = Paths.get(tablePath)
    val backup = Paths.get(tablePath + ".bak")
    if (!Files.exists(target) && Files.exists(backup))
      Files.move(backup, target)
  }

  /** Replace the table at `tablePath` with `df`, atomically w.r.t.
    * crash recovery (see object doc). */
  def replace(spark: SparkSession, df: DataFrame,
      tablePath: String): Unit = {
    recover(tablePath)
    df.write.mode("overwrite").parquet(tablePath + ".tmp")
    promoteTmp(tablePath)
  }

  /** Swap an already-written `<tablePath>.tmp` into place (callers that
    * need to act on the tmp content — e.g. count it — before the swap
    * write tmp themselves, then promote). */
  def promoteTmp(tablePath: String): Unit = {
    val target = Paths.get(tablePath)
    val backup = Paths.get(tablePath + ".bak")
    deleteRecursively(backup)                   // stale from last swap
    if (Files.exists(target)) Files.move(target, backup)
    Files.move(Paths.get(tablePath + ".tmp"), target)
    deleteRecursively(backup)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
