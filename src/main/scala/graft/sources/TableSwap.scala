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

  /** The move/marker protocol is java.nio — LOCAL FILESYSTEM ONLY.
    * On a scheme'd URI (s3://, hdfs://) the moves would throw or land
    * on the driver's local disk while Spark writes to the remote
    * store, silently voiding the crash-safety guarantee. Fail fast
    * instead; remote deployments route through the Hadoop FileSystem
    * API + an output committer, not this protocol. */
  def requireLocal(tablePath: String): Unit = {
    val scheme =
      try java.net.URI.create(tablePath.replace(" ", "%20")).getScheme
      catch { case _: IllegalArgumentException => null }
    require(scheme == null || scheme == "file",
      s"TableSwap: local-filesystem protocol, got scheme '$scheme' " +
        s"in '$tablePath' — remote tables need Hadoop FS commit, " +
        "not the nio swap")
  }

  /** Roll a half-completed previous swap forward: if the live dir is
    * missing but its backup exists, restore the backup. Idempotent;
    * call before ANY read or swap of `tablePath`. */
  def recover(tablePath: String): Unit = {
    requireLocal(tablePath)
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
    requireLocal(tablePath)
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
