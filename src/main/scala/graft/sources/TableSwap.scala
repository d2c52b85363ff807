package graft.sources

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one copy of the crash-safe parquet-directory swap protocol:
  * write tmp → move live to .bak → move tmp to live → drop .bak.
  * A crash at ANY point leaves the old or the new table reachable —
  * PROVIDED every reader first runs [[recover]] (a missing live dir
  * with a .bak present means the crash hit between the two moves).
  * [[graft.streaming.MicroBatchIngest.mergeParquet]] (keyed merge) and
  * [[graft.streaming.StreamAdmission]] (state tables) both build on
  * this; keeping the dance in one place is what keeps their recovery
  * semantics from drifting apart.
  *
  * All moves route through the Hadoop `FileSystem` API resolved from
  * the table path's own scheme (active session Hadoop conf), so the
  * protocol works uniformly on `file:`, scheme-less local, `hdfs://`,
  * or any mounted store — state tables are not pinned to the driver's
  * local disk. Atomicity contract: the protocol is RENAME-based, so
  * the crash-safety guarantee holds wherever directory rename is
  * atomic (local FS, HDFS, ABFS). On rename-as-copy object stores
  * (raw S3A) a swap is not atomic — there, point `tablePath` at an
  * HDFS/consistent tier or use a committing table format; the swap
  * still converges but a concurrent reader could observe the gap
  * between the two moves. */
object TableSwap {

  /** Filesystem for the path's scheme, under the active session's
    * Hadoop conf (so fs.* tuning and credentials apply); a bare
    * `new Configuration()` fallback covers pre-session utility calls
    * — local and `file:` paths resolve identically either way. */
  private def fsFor(p: String): (FileSystem, HPath) = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    val hp = new HPath(p)
    (hp.getFileSystem(conf), hp)
  }

  /** Roll a half-completed previous swap forward: if the live dir is
    * missing but its backup exists, restore the backup. Idempotent;
    * call before ANY read or swap of `tablePath`. */
  def recover(tablePath: String): Unit = {
    val (fs, target) = fsFor(tablePath)
    val backup = new HPath(tablePath + ".bak")
    if (!fs.exists(target) && fs.exists(backup))
      require(fs.rename(backup, target),
        s"TableSwap: recovery rename $backup -> $target failed")
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
    * write tmp themselves, then promote). Every rename has a vacated
    * destination (backup deleted / live moved away first), so FS
    * implementations that nest-on-existing-dir can never mis-place a
    * table. */
  def promoteTmp(tablePath: String): Unit = {
    val (fs, target) = fsFor(tablePath)
    val backup = new HPath(tablePath + ".bak")
    if (fs.exists(backup))                      // stale from last swap
      fs.delete(backup, true)
    if (fs.exists(target))
      require(fs.rename(target, backup),
        s"TableSwap: rename $target -> $backup failed")
    require(fs.rename(new HPath(tablePath + ".tmp"), target),
      s"TableSwap: rename ${tablePath}.tmp -> $target failed")
    if (fs.exists(backup)) fs.delete(backup, true)
  }

  /** True iff the table directory exists on its filesystem. */
  def exists(tablePath: String): Boolean = {
    val (fs, p) = fsFor(tablePath)
    fs.exists(p)
  }

  /** Read a small marker file under the table dir (None = absent). */
  def readMarker(tablePath: String, name: String): Option[String] = {
    val (fs, _) = fsFor(tablePath)
    val m = new HPath(tablePath, name)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  /** Write a small marker file under the table dir (overwrite). */
  def writeMarker(tablePath: String, name: String,
      content: String): Unit = {
    val (fs, _) = fsFor(tablePath)
    val out = fs.create(new HPath(tablePath, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Local-nio recursive delete — fixture planting and temp-dir
    * hygiene on driver-local paths only (swap internals use the
    * Hadoop FS recursive delete above). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
