package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the 100 TB path (docs/SCALE.md): date-partitioned
  * Parquet — the Spark replacement for the reference's Postgres b-tree
  * indexes (tv_channel_games.sql:31-35). `idx_dt_game` becomes partition
  * pruning; the value-column indexes become row-group min/max stats.
  */
object Layout {

  /** Write games partitioned by game date (NULL dates land in the
    * default partition): queries filtering on dt_game read only their
    * partitions — verify with `PartitionFilters` in the scan node. */
  def writePartitionedByDate(games: DataFrame, path: String): Unit =
    games
      .withColumn("dt_part", coalesce(
        date_format(col("dt_game"), "yyyy-MM-dd"), lit("unknown")))
      // cluster by the partition column before the partitioned write
      // (guide §6 / Iceberg's hash distribution-mode): without it every
      // upstream task opens one file per date it touches — N_tasks ×
      // N_dates small files, paid again by every pruned scan. One
      // shuffle of the rows being written is the standard price.
      // REBALANCE, not repartition(dt_part) (the r21 shape): a plain
      // hash repartition is one task per date, so a hot date becomes a
      // single straggler task writing one enormous file at 100 TB
      // (guide §2.5). The AQE rebalance keys the exchange on dt_part
      // but SPLITS oversized date partitions to the advisory size
      // (each split still writes only dt_part-pure files) and
      // coalesces tiny dates — small-file behavior locally, no
      // straggler at scale.
      .hint("rebalance", col("dt_part"))
      .write.mode("overwrite")
      .partitionBy("dt_part")
      .parquet(path)

  /** Pruned scan: only the partitions for [from, to] are listed/read. */
  def scanDateRange(spark: SparkSession, path: String,
      from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("dt_part") >= from && col("dt_part") <= to)

  /** Small-file compaction — the layout-hygiene pass every streaming or
    * fine-partitioned ingest needs: thousands of KB-scale part files
    * turn listing, scheduling, and scan setup into the bottleneck long
    * before data volume does. Rewrites `inPath` into
    * ⌈bytes / targetFileBytes⌉ files at `outPath` and returns that
    * count.
    *
    * `repartition(n)` (round-robin), not `coalesce(n)`: coalesce glues
    * existing partitions without a shuffle, so a skewed input stays
    * skewed — uniform output files are worth the one shuffle in a
    * maintenance pass. Row-level content is preserved exactly (the
    * layout_compact entry hash-proves it); intra-file order is not a
    * parquet contract and is not preserved. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 512L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }
}
