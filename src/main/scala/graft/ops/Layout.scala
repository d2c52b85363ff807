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
      .write.mode("overwrite")
      .partitionBy("dt_part")
      .parquet(path)

  /** Pruned scan: only the partitions for [from, to] are listed/read. */
  def scanDateRange(spark: SparkSession, path: String,
      from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("dt_part") >= from && col("dt_part") <= to)
}
