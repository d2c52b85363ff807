package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins (SURVEY.md scale
  * notes): writing both sides of a repeated join bucketed (and
  * bucket-sorted) by the join key lets Spark's bucketed scan satisfy
  * the join's distribution requirement directly — the per-query
  * Exchange disappears, which is THE lever for a fact-to-fact join
  * that runs every batch at 100 TB (pay the partitioning once at write
  * time, never again at read time).
  *
  * Bucket counts must match across join sides (or divide evenly with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`); keep them a
  * multiple of cluster parallelism.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table registered
    * as `name` (external at `path`). */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(name)

  /** The bucketed table as a DataFrame (bucket metadata attached — a
    * join on `key` against an equally-bucketed table plans with no
    * Exchange on either side). */
  def read(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Write `df` hive-partitioned by `partitionCol` — the other write-
    * time layout lever: an equality/range predicate on the partition
    * column becomes directory pruning (`PartitionFilters` in the scan),
    * so a day-scoped query over a 100 TB table reads one directory, not
    * the table. Keep partition cardinality moderate (dates, not ids) —
    * each value is a directory and tiny files kill scan throughput. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(path)
}
