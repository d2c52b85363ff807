package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Aggregates, ApiQueries, ChessPipeline, CorpusOps, DataOps, EvalOps, GraphOps, Joins, LayoutOps, MultimodalAudioOps, MultimodalFrameOps, MultimodalOps, MultimodalStreamOps, QueryModule, WarcOps, Relational, Retrieval, SamplingOps, SimOps, TokenOps, TrainPrep, Transforms, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every conformance query module; each module maps
  * one SURVEY.md §2 operator class (or a north-star extension) to an
  * idiomatic Spark plan with a DuckDB oracle.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    Relational,
    Transforms,
    Joins,
    Aggregates,
    ChessPipeline,
    DataOps,
    Windows,
    ApiQueries,
    SamplingOps,
    TrainPrep,
    Retrieval,
    LayoutOps,
    CorpusOps,
    GraphOps,
    TokenOps,
    SimOps,
    MultimodalOps,
    MultimodalAudioOps,
    MultimodalFrameOps,
    MultimodalStreamOps,
    WarcOps,
    EvalOps
  )

  /** The driver-provisioned tiny scale factor (smoke/warm-up data). */
  private[graft] val TinySfDir = "/root/testdata/sf0.001"

  /** Flagship query on the tiny SF; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing_summary")(spark, TinySfDir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** Per-module name lists (RegistrySpec asserts the flatten is
    * collision-free — `toMap` above would shadow duplicates silently). */
  private[graft] def moduleQueryNames: Seq[Seq[String]] =
    modules.map(_.queries.keys.toSeq)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap

  /** One-time shared-state builds, benched by [[graft.Bench]] as
    * explicit `*_build` entries before the query loop so single-shot
    * per-query numbers reflect steady state (build-once/query-many).
    * Not part of the correctness registry: Verify's queries force the
    * same memos on demand. */
  def benchBuilds: Map[String, (SparkSession, String) => Unit] =
    modules.flatMap(_.benchBuilds).toMap
}
