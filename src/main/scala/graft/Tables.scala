package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every loader conforms the scanned footer schema to a DECLARED
  * contract ([[graft.ops.SchemaContract]], lenient mode) instead of
  * binding whatever the generator wrote this round. The testdata
  * generator has changed physical types between rounds (events.ts
  * shipped as TIMESTAMP(NANOS), then TIMESTAMP_NTZ(MICROS)); binding
  * raw footer schemas made that drift a mid-DAG analysis error across a
  * whole query family. With the contract at the scan, safe drift
  * (widenings, tz reinterpretation, added columns) is absorbed and only
  * genuinely incompatible drift surfaces — as NULLs from try_cast, not
  * wrong values. Conformance is a cast-only projection inside the scan,
  * so column pruning and predicate pushdown still reach the parquet
  * reader (`PushedFilters` / `ReadSchema`) — at 100 TB these scans are
  * partition-pruned and row-group-pruned by the same mechanism with
  * zero code change.
  *
  * Reference analogue: knightshift re-declares per-script schema views
  * over its tables (reference `knightshift/enrichment/
  * backfill_opening_names.py:56-65`) precisely because producers drift.
  */
object Tables {

  /** Raw scan, no contract — for tables not in the registry or for
    * deliberately footer-bound reads (fixtures, round-trips). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  import graft.ops.SchemaContract.conform

  // One contract per testdata table: the logical schema every query in
  // the registry was written against. Declared in footer order so a
  // non-drifted read is a rename-free, cast-free projection.
  val regionContract: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))
  val nationContract: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))
  val customerContract: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))
  val supplierContract: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))
  val partContract: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))
  val ordersContract: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))
  val lineitemContract: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))
  /** ts is the CANONICALIZED instant type — [[events]] normalizes the
    * generation-specific physical encodings before conforming. */
  val eventsContract: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
  val documentsContract: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))
  val embeddingsContract: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val contracts: Map[String, StructType] = Map(
    "region" -> regionContract, "nation" -> nationContract,
    "customer" -> customerContract, "supplier" -> supplierContract,
    "part" -> partContract, "orders" -> ordersContract,
    "lineitem" -> lineitemContract, "events" -> eventsContract,
    "documents" -> documentsContract, "embeddings" -> embeddingsContract)

  // Lenient + keepExtras: driver-generated data may legitimately grow a
  // column (flows through) or narrow a type (widened back); a breaking
  // type change degrades to auditable NULLs instead of an analysis
  // error three operators downstream.
  // NOT memoized per session (r21 note): sharing one analyzed relation
  // object across queries was tried to skip repeated listing/footer
  // reads and measured consistently SLOWER — every derived self-join
  // then pays DeduplicateRelations rewrites. Fresh-per-call stays.
  private def contracted(s: SparkSession, d: String, name: String): DataFrame =
    conform(table(s, d, name), contracts(name),
      strict = false, keepExtras = true)

  def region(s: SparkSession, d: String): DataFrame   = contracted(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = contracted(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = contracted(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = contracted(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = contracted(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = contracted(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = contracted(s, d, "lineitem")

  /** `events.ts` has shipped as two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — [PARQUET_TYPE_ILLEGAL] — so it is read as raw
    * nanos via legacy long mode and truncated to micros) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read natively as
    * TIMESTAMP_NTZ). Dispatch on the scanned type and canonicalize both
    * to TIMESTAMP (instant) with the same UTC wall-clock values DuckDB's
    * `CAST(ts AS TIMESTAMP)` yields, so oracle comparisons align exactly
    * regardless of which generation of testdata is on disk. The NTZ→
    * instant cast is wall-clock-preserving only under a UTC session
    * timezone — Verify/Bench/specs all pin `spark.sql.session.timeZone`.
    * The contract then absorbs any OTHER drift in the remaining columns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val canon = raw.schema.find(_.name.equalsIgnoreCase("ts"))
      .map(_.dataType) match {
      case Some(LongType) => // nanos-as-long generation
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already an instant (or absent: contract NULL-fills)
    }
    conform(canon, eventsContract, strict = false, keepExtras = true)
  }

  def documents(s: SparkSession, d: String): DataFrame =
    contracted(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    contracted(s, d, "embeddings")
}
