package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared-schema conformance: align a scanned DataFrame to a contract
  * the downstream pipeline was compiled against, coercing only what is
  * provably safe and reporting everything else loudly.
  *
  * Motivation (learned the hard way): at 100 TB the producer and the
  * consumer of a table are different teams on different release
  * cadences. Physical types drift — an int32 partition key becomes
  * int64, a TIMESTAMP(NANOS) becomes TIMESTAMP(MICROS) NTZ — and a
  * consumer that binds `col("ts") div 1000` to yesterday's physical
  * type fails analysis on today's files (this repo's events-family
  * queries did exactly that when the testdata generator changed its
  * timestamp encoding). The contract is the fix: the pipeline declares
  * the logical schema it needs once, and every scan is conformed at the
  * source, so drift is either absorbed (safe widenings) or surfaced as
  * a structured report — never a mid-DAG analysis error.
  *
  * Coercions are Catalyst `Cast`s inside the scan projection, so they
  * ride whole-stage codegen and column pruning still reaches the
  * parquet reader — conformance costs no extra pass over the data.
  *
  * Reference behavior mirrored: knightshift validates incoming rows
  * against required-field and type gates before writing (reference
  * `knightshift/cleaning/validate_tv_channel_games.py`); this operator
  * is the scan-side, schema-level analogue of that row-level gate.
  */
object SchemaContract {

  /** One drift finding. `action` is what [[conform]] did (or would do):
    *   ok                 — physical type matches the contract;
    *   widened            — lossless cast (int widening, float→double,
    *                        decimal precision growth);
    *   tz_reinterpreted   — TIMESTAMP_NTZ↔TIMESTAMP under the session
    *                        zone (wall-clock preserving iff the session
    *                        zone matches the producer's convention —
    *                        this engine pins UTC everywhere);
    *   missing_filled_null— contract column absent from the data,
    *                        filled with typed NULL (nullable contract
    *                        fields only);
    *   dropped            — data column absent from the contract;
    *   incompatible       — no safe coercion exists (strict mode
    *                        throws; lenient mode try_casts, so
    *                        unparseable cells become NULL, never a
    *                        wrong value).
    */
  final case class Drift(column: String, expected: String, found: String,
      action: String)

  /** Widening (value-preserving) integral chain. */
  private val intRank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  /** Is `from -> to` a provably lossless cast? */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if intRank.contains(f) && intRank.contains(t) =>
      intRank(f) < intRank(t)
    case (FloatType, DoubleType) => true
    // every int32 (and narrower) is exactly representable in double;
    // int64 is NOT (53-bit mantissa) — that pair is `incompatible`
    case (f, DoubleType) if intRank.get(f).exists(_ <= 3) => true
    case (f, FloatType) if intRank.get(f).exists(_ <= 2) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case (f, t: DecimalType) if intRank.contains(f) =>
      // max digits of the integral type must fit the decimal's integer part
      val digits = Seq(3, 5, 10, 19)(intRank(f) - 1)
      t.precision - t.scale >= digits
    case (DateType, TimestampNTZType) => true // midnight, zone-free
    case _ => false
  }

  private def sameZoneFamily(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (TimestampNTZType, TimestampType) => true
      case (TimestampType, TimestampNTZType) => true
      case _ => false
    }

  /** Drift report for `df` against `contract` — pure schema metadata,
    * no job runs. Ordered: contract columns first (contract order),
    * then dropped data columns (data order).
    *
    * Name resolution is case-INsensitive, matching Spark's default
    * analyzer (`spark.sql.caseSensitive=false`): a data column that
    * differs from the contract only in case binds to the contract
    * column (and [[conform]] re-aliases it to the contract's casing)
    * rather than being misclassified as missing-and-dropped. Data with
    * two columns that collide case-insensitively is rejected — Spark's
    * own resolver would call any reference to them ambiguous anyway.
    */
  def drift(df: DataFrame, contract: StructType): Seq[Drift] = {
    val dataFields = df.schema.fields.toSeq
    val collisions = dataFields.groupBy(_.name.toLowerCase)
      .collect { case (_, fs) if fs.length > 1 => fs.map(_.name) }
    require(collisions.isEmpty,
      s"data columns collide case-insensitively: ${collisions.mkString(", ")}")
    val have = dataFields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val contractFindings = contract.fields.toSeq.map { f =>
      have.get(f.name.toLowerCase) match {
        case None =>
          Drift(f.name, f.dataType.sql, "ABSENT", "missing_filled_null")
        case Some(dt) if dt == f.dataType =>
          Drift(f.name, f.dataType.sql, dt.sql, "ok")
        case Some(dt) if widens(dt, f.dataType) =>
          Drift(f.name, f.dataType.sql, dt.sql, "widened")
        case Some(dt) if sameZoneFamily(dt, f.dataType) =>
          Drift(f.name, f.dataType.sql, dt.sql, "tz_reinterpreted")
        case Some(dt) =>
          Drift(f.name, f.dataType.sql, dt.sql, "incompatible")
      }
    }
    val wanted = contract.fieldNames.map(_.toLowerCase).toSet
    val extras = dataFields.collect {
      case f if !wanted.contains(f.name.toLowerCase) =>
        Drift(f.name, "ABSENT", f.dataType.sql, "dropped")
    }
    contractFindings ++ extras
  }

  /** Conform `df` to `contract`: contract column order, typed-NULL fill
    * for absent columns, extras dropped, safe coercions applied.
    *
    * `strict = true` (the production default) throws on any
    * `incompatible` finding, with the FULL drift report in the message
    * — one failure names every drifted column, not just the first.
    * `strict = false` try_casts incompatible columns instead:
    * unconvertible cells become NULL (auditable), never a wrong value.
    *
    * `keepExtras = true` appends data columns absent from the contract
    * (in data order, types untouched) instead of dropping them — the
    * right mode for a table LOADER, where a producer adding a column
    * should flow through rather than vanish; the default drop is the
    * right mode for a pipeline STAGE compiled against a fixed width.
    */
  def conform(df: DataFrame, contract: StructType,
      strict: Boolean = true, keepExtras: Boolean = false): DataFrame = {
    val findings = drift(df, contract)
    if (strict) {
      val bad = findings.filter(_.action == "incompatible")
      require(bad.isEmpty,
        s"schema contract violated (${bad.size} incompatible): " +
          findings.filterNot(_.action == "ok").mkString("; "))
    }
    val byName = findings.map(d => d.column.toLowerCase -> d).toMap
    val cols: Seq[Column] = contract.fields.toSeq.map { f =>
      byName(f.name.toLowerCase).action match {
        case "missing_filled_null" => lit(null).cast(f.dataType).as(f.name)
        case "ok" => col(f.name).as(f.name)
        case "incompatible" => // lenient mode only (strict threw above)
          col(f.name).try_cast(f.dataType).as(f.name)
        case _ => col(f.name).cast(f.dataType).as(f.name)
      }
    }
    val extraCols: Seq[Column] =
      if (!keepExtras) Nil
      else findings.collect { case d if d.action == "dropped" => col(d.column) }
    df.select(cols ++ extraCols: _*)
  }

  /** Read a table whose files span SCHEMA GENERATIONS — early files
    * written with narrower physical types than later ones (int32 keys
    * that became int64, float metrics that became double). Spark's own
    * `mergeSchema` refuses exactly these merges ("Failed to merge
    * incompatible data types"), and a plain read binds one sampled
    * footer schema to every file — silently wrong for the others. Here
    * each generation directory is scanned with its OWN footer schema,
    * conformed to the contract inside its scan projection (pruning and
    * pushdown intact per generation), and unioned. At 100 TB,
    * generations are directories (a rewrite epoch, a producer
    * version), so the per-path list stays metadata-sized.
    */
  def readParquetConformed(spark: org.apache.spark.sql.SparkSession,
      contract: StructType, strict: Boolean, paths: String*): DataFrame = {
    require(paths.nonEmpty, "need at least one generation path")
    paths.map(p => conform(spark.read.parquet(p), contract, strict))
      .reduce(_ unionByName _)
  }
}
