package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named set of conformance queries plus their DuckDB oracle SQL.
  *
  * Contract (driver-enforced, see /root/repo/SURVEY.md §5):
  *   - every query must be deterministic: total ORDER BY, ties broken by a
  *     unique key, no wall-clock, no partition-order dependence;
  *   - column names must match the oracle exactly (driver sorts columns by
  *     name, then hashes values);
  *   - floating aggregates go through exact decimal arithmetic and are cast
  *     to double only at the end, so Spark and DuckDB agree bit-for-bit
  *     regardless of summation order (decimal addition is associative).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** One-time shared state builds (seeded streaming state, memoized
    * gated corpora, written tables) that several registry queries
    * reuse via [[SessionMemo]]. Bench runs these FIRST, timed as their
    * own `*_build` entries, so a single-shot benchmark charges the
    * build to an explicit line instead of booking 5–20 s of setup
    * against whichever consumer happens to run first — the per-query
    * numbers then reflect steady state (build-once/query-many is the
    * production shape). Verify ignores these: correctness queries
    * force the same memos on demand. */
  def benchBuilds: Map[String, (SparkSession, String) => Unit] = Map.empty
}

/** Per-session memo for DataFrames shared by several registry queries
  * in one Verify/Bench run. The outer map is WEAK on the SparkSession,
  * so a stopped session (and everything it persisted) becomes
  * collectable — a long-lived service does not accumulate entries
  * across sessions. Within one live session the memo is by design:
  * registry queries are read-only over immutable testdata dirs. */
object SessionMemo {
  /** Lazy holder: registered in the map cheaply, built OUTSIDE the
    * map's lock — nested SessionMemo calls from inside a build thunk
    * (e.g. a memoized corpus thunk loading a memoized table) are legal,
    * where a direct `computeIfAbsent(_ => build)` would throw
    * "Recursive update". `lazy val` gives once-only per-key
    * construction under concurrency. */
  private final class Holder(thunk: () => AnyRef) {
    @volatile private var done = false
    lazy val value: AnyRef = { val v = thunk(); done = true; v }
    /** The value if the thunk already ran; never triggers a build. */
    def builtValue: Option[AnyRef] = if (done) Some(value) else None
  }

  private val bySession = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, Holder]]()

  def apply[T <: AnyRef](s: SparkSession, dir: String, tag: String)(
      build: => T): T = {
    val inner = bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Holder]()
        bySession.put(s, m)
      }
      m
    }
    inner.computeIfAbsent(s"$tag|$dir", _ => new Holder(() => build))
      .value.asInstanceOf[T]
  }

  /** Explicit lifecycle end for library consumers (one-shot mains call
    * it before `spark.stop()`): unpersist every memoized DataFrame,
    * forget the memo, and drain [[graft.CacheScope]]'s operator-internal
    * caches. After release the session holds no graft-pinned blocks;
    * re-running a registry query simply rebuilds (and re-memoizes). */
  def release(s: SparkSession): Unit = {
    val inner = bySession.synchronized(bySession.remove(s))
    // only holders whose thunk actually RAN can pin storage — forcing
    // unbuilt ones here would do the build just to throw it away
    if (inner != null) inner.values.forEach { h =>
      h.builtValue match {
        case Some(df: org.apache.spark.sql.Dataset[_]) => df.unpersist(false)
        case _ => ()   // non-DataFrame memo values hold no storage
      }
    }
    graft.CacheScope.releaseAll(s)
  }
}

/** Scoped session-conf override — the r20 t2_watermark_dedup
  * state-store fix generalized (BASELINE.md r20: one HDFS-backed state
  * store per shuffle partition per micro-batch; 8 partitions cut the
  * fixed store count 4× and the build medians 2.6×). Streaming/seeded
  * builds wrap their delivery loop in this so micro-batch machinery,
  * state-store instances, and output file counts scale with the
  * fixture instead of the session's core count; the conf is restored
  * after completion (the stream pins its partition count at the first
  * batch, so the restore must wait for it). At 100 TB the same dial
  * sizes state stores to executors — a per-stream setting either way,
  * never a session constant. */
private[graft] object ScopedConf {
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** The stream-build partition count DERIVED instead of pinned (the
    * r21 verdict's ask: the literal 8 encoded the fixture and ignored
    * `$SPARK_GRAFT_CPUS`): one shuffle partition per advisory-sized
    * chunk of the batch SOURCE, capped at the session's core count —
    * `clamp(⌈bytes / advisoryPartitionSize⌉, 1, cores)`. Fixture-sized
    * inputs get the few-store/few-file behavior the r20 t2 fix bought;
    * at 100 TB the same formula saturates the executors (bytes/advisory
    * ≫ cores) instead of pinning every micro-batch at 8 tasks. The
    * advisory size rides `spark.sql.adaptive.advisoryPartitionSizeInBytes`
    * so cluster tuning flows through. */
  def streamPartitions(s: SparkSession,
      input: org.apache.spark.sql.DataFrame): Int = {
    val cores = math.max(1, s.sparkContext.defaultParallelism)
    val advisory = math.max(1L <<20, s.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val chunks =
      ((bytes + advisory - 1) / advisory).min(BigInt(cores)).toInt
    math.max(1, chunks)
  }

  def withStreamPartitions[T](s: SparkSession,
      input: org.apache.spark.sql.DataFrame)(body: => T): T =
    withShufflePartitions(s, streamPartitions(s, input))(body)
}

/** Shared guard for conformance entries that plant duplicate rows
  * above a fixed id offset: fail fast (with a clear message, not an
  * NPE on an empty table) if the organic id space ever grows into the
  * planted range — there the Spark plan and the oracle could disagree
  * on the doubled id. A fixture bound, not an operator limit. */
object Planting {
  val Offset = 100000L

  def requireHeadroom(df: DataFrame, idCol: String, name: String): Unit = {
    // The max-id probe is an eager job per call, and most callers probe
    // the SAME immutable testdata scan (the r21 job profile counted one
    // ~0.1–0.3 s job per planted entry) — memoize the verdict per
    // (session, analyzed-plan, id column). Distinct inputs (filtered
    // slices, other tables) get their own entry; the check itself is
    // unchanged.
    val key = "headroom|" + idCol + "|" +
      df.queryExecution.analyzed.semanticHash()
    val ok = SessionMemo(df.sparkSession, "", key) {
      val row = df.agg(max(idCol)).head()
      // empty table: max is NULL — trivially under the bound
      java.lang.Boolean.valueOf(row.isNullAt(0) || row.getLong(0) < Offset)
    }
    require(ok.booleanValue(), s"$name planting assumes $idCol < $Offset")
  }
}

/** Exact-arithmetic helpers shared by query modules. */
object Exact {
  /** Cast a 2-dp double column to exact decimal (lossless for testdata
    * lineitem/customer money columns, which are generated at 2 dp). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** For full-precision doubles (e.g. o_totalprice): fix a 4-dp grid before
    * aggregation so both engines sum identical decimals. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a 2-dp double column, surfaced as
    * double (bit-identical in Spark and DuckDB). */
  def sumExact2(c: Column): Column = sum(dec2(c)).cast("double")

  def sumExact4(c: Column): Column = sum(dec4(c)).cast("double")

  /** avg = exact decimal sum (as double) / count — one IEEE division, same
    * result in both engines. */
  def avgExact2(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1))
}

/** Oracle SQL fragments shared across query modules (one definition —
  * the same no-copies rule as [[graft.text.Tokens]]: every module that
  * tokenizes in DuckDB references THIS rendering). */
private[queries] object OracleCtes {
  /** The corpus tokenization rule as a DuckDB CTE (mirrors
    * `graft.text.Tokens.ws` over lowered trimmed text). */
  def tokCteFor(src: String): String =
    s"""tok AS (
         SELECT doc_id,
                list_filter(string_split(lower(trim(text)), ' '),
                            t -> t <> '') AS ts,
                text
         FROM $src
       )"""

  val tokCte: String = tokCteFor("documents")

  // language-ID stop lists (text_langid / text_quality oracles)
  val enList = "['the','a','of','and','to','in']"
  val esList = "['el','la','de','y','que','los']"
  val deList = "['der','die','das','und','ist']"

  /** text_quality_gate's metric CTE (expects the `tok` CTE in scope) —
    * ONE rendering shared by the text_quality_gate oracle and the
    * curate-v8 caption gate, mirroring
    * [[graft.text.TextAnalysis.qualityGate]]'s default dials. */
  val qualityMetricsCte: String =
    """m AS (
         SELECT doc_id,
                CAST(len(ts) AS INT) AS n_words,
                CASE WHEN len(ts) > 0
                     THEN CAST(list_sum(list_transform(ts, w -> length(w))) AS DOUBLE) / len(ts)
                     ELSE 0.0 END AS mean_word_len,
                CASE WHEN length(text) > 0
                     THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS symbol_ratio
         FROM tok)"""

  /** The keep predicate over [[qualityMetricsCte]]'s columns. */
  val qualityKeepSql: String =
    """(n_words BETWEEN 30 AND 10000)
         AND (mean_word_len BETWEEN 3.0 AND 10.0)
         AND (symbol_ratio <= 0.1)"""
}
