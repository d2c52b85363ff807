package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch + Misra–Gries candidates: heavy-hitter detection
  * in ONE pass and fixed memory — the frequency-analysis primitive for
  * token streams too large to count exactly (Cormode & Muthukrishnan
  * 2005; Misra & Gries 1982 — both public classics).
  *
  * The sketch is a (depth × width) grid of counters; item i increments
  * cell (r, h_r(i)) per row r, and est(i) = min_r cell(r, h_r(i)).
  * Deterministic guarantees (not just probabilistic, and what
  * CountMinSpec pins): est(i) ≥ true(i) always, and est(i) ≤ true(i) +
  * (N − true(i)) / width per row in expectation, ≤ sum of colliding
  * counts exactly.
  *
  * Spark-first shape: the sketch IS a tiny aggregate table — explode
  * each item to its `depth` (row, cell) coordinates, groupBy, count.
  * Map-side partial aggregation crushes the shuffle to ≤ depth·width
  * rows per task regardless of input size, and probes are a broadcast
  * join against the ≤ depth·width cells. No driver-side state, no
  * UDAF buffers — the whole thing is codegen'd hash aggregation.
  *
  * Candidate generation at 100 TB (where `distinct tokens` is itself
  * huge): [[misraGriesCandidates]] — per-partition bounded counting
  * with decrement-eviction. Pigeonhole: an item with global count
  * ≥ φN has local count ≥ φN_p in at least one partition, and MG with
  * capacity k keeps every item with local count ≥ N_p/k, so k ≥ 1/φ
  * makes the union a guaranteed SUPERSET of the true heavy hitters;
  * the CMS estimate then filters it (est ≥ true, so no true hitter is
  * lost). False positives are the classic trade — confirm on the
  * survivors (exact twin `text_heavy_hitters_exact`), never on the
  * stream.
  */
object CountMin {

  /** 4 × 1024 longs = 32 KB — the whole summary of any stream. */
  val Depth = 4
  val Width = 1024

  private def cell(r: Int, item: Column): Column =
    pmod(xxhash64(lit(r), item), lit(Width))

  /** Build the sketch over `itemCol`: one row per occupied cell,
    * (r, h, c). ≤ Depth·Width rows however large the input. */
  def buildCells(df: DataFrame, itemCol: String): DataFrame =
    df.select(explode(array((0 until Depth).map(r =>
        struct(lit(r).as("r"), cell(r, col(itemCol)).as("h"))): _*))
        .as("rh"))
      .groupBy(col("rh.r").as("r"), col("rh.h").as("h"))
      .agg(count(lit(1)).as("c"))

  /** Merge two cell tables — sketch ADDITION, the property the whole
    * structure exists for: cells are counters, so summaries of
    * disjoint streams merge by (r, h)-keyed sum into exactly the
    * sketch of the union (bit-for-bit; pinned in the streaming
    * registry build and CountMinSpec). */
  def mergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "h").agg(sum(col("c")).as("c"))

  /** Estimate counts for a candidate set: min over the sketch rows of
    * the candidate's cell — a broadcast join against the ≤ Depth·Width
    * cell table (an absent cell means a zero count). */
  def estimate(candidates: DataFrame, itemCol: String,
      cells: DataFrame): DataFrame = {
    val probes = candidates.select(col(itemCol),
        explode(array((0 until Depth).map(r =>
          struct(lit(r).as("r"), cell(r, col(itemCol)).as("h"))): _*))
          .as("rh"))
      .select(col(itemCol), col("rh.r").as("r"), col("rh.h").as("h"))
    probes.join(broadcast(cells), Seq("r", "h"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Misra–Gries candidate generation: per-partition bounded counting
    * (capacity k; on overflow every tracked count decrements — the
    * classic frequent-items summary), survivors unioned across
    * partitions. Deliberately `mapPartitions`: this is genuine
    * per-partition imperative state that no declarative op expresses
    * in bounded memory. Output is a candidate SET (see object doc for
    * the superset guarantee); counts are not emitted — estimates come
    * from the sketch. */
  def misraGriesCandidates(df: DataFrame, itemCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counts = new scala.collection.mutable.HashMap[String, Long]()
        it.foreach { item =>
          if (counts.contains(item)) counts(item) += 1L
          else if (counts.size < k) counts(item) = 1L
          else {
            // decrement-all; drop zeros (amortized O(1) per arrival)
            val dead = List.newBuilder[String]
            counts.keysIterator.foreach { key =>
              val c = counts(key) - 1L
              if (c == 0L) dead += key else counts(key) = c
            }
            dead.result().foreach(counts.remove)
          }
        }
        counts.keysIterator
      }
      .distinct()
      .toDF(itemCol)
  }
}
