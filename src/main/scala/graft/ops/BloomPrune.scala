package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter lever for the
  * key-set size band where neither standard join shape wins: the dim
  * key set is too large to broadcast exactly, but the fact side is
  * vastly larger still, so shuffling the whole fact table for a
  * SortMergeJoin moves terabytes to discard most of them. A Bloom
  * sketch of the dim keys (9.6 bits/key at 1% fpp — 120 MB for 100 M
  * keys, vs gigabytes exact) filters the fact table BEFORE its
  * exchange; only the ≤fpp false-positive remnant plus true matches
  * shuffle into the exact join.
  *
  * No false negatives, so `prefilter ∘ exact-join ≡ exact-join` — the
  * conformance entry hash-proves exactly that equivalence, and the
  * sketch's selectivity is pinned in spec (false-positive rate ≤ 3·fpp
  * on planted non-members).
  *
  * This is the explicit, composable form of what AQE's
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects for
  * equi-joins it can see through; a library operator needs the
  * explicit form for pipelines (e.g. decontamination, keep-list
  * application) whose "join" is split across stages or sessions — the
  * serialized sketch travels as plain bytes.
  *
  * Mechanics: keys are pre-hashed with `xxhash64` on BOTH sides (the
  * same discipline Spark's own runtime-filter rewrite uses), the
  * sketch is built by the distributed `stat.bloomFilter` aggregate,
  * and the probe is the codegen'd [[BloomFilterMightContain]]
  * predicate over a binary literal — no UDF, constant-folded filter
  * side, whole-stage-codegen probe side.
  */
object BloomPrune {

  /** A serialized Bloom sketch of `dim`'s `dimKey` values (xxhash64'd
    * before insertion — probe with [[mightContain]], not raw keys).
    * NULL dim keys are excluded: Spark's hash expressions skip null
    * children and return the SEED for an all-null row (xxhash64(NULL)
    * = 42, never NULL), so without the filter a null dim key would
    * admit every null probe key through the sketch. */
  def buildKeySketch(dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val keys = dim.filter(col(dimKey).isNotNull)
      .select(xxhash64(col(dimKey)).as("__h"))
    // Spark's stat.bloomFilter NPEs on an EMPTY input (null aggregate
    // buffer); an empty key set is a legitimate dim (e.g. a re-delivered
    // batch with nothing new) and must yield a match-nothing sketch
    val bf =
      if (keys.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else keys.stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe of `key` against a [[buildKeySketch]]
    * sketch. NULL keys probe FALSE (explicit null gate — xxhash64 of a
    * NULL is the seed constant, not NULL, so the raw probe alone would
    * treat nulls as a real key) — matching semi-join semantics, where
    * NULL never matches, even when the probe is used standalone. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    key.isNotNull && GraftSqlShim.toColumn(BloomFilterMightContain(
      Literal(sketch),
      GraftSqlShim.toExpression(xxhash64(key))))

  /** Exact left-semi join with a Bloom prefilter on the fact side: the
    * fact exchange sees only sketch-passing rows. Result is EXACT (the
    * inner semi join removes false positives). */
  def semiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = buildKeySketch(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(sketch, col(factKey)))
      .join(dim.select(col(dimKey).as("__dk")).distinct(),
        col(factKey) === col("__dk"), "left_semi")
  }
}
