package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.ArrayDotProduct.array_dot

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): k-means cluster the embedding
  * corpus, score cosine ONLY within each cluster, call pairs above the
  * threshold semantic duplicates, and keep one representative per
  * duplicate group.
  *
  * Why this shape survives 100 TB: all-pairs cosine is O(N²) and dies
  * first. Clustering bounds the quadratic term to Σ|cell|² — with
  * C ≈ √N cells the total pair work is O(N^1.5), and the only corpus-
  * wide passes are the Lloyd rounds (linear scans with a C·d metadata
  * reduction, [[Similarity.buildIvfIndex]]). The price is recall, not
  * precision: a cross-cell near-dup pair is missed, a reported pair is
  * always real. Two consequences the spec pins:
  *
  *   - `numCells = 1` degenerates to the exact all-pairs graph, so the
  *     clustered path and [[semanticDedupExhaustive]] agree bit-for-bit;
  *   - fewer edges only SPLIT duplicate groups, and each fragment's
  *     minimum is ≥ its group's minimum, so every exhaustive keeper is
  *     also a clustered keeper (keep-set is a superset — clustering can
  *     under-delete, never wrongly delete).
  *
  * Within a cell, pair generation reuses the block-pair decomposition
  * of [[Similarity.cosineNearDupPairs]] with the cell id added to the
  * join key: per-task memory is one sub-block of one cell even when a
  * cell runs hot, and each unordered pair meets in exactly one
  * (cell, block-pair) group.
  */
object SemDedup {

  /** Exact near-dup pairs within each cell. `cells` carries
    * (vec_id, cell, vd, norm); output is (id1 < id2, cosine) for pairs
    * in the SAME cell with cosine strictly above `threshold` (same
    * strict comparison as [[Similarity.cosineNearDupPairs]], so the
    * one-cell degenerate case matches it exactly). */
  private[sim] def withinCellPairs(cells: DataFrame, threshold: Double,
      numBlocks: Int = 4): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val v = cells.withColumn("blk", pmod(hash(col("vec_id")), lit(numBlocks)))
    val blockPairs = (for { bi <- 0 until numBlocks; bj <- bi until numBlocks }
      yield (bi, bj, bi * numBlocks + bj)).toDF("bi", "bj", "pair_id")
    val l = v.join(broadcast(blockPairs), col("blk") === col("bi"))
      .select(col("cell"), col("pair_id"), col("bi"), col("bj"),
        col("vec_id").as("ida"), col("vd").as("vda"), col("norm").as("na"))
    val r = v.join(broadcast(blockPairs), col("blk") === col("bj"))
      .select(col("cell"), col("pair_id"), col("vec_id").as("idb"),
        col("vd").as("vdb"), col("norm").as("nb"))
    l.join(r, Seq("cell", "pair_id"))
      .filter(col("bi") < col("bj") || col("ida") < col("idb"))
      .withColumn("cosine",
        array_dot(col("vda"), col("vdb")) / (col("na") * col("nb")))
      .filter(col("cosine") > threshold)
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("cosine"))
  }

  /** (vec_id, semantic_id, keep) for every input vector: semantic_id is
    * the connected-component label of the near-dup graph (min reachable
    * id — [[Dedup.connectedComponents]]'s rule; singletons label
    * themselves), keep ⇔ the vector IS its group's label. */
  private def keeperLabels(embeddings: DataFrame,
      pairs: DataFrame): DataFrame = {
    val labels = Dedup.connectedComponents(pairs.select("id1", "id2"))
      .withColumnRenamed("id", "vec_id")
    embeddings.select(col("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .withColumn("semantic_id", coalesce(col("cluster_id"), col("vec_id")))
      .withColumn("keep", col("semantic_id") === col("vec_id"))
      .select("vec_id", "semantic_id", "keep")
  }

  /** The SemDeDup scale path: k-means cells bound the pair work. The
    * Lloyd trainer is deterministic (first-C seeds, fixed iteration
    * count, order-independent decimal recentering), so the result is
    * reproducible run-to-run — but not DuckDB-expressible; conformance
    * hash-proves [[semanticDedupExhaustive]] and ScalaTest pins this
    * path's two properties against it (parity at numCells=1, keeper
    * superset at numCells>1). */
  def semanticDedup(embeddings: DataFrame, threshold: Double,
      numCells: Int = 8, iters: Int = 2, numBlocks: Int = 4): DataFrame = {
    val idx = Similarity.buildIvfIndex(embeddings, numCells, iters)
    val v = idx.cells.join(idx.vecs, Seq("vec_id"))
      .select("vec_id", "cell", "vd", "norm")
    keeperLabels(embeddings, withinCellPairs(v, threshold, numBlocks))
  }

  /** The exact twin: the full near-dup graph from
    * [[Similarity.cosineNearDupPairs]] (distributed block-pair
    * all-pairs — correct at conformance scale, quadratic at corpus
    * scale; that quadratic is exactly what [[semanticDedup]]'s cells
    * amortize). Hash-proven against a DuckDB pairwise-cosine +
    * recursive-CC oracle. */
  def semanticDedupExhaustive(embeddings: DataFrame, threshold: Double,
      numBlocks: Int = 16): DataFrame =
    keeperLabels(embeddings,
      Similarity.cosineNearDupPairs(embeddings, threshold, numBlocks))
}
