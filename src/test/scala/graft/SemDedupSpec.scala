package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.SemDedup

/** Pins the two properties that let the clustered SemDeDup path ride on
  * the hash-proven exhaustive twin (see SemDedup Scaladoc):
  * numCells=1 degenerates to the exact graph, and clustering can only
  * under-delete (keeper superset), never wrongly delete.
  */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def embs = Tables.embeddings(spark, sf0001)

  private val Tau = 0.35

  test("numCells=1 semanticDedup equals the exhaustive twin exactly") {
    val one = SemDedup.semanticDedup(embs, Tau, numCells = 1)
      .orderBy("vec_id").collect()
    val ex = SemDedup.semanticDedupExhaustive(embs, Tau)
      .orderBy("vec_id").collect()
    assert(one.sameElements(ex))
  }

  test("clustered keep-set is a superset of the exhaustive keep-set") {
    val clustered = SemDedup.semanticDedup(embs, Tau, numCells = 8)
    val exact = SemDedup.semanticDedupExhaustive(embs, Tau)
    val exKeep = exact.filter(col("keep")).select("vec_id")
    val missing = exKeep.except(
      clustered.filter(col("keep")).select("vec_id")).count()
    assert(missing === 0,
      "an exhaustive keeper was deleted by the clustered path")
    // and the clustered pass does real work: it deletes something
    assert(clustered.filter(!col("keep")).count() > 0)
  }

  test("no two kept vectors in the same cell score above the threshold") {
    // the within-cell guarantee: whatever clustering missed ACROSS
    // cells, inside a cell the kept set is near-dup-free
    val kept = SemDedup.semanticDedup(embs, Tau, numCells = 4)
      .filter(col("keep")).select("vec_id")
    val keptPairs = graft.sim.Similarity
      .cosineNearDupPairs(embs.join(kept, Seq("vec_id")), Tau)
    // recompute the cell assignment the same deterministic way and
    // check surviving pairs are all cross-cell
    val idx = graft.sim.Similarity.buildIvfIndex(embs, numCells = 4)
    val cells = idx.cells.select(col("vec_id"), col("cell"))
    val sameCell = keptPairs
      .join(cells.withColumnRenamed("vec_id", "id1")
        .withColumnRenamed("cell", "c1"), Seq("id1"))
      .join(cells.withColumnRenamed("vec_id", "id2")
        .withColumnRenamed("cell", "c2"), Seq("id2"))
      .filter(col("c1") === col("c2"))
    assert(sameCell.count() === 0,
      "a same-cell near-dup pair survived the semantic pass")
  }

  test("every vector appears exactly once with a self-or-lower label") {
    val out = SemDedup.semanticDedup(embs, Tau, numCells = 8)
    assert(out.count() === embs.count())
    assert(out.filter(col("semantic_id") > col("vec_id")).count() === 0)
    // keep flag is exactly "labels itself"
    assert(out.filter(col("keep") =!= (col("semantic_id") === col("vec_id")))
      .count() === 0)
  }
}
