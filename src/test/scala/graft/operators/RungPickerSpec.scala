package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The flat-vs-two-level rung picker ([[Ann.FlatCellMax]]): every default
  * entry point's auto twin must be BYTE-IDENTICAL to the explicit rung call
  * on BOTH sides of the threshold — below it the flat entry point, above it
  * (forced with `flatCellMax = 0`) the two-level entry point at the derived
  * params (`nFine = nCells`, `nCoarse = wCoarse = ⌈√nCells⌉`). These pins
  * are what lets the auto queries share the explicit rungs' oracles
  * verbatim in SparkEntry.
  */
class RungPickerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema == b.schema, "schemas must match")
    // sort on the row image: operators without an ORDER BY contract (the
    // edge builds) return identical multisets in task-completion order
    val (ra, rb) = (a.collect().toSeq.sortBy(_.toString),
      b.collect().toSeq.sortBy(_.toString))
    assert(ra == rb, s"rows differ: auto=${ra.take(3)} explicit=${rb.take(3)}")
  }

  test("coarseFor: ceil-sqrt derivation") {
    assert(Ann.coarseFor(1) == 1)
    assert(Ann.coarseFor(8) == 3)
    assert(Ann.coarseFor(16) == 4)
    assert(Ann.coarseFor(10000) == 100)
  }

  test("ivfTopkAuto: flat side of the threshold IS ivfTopk") {
    same(Ann.ivfTopkAuto(spark, dir, 0L, 10, 16, 4),
      Ann.ivfTopk(spark, dir, 0L, 10, 16, 4))
  }

  test("ivfTopkAuto: forced two-level side IS ivfTopk2 at the derived params") {
    same(Ann.ivfTopkAuto(spark, dir, 0L, 10, 16, 4, flatCellMax = 0),
      Ann.ivfTopk2(spark, dir, 0L, 10, nFine = 16, nCoarse = 4,
        wCoarse = 4, nProbe = 4))
  }

  test("semanticDedupAuto: both sides of the threshold") {
    val e = Tables.embeddings(spark, dir)
    same(Dedup.semanticDedupAuto(e), Dedup.semanticDedup(e))
    same(Dedup.semanticDedupAuto(e, flatCellMax = 0),
      Dedup.semanticDedup2(e, nFine = 16, nCoarse = 4))
  }

  test("minePairsAuto: both sides of the threshold") {
    val e = Tables.embeddings(spark, dir)
    val x = e.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
    val y = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec"))
    same(Bitext.minePairsAuto(x, y, k = 4, tau = 1.0, nCells = 8, nProbe = 8),
      Bitext.minePairs(x, y, k = 4, tau = 1.0, nCells = 8, nProbe = 8))
    same(Bitext.minePairsAuto(x, y, k = 4, tau = 1.0, nCells = 8, nProbe = 8,
        flatCellMax = 0),
      Bitext.minePairs2(x, y, k = 4, tau = 1.0, nFine = 8, nCoarse = 3,
        wCoarse = 3, nProbe = 8))
  }

  test("ivfTopkIndexedAuto: both sides of the threshold (stored layouts)") {
    same(Ann.ivfTopkIndexedAuto(spark, dir, 0L, 10, 16, 4),
      Ann.ivfTopkIndexed(spark, dir, 0L, 10, 16, 4))
    same(Ann.ivfTopkIndexedAuto(spark, dir, 0L, 10, 16, 4, flatCellMax = 0),
      Ann.ivfTopk2Indexed(spark, dir, 0L, 10, nFine = 16, nCoarse = 4,
        wCoarse = 4, nProbe = 4))
  }

  test("minePairsIncrementalIndexedAuto: both sides of the threshold (stored layouts)") {
    val batch = Tables.embeddings(spark, dir)
      .where(col("vec_id") % 2 === 0 &&
        graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
      .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
    same(Bitext.minePairsIncrementalIndexedAuto(spark, dir, batch,
        k = 4, tau = 1.0, nCells = 8, nProbe = 8),
      Bitext.minePairsIncrementalIndexed(spark, dir, batch,
        k = 4, tau = 1.0, nCells = 8, nProbe = 8))
    same(Bitext.minePairsIncrementalIndexedAuto(spark, dir, batch,
        k = 4, tau = 1.0, nCells = 8, nProbe = 8, flatCellMax = 0),
      Bitext.minePairsIncrementalIndexed2(spark, dir, batch,
        k = 4, tau = 1.0, nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8))
  }

  test("indexed incremental twins are dir-convention-only: a foreign targetSide fails loudly") {
    val batch = Tables.embeddings(spark, dir)
      .where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
    val e = intercept[IllegalArgumentException] {
      Bitext.minePairsIncrementalIndexed(spark, dir, batch,
        targetSide = "vec_id%3=0")
    }
    assert(e.getMessage.contains("dir-convention-only"))
  }

  test("minePairsAuto: full-open dial is rung-independent (exact either way)") {
    // the registered bitext dial is nProbe = nCells (exact candidates), so
    // the two rungs must agree with EACH OTHER, not just each with itself —
    // this is what lets one brute-force oracle serve both auto twins
    val e = Tables.embeddings(spark, dir)
    val x = e.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
    val y = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec"))
    same(Bitext.minePairsAuto(x, y, nCells = 8, nProbe = 8),
      Bitext.minePairsAuto(x, y, nCells = 8, nProbe = 8, flatCellMax = 0))
  }

  test("annEdgesAuto + similarityPageRankAnnAuto: both sides of the threshold") {
    val e = Tables.embeddings(spark, dir)
    same(Centrality.annEdgesAuto(e, k = 5, nCells = 16, nProbe = 4),
      Centrality.annEdges(e, k = 5, nCells = 16, nProbe = 4))
    same(Centrality.annEdgesAuto(e, k = 5, nCells = 16, nProbe = 4,
        flatCellMax = 0),
      Centrality.annEdges2(e, k = 5, nFine = 16, nCoarse = 4, wCoarse = 4,
        nProbe = 4))
    same(Centrality.similarityPageRankAnnAuto(e, flatCellMax = 0),
      Centrality.similarityPageRankAnn2(e, nFine = 16, nCoarse = 4,
        wCoarse = 4, nProbe = 4))
  }
}
