package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental bitext mining — the family-matrix completion pins: indexed
  * ≡ inline byte-identical (the stored index caches the target assignment
  * + centroids, nothing more), FailIfMissing refuses an unbuilt index, and
  * full-probe incremental mining reproduces the batch miner on the same
  * (batch × corpus) pair — the property that lets the driver's oracle be
  * the brute-force margin SQL.
  */
class BitextSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def srcSide(extra: DataFrame => DataFrame = identity): DataFrame =
    extra(Tables.embeddings(spark, dir).where(col("vec_id") % 2 === 0))
      .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("minePairsIncremental: full probe equals the batch miner on (batch × corpus)") {
    val batch = srcSide(_.where(Sampling.hashBucket(col("vec_id")) >= 50))
    val corpus = Bitext.tgtSide(spark, dir)
    // minePairs seeds centroids from the src side, incremental from the
    // stable tgt side — at full probe both candidate sets are exactly all
    // (batch × corpus) pairs, so the answers must be byte-identical
    assert(rows(Bitext.minePairsIncremental(batch, corpus, k = 4, tau = 1.0,
        nCells = 8, nProbe = 8)) ==
      rows(Bitext.minePairs(batch, corpus, k = 4, tau = 1.0,
        nCells = 8, nProbe = 8)))
  }

  test("minePairsIncrementalIndexed: equals inline, FailIfMissing refuses, build-once serve-twice") {
    val batch = srcSide(_.where(Sampling.hashBucket(col("vec_id")) >= 50))
    val corpus = Bitext.tgtSide(spark, dir)
    val inline = rows(Bitext.minePairsIncremental(batch, corpus))
    val reg = CatalogOps.indexRegistry(spark, dir)
    val name = "embeddings-bitext-cells-c8"
    if (reg.isIndexRegistered(name)) reg.dropIndex(name)
    intercept[graft.core.GraftException] {
      Bitext.minePairsIncrementalIndexed(spark, dir, batch,
        policy = graft.core.IndexPolicy.FailIfMissing).collect()
    }
    assert(rows(Bitext.minePairsIncrementalIndexed(spark, dir, batch)) == inline)
    val built = CatalogOps.indexRegistry(spark, dir).getIndex(name)
    // second probe serves the stored index: same version, no rebuild
    assert(rows(Bitext.minePairsIncrementalIndexed(spark, dir, batch)) == inline)
    assert(CatalogOps.indexRegistry(spark, dir).getIndex(name).version == built.version)
    // and FailIfMissing now serves it too (the production read path)
    assert(rows(Bitext.minePairsIncrementalIndexed(spark, dir, batch,
      policy = graft.core.IndexPolicy.FailIfMissing)) == inline)
  }

  test("minePairsIncremental2: full-open ≡ flat incremental; indexed2 ≡ inline2; FailIfMissing") {
    val batch = srcSide(_.where(Sampling.hashBucket(col("vec_id")) >= 50))
    val corpus = Bitext.tgtSide(spark, dir)
    val flat = rows(Bitext.minePairsIncremental(batch, corpus))
    // full-open two-level: exact candidates — the flat answer bit-for-bit
    // through the coarse-literal + fine-table plan
    val inline2 = rows(Bitext.minePairsIncremental2(batch, corpus,
      nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8))
    assert(inline2 == flat)
    val reg = CatalogOps.indexRegistry(spark, dir)
    val name = "embeddings-bitext-cells2-f8-c3"
    if (reg.isIndexRegistered(name)) reg.dropIndex(name)
    intercept[graft.core.GraftException] {
      Bitext.minePairsIncrementalIndexed2(spark, dir, batch,
        policy = graft.core.IndexPolicy.FailIfMissing).collect()
    }
    assert(rows(Bitext.minePairsIncrementalIndexed2(spark, dir, batch)) == inline2)
    val built = CatalogOps.indexRegistry(spark, dir).getIndex(name)
    assert(rows(Bitext.minePairsIncrementalIndexed2(spark, dir, batch)) == inline2)
    assert(CatalogOps.indexRegistry(spark, dir).getIndex(name).version == built.version)
  }

  test("minePairsIncrementalAuto: auto ≡ explicit on both sides of the threshold") {
    val batch = srcSide(_.where(Sampling.hashBucket(col("vec_id")) >= 50))
    val corpus = Bitext.tgtSide(spark, dir)
    assert(rows(Bitext.minePairsIncrementalAuto(batch, corpus,
        nCells = 8, nProbe = 8)) ==
      rows(Bitext.minePairsIncremental(batch, corpus, nCells = 8, nProbe = 8)))
    assert(rows(Bitext.minePairsIncrementalAuto(batch, corpus,
        nCells = 8, nProbe = 8, flatCellMax = 0)) ==
      rows(Bitext.minePairsIncremental2(batch, corpus,
        nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8)))
  }

  test("hubnessAuto / hubness2: full-open two-level ≡ flat; auto ≡ explicit both sides") {
    val x = srcSide()
    val y = Bitext.tgtSide(spark, dir)
    def h(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val flat = h(Bitext.hubness(x, y, k = 4, nCells = 8, nProbe = 8))
    assert(flat.nonEmpty)
    assert(h(Bitext.hubness2(x, y, k = 4, nFine = 8, nCoarse = 3,
      wCoarse = 3, nProbe = 8)) == flat)
    assert(h(Bitext.hubnessAuto(x, y, k = 4, nCells = 8, nProbe = 8)) == flat)
    assert(h(Bitext.hubnessAuto(x, y, k = 4, nCells = 8, nProbe = 8,
      flatCellMax = 0)) == flat)
  }

  test("minePairsIncremental: partial probe is a subset of the full-probe pairs") {
    // the IVF dial only removes candidates; a mutual-best pair that
    // survives a smaller candidate set need not survive the larger one,
    // but every partial-probe pair's ids must come from the batch/corpus
    // sides and the full-probe run must be exact (non-empty here)
    val batch = srcSide(_.where(Sampling.hashBucket(col("vec_id")) >= 50))
    val corpus = Bitext.tgtSide(spark, dir)
    val full = rows(Bitext.minePairsIncremental(batch, corpus, nCells = 8, nProbe = 8))
    val part = rows(Bitext.minePairsIncremental(batch, corpus, nCells = 8, nProbe = 2))
    assert(full.nonEmpty)
    val srcIds = batch.select("src_id").collect().map(_.getLong(0)).toSet
    assert(part.forall { case (s, t, _) => srcIds.contains(s) && (t % 2 == 1) })
  }
}
