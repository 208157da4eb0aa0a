package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalacheck.Gen

import graft.SparkSpec

/** [[TopCells]] is a fusion: its one contract is value-identity with the
  * composed HOF form it replaced (rounded-score ranking, cell tie-break,
  * lazy-rounding shortcut included) — pinned here over generated vectors
  * engineered to stress the rounding margin and tie paths.
  */
class TopCellsSpec extends SparkSpec {

  import spark.implicits._

  private def composed(cents: Seq[Seq[Double]], nProbe: Int) = {
    val centsLit = typedLit(cents)
    slice(
      array_sort(transform(sequence(lit(1), lit(cents.length)), ci =>
        struct(
          (lit(0.0) - round(graft.functions.VectorFunctions.cosine_sim(
            col("v"), element_at(centsLit, ci)), 6)).as("ns"),
          ci.cast("long").as("cell")))),
      1, nProbe)
  }

  private def fused(cents: Seq[Seq[Double]], nProbe: Int) =
    Bridge.column(TopCells(Bridge.expression(col("v").cast("array<double>")), cents, nProbe))

  test("fused == composed on random vectors, incl. duplicate-centroid ties and zero-norm rows") {
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0))
    val cents0 = Gen.listOfN(6, vecGen).sample.get.map(_.toVector.toSeq)
    // duplicate two centroids (guaranteed rounded ties) and add a zero
    // centroid (zero-norm arm)
    val cents = (cents0 :+ cents0.head :+ cents0(1) :+ Seq.fill(dim)(0.0)).map(_.toSeq)
    val vecs = Gen.listOfN(60, vecGen).sample.get :+
      List.fill(dim)(0.0) :+ cents0.head.toList // zero vector + exact hit
    for (nProbe <- Seq(1, 3, cents.length)) {
      val rows = vecs.toDF("v")
        .select(
          fused(cents, nProbe).as("f"),
          transform(composed(cents, nProbe), p => p.getField("cell")).as("c"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"nProbe=$nProbe fused=${r.getSeq[Long](0)} composed=${r.getSeq[Long](1)}")
      }
    }
  }

  test("fused == composed when scores crowd the rounding quantum (margin-path stress)") {
    val dim = 4
    // centroids nearly collinear with the probe: raw scores differ by
    // ~1e-7..1e-6, exactly the lazy-rounding margin band
    val base = Seq(1.0, 0.5, -0.25, 0.125)
    val cents = (0 until 12).map { i =>
      base.zipWithIndex.map { case (x, j) => x + (if (j == 0) i * 1e-7 else 0.0) }
    }
    val vecs = (0 until 20).map { i =>
      base.zipWithIndex.map { case (x, j) => x + (if (j == 1) i * 3e-8 else 0.0) }.toList
    }
    for (nProbe <- Seq(2, 4, 12)) {
      val rows = vecs.toDF("v")
        .select(
          fused(cents, nProbe).as("f"),
          transform(composed(cents, nProbe), p => p.getField("cell")).as("c"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"nProbe=$nProbe fused=${r.getSeq[Long](0)} composed=${r.getSeq[Long](1)}")
      }
    }
  }

  test("interpreted eval matches codegen") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.7, 0.7))
    val df = Seq(Seq(0.9, 0.1), Seq(0.1, 0.9), Seq(0.5, 0.5)).toDF("v")
    val viaCodegen = df.select(fused(cents, 2)).collect().map(_.getSeq[Long](0))
    // force the interpreted path
    val expr = TopCells(Bridge.expression(col("v").cast("array<double>")), cents, 2)
    val viaEval = df.select(col("v").cast("array<double>")).collect().map { r =>
      TopCells.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(r.getSeq[Double](0).toArray),
        cents.map(_.toArray).toArray,
        NearestCentroid.centroidNorms(cents.map(_.toArray).toArray), 2)
        .toLongArray().toSeq
    }
    assert(viaCodegen.map(_.toSeq).toSeq == viaEval.map(_.toSeq).toSeq)
    assert(expr.dataType.simpleString == "array<bigint>")
  }
}
