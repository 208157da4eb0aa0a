package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** PQ encode/decode semantics: per-subspace independent argmin, exact
  * reconstruction of codebook members, first-index tie-breaks, and input
  * guards — the contract the pq_err / pq_topk oracles lean on.
  */
class PqReconstructSpec extends SparkSpec {

  import spark.implicits._

  // 2 subspaces × 2 dims; 2 codes: code 0 = (0,0), code 1 = (10,10) per subspace
  private val cb: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
    Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))

  private def reconstruct(v: Seq[Double]): Seq[Double] = {
    val df = Seq(Tuple1(v)).toDF("v")
    df.select(Bridge.column(PqReconstruct(
      Bridge.expression(col("v").cast("array<double>")), cb)).as("r"))
      .collect().head.getSeq[Double](0)
  }

  test("subspaces quantize independently; codebook members reconstruct exactly") {
    // close to code 1 in subspace 0, code 0 in subspace 1
    assert(reconstruct(Seq(9.0, 8.0, 1.0, 2.0)) == Seq(10.0, 10.0, 0.0, 0.0))
    // exact codebook member is a fixed point
    assert(reconstruct(Seq(10.0, 10.0, 10.0, 10.0)) == Seq(10.0, 10.0, 10.0, 10.0))
  }

  test("equidistant input snaps to the FIRST code (oracle list_position semantics)") {
    assert(reconstruct(Seq(5.0, 5.0, 5.0, 5.0)) == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("codes: 0-based per-subspace assignments") {
    val v = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(9.0, 8.0, 1.0, 2.0))
    val codes = PqReconstruct.codes(v, cb.map(_.map(_.toArray).toArray).toArray)
    assert(codes.toSeq == Seq(1, 0))
  }

  test("decode(codes(v)) == reconstruct(v); corrupt codes raise") {
    val cbArr = cb.map(_.map(_.toArray).toArray).toArray
    val v = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(9.0, 8.0, 1.0, 2.0))
    val codes = PqReconstruct.codesArrayData(v, cbArr)
    assert(PqReconstruct.decode(codes, cbArr).toDoubleArray.toSeq ==
      PqReconstruct.compute(v, cbArr).toDoubleArray.toSeq)
    val bad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(7L, 0L))
    val e = intercept[org.apache.spark.SparkException] { PqReconstruct.decode(bad, cbArr) }
    assert(e.getMessage.contains("out of range"))
  }

  test("dimension mismatch raises instead of reading out of bounds") {
    val e = intercept[Exception] { reconstruct(Seq(1.0, 2.0, 3.0)) }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).flatMap(c => Option(c.getMessage)).exists(_.contains("dimension")))
  }
}
