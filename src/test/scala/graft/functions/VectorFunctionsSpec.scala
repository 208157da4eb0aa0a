package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** Vector math helpers: int8 quantization round-trip bounds and the norm /
  * distance compositions the stats operators build on.
  */
class VectorFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("quantize_int8: values integral in [-127, 127], extreme maps to ±127") {
    val df = Seq(Seq(0.5, -1.0, 0.25, 0.0)).toDF("v")
      .select(quantize_int8(col("v")).as("q"))
    val q = df.collect().head.getSeq[Double](0)
    assert(q == Seq(64.0, -127.0, 32.0, 0.0)) // 0.5*127/1 = 63.5 → HALF_UP 64
    assert(q.forall(x => x == math.rint(x) && math.abs(x) <= 127))
  }

  test("dequantize error bounded by scale/2 per component") {
    val vs = Seq(Seq(0.123, -0.456, 0.789, -0.001, 0.999),
      Seq(1e-6, -1e-6, 5e-7, 0.0, 1e-6))
    val rows = vs.toDF("v")
      .select(col("v"),
        dequantize_int8(quantize_int8(col("v")), max_abs(col("v"))).as("d"),
        (max_abs(col("v")) / lit(127.0)).as("scale"))
      .collect()
    rows.foreach { r =>
      val (v, d) = (r.getSeq[Double](0), r.getSeq[Double](1))
      val halfScale = r.getDouble(2) / 2
      v.zip(d).foreach { case (x, y) =>
        assert(math.abs(x - y) <= halfScale + 1e-12, s"$x vs $y (half-scale $halfScale)")
      }
    }
  }

  test("zero vector quantizes to zeros; l2 helpers agree with direct math") {
    val r = Seq((Seq(0.0, 0.0), Seq(3.0, 4.0))).toDF("z", "v")
      .select(quantize_int8(col("z")).as("qz"), l2_norm(col("v")).as("n"),
        l2_dist(col("z"), col("v")).as("d"), dot_product(col("v"), col("v")).as("dp"))
      .collect().head
    assert(r.getSeq[Double](0) == Seq(0.0, 0.0))
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) == 25.0)
  }
}
