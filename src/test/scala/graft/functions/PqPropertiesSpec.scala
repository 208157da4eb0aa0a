package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Generated properties of the PQ encode/decode pair — the argmin
  * optimality and idempotence laws the oracle queries lean on, checked
  * over random vectors and codebooks (no Spark session needed: the
  * expressions' compute kernels are plain functions).
  */
class PqPropertiesSpec extends AnyFunSuite {

  private def vecGen(n: Int): Gen[Array[Double]] =
    Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toArray)

  private final case class Case(m: Int, dsub: Int, v: Array[Double],
                                cb: Array[Array[Array[Double]]])

  private val caseGen: Gen[Case] = for {
    m <- Gen.choose(1, 4)
    dsub <- Gen.choose(1, 4)
    kCodes <- Gen.choose(1, 6)
    v <- vecGen(m * dsub)
    cb <- Gen.listOfN(m, Gen.listOfN(kCodes, vecGen(dsub)))
  } yield Case(m, dsub, v, cb.map(_.toArray).toArray)

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  test("chosen code is L2-optimal per subspace; decode∘codes == reconstruct; idempotent") {
    val cases = Gen.listOfN(200, caseGen).sample.get
    cases.foreach { c =>
      val vd = ArrayData.toArrayData(c.v)
      val codes = PqReconstruct.codes(vd, c.cb)
      val rec = PqReconstruct.compute(vd, c.cb).toDoubleArray

      (0 until c.m).foreach { s =>
        val sub = c.v.slice(s * c.dsub, (s + 1) * c.dsub)
        val chosen = sqDist(sub, c.cb(s)(codes(s)))
        // optimality: no other code is strictly closer
        assert(c.cb(s).forall(cent => chosen <= sqDist(sub, cent)))
        // reconstruction is exactly the chosen centroid
        assert(rec.slice(s * c.dsub, (s + 1) * c.dsub).sameElements(c.cb(s)(codes(s))))
      }
      // decode of the stored codes equals direct reconstruction
      val decoded = PqReconstruct.decode(
        ArrayData.toArrayData(codes.map(_.toLong)), c.cb).toDoubleArray
      assert(decoded.sameElements(rec))
      // idempotence: reconstructing a reconstruction is a fixed point
      val rec2 = PqReconstruct.compute(ArrayData.toArrayData(rec), c.cb).toDoubleArray
      assert(rec2.sameElements(rec))
    }
  }
}
