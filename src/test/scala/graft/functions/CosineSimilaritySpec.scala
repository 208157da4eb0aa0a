package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalactic.Tolerance

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** Cosine-similarity axioms, mirroring the reference's scalar tests
  * (`/root/reference/utils/utils_test.go:7-53`) plus ScalaCheck-generated
  * property tests per SURVEY.md §5.2 (generators drive batched Spark jobs —
  * one action per property, not one per sample).
  */
class CosineSimilaritySpec extends SparkSpec with Tolerance {

  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("c"))
      .head().getDouble(0)

  test("identical vectors score 1.0 (utils_test.go: equal case)") {
    assert(cos(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) === 1.0 +- 1e-12)
  }

  test("opposite vectors score -1.0") {
    assert(cos(Seq(1.0, 2.0, 3.0), Seq(-1.0, -2.0, -3.0)) === -1.0 +- 1e-12)
  }

  test("orthogonal vectors score 0.0") {
    assert(cos(Seq(1.0, 0.0), Seq(0.0, 1.0)) === 0.0 +- 1e-12)
  }

  test("zero vector scores 0.0, never NaN (utils.go:19-21)") {
    assert(cos(Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0)) === 0.0)
    assert(cos(Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0, 0.0)) === 0.0)
    assert(cos(Seq(0.0), Seq(0.0)) === 0.0)
  }

  test("length mismatch errors (utils.go:11-13)") {
    val e = intercept[Exception] { cos(Seq(1.0, 2.0), Seq(1.0)) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("equal length")))
  }

  test("NULL input yields NULL (SQL-standard extension)") {
    val row = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("c"))
      .head()
    assert(row.isNullAt(0))
  }

  test("SQL surface: cosine_sim registered and callable") {
    VectorFunctions.registerAll(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(r.getDouble(0) === 1.0 +- 1e-12)
  }

  test("SQL surface: wrong arity is an analysis error, not IndexOutOfBounds") {
    VectorFunctions.registerAll(spark)
    val e = intercept[Exception] { spark.sql("SELECT cosine_sim(array(1.0d))").collect() }
    assert(!e.isInstanceOf[IndexOutOfBoundsException])
  }

  test("SQL surface: graft_embed matches the registry embedder exactly") {
    VectorFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_embed('local/hash-8', cast('hello' as binary)) AS v").head().getSeq[Double](0)
    val expected = graft.core.Embedders.hashProjection(8)("hello".getBytes("UTF-8"))
    assert(got == expected.toSeq)
  }

  // --- ScalaCheck properties (SURVEY §5.2) -------------------------------

  private val dim = 8
  private val vecGen: Gen[Seq[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-100.0, 100.0)).map(_.toSeq)
  private val nonZeroVecGen: Gen[Seq[Double]] =
    vecGen.retryUntil(v => v.exists(x => math.abs(x) > 1e-6))

  // Evaluate the Catalyst expression over a batch of pairs in one job
  // (one Spark action per `forAll` sample would be prohibitively slow).
  private def cosBatch(pairs: Seq[(Seq[Double], Seq[Double])]): Seq[Double] =
    pairs.toDF("a", "b").select(cosine_sim(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq

  test("property: symmetry cos(x,y) == cos(y,x)") {
    val pairs = Gen.listOfN(50, Gen.zip(vecGen, vecGen)).sample.get
    val fwd = cosBatch(pairs)
    val bwd = cosBatch(pairs.map(_.swap))
    fwd.zip(bwd).foreach { case (f, b) => assert(f === b +- 1e-9) }
  }

  test("property: cos(x,x) == 1 for non-zero x") {
    val vs = Gen.listOfN(50, nonZeroVecGen).sample.get
    cosBatch(vs.map(v => (v, v))).foreach(c => assert(c === 1.0 +- 1e-9))
  }

  test("property: scale invariance cos(ax,y) == cos(x,y) for a > 0") {
    val samples = Gen.listOfN(30, Gen.zip(nonZeroVecGen, nonZeroVecGen,
      Gen.chooseNum(0.1, 50.0))).sample.get
    val base = cosBatch(samples.map { case (x, y, _) => (x, y) })
    val scaled = cosBatch(samples.map { case (x, y, a) => (x.map(_ * a), y) })
    base.zip(scaled).foreach { case (b, s) => assert(b === s +- 1e-9) }
  }

  test("property: range — |cos| <= 1") {
    val pairs = Gen.listOfN(80, Gen.zip(vecGen, vecGen)).sample.get
    cosBatch(pairs).foreach(c => assert(math.abs(c) <= 1.0 + 1e-12))
  }

  test("helpers: dot_product / l2_norm / l2_dist agree with direct math") {
    val df = Seq((Seq(3.0, 4.0), Seq(1.0, 2.0))).toDF("a", "b")
    val Row(dp: Double, n: Double, d: Double) = df.select(
      dot_product(col("a"), col("b")),
      l2_norm(col("a")),
      l2_dist(col("a"), col("b"))).head()
    assert(dp === 11.0 +- 1e-12)
    assert(n === 5.0 +- 1e-12)
    assert(d === math.sqrt(4.0 + 4.0) +- 1e-12)
  }
}
