package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Generated properties for the round-3 primitives: XOR-mask minhash
  * signatures and int8 quantization. One batched Spark action per
  * property (per-sample actions would be prohibitively slow).
  */
class LshPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private val wordGen = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
  private val setGen = Gen.nonEmptyListOf(wordGen).map(_.distinct)

  test("minhash signature: monotone under superset (min can only decrease)") {
    val samples = Gen.listOfN(40, Gen.zip(setGen, setGen)).sample.get
    val rows = samples.map { case (a, extra) => (a, (a ++ extra).distinct) }
      .toDF("s", "sup")
      .select(
        LshFunctions.minhash_signature_long(
          LshFunctions.hashed_shingles(col("s")), 8).as("siga"),
        LshFunctions.minhash_signature_long(
          LshFunctions.hashed_shingles(col("sup")), 8).as("sigsup"))
      .collect()
    rows.foreach { r =>
      val (sa, ssup) = (r.getSeq[Long](0), r.getSeq[Long](1))
      sa.zip(ssup).foreach { case (x, y) =>
        assert(y <= x, s"superset minhash increased: $y > $x")
      }
    }
  }

  test("minhash signature: order- and duplicate-invariant") {
    val samples = Gen.listOfN(40, setGen).sample.get
    val rows = samples.map(s => (s, scala.util.Random.shuffle(s ++ s)))
      .toDF("s", "perm")
      .select(
        LshFunctions.minhash_signature_long(
          LshFunctions.hashed_shingles(array_distinct(col("s"))), 8).as("a"),
        LshFunctions.minhash_signature_long(
          LshFunctions.hashed_shingles(array_distinct(col("perm"))), 8).as("b"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("fused band keys/signature ≡ composed forms on generated shingle sets") {
    val samples = Gen.listOfN(40, setGen).sample.get
    val rows = samples.toDF("s")
      .select(LshFunctions.hashed_shingles(col("s")).as("hs"))
      .select(
        LshFunctions.minhash_band_keys(col("hs"), 8, 4).as("fk"),
        LshFunctions.band_keys(
          transform(LshFunctions.minhash_signature_long(col("hs"), 8),
            v => v.cast("string")), 4, 2, "|").as("ck"),
        LshFunctions.minhash_signature_fused(col("hs"), 8).as("fs"),
        LshFunctions.minhash_signature_long(col("hs"), 8).as("cs"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("agreeing-seed estimate: 1 on identical sets, superset agreement bounds interpolate") {
    val samples = Gen.listOfN(40, setGen).sample.get
    val seeds = 12
    val est = (a: String, b: String) =>
      org.apache.spark.sql.functions.aggregate(
        zip_with(LshFunctions.minhash_signature_fused(
            LshFunctions.hashed_shingles(col(a)), seeds),
          LshFunctions.minhash_signature_fused(
            LshFunctions.hashed_shingles(col(b)), seeds),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v)
    val rows = samples.map(s => (s, s)).toDF("a", "b")
      .select(est("a", "b").as("same")).collect()
    rows.foreach(r => assert(r.getInt(0) == seeds))
  }

  test("quantize_int8: invariant under exact power-of-two rescaling") {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100.0, 100.0))
      .retryUntil(v => v.exists(x => math.abs(x) > 1e-6))
    val samples = Gen.listOfN(40, Gen.zip(vecGen, Gen.oneOf(2.0, 4.0, 8.0))).sample.get
    val rows = samples.map { case (v, a) => (v, v.map(_ * a)) }
      .toDF("v", "scaled")
      .select(VectorFunctions.quantize_int8(col("v")).as("qa"),
        VectorFunctions.quantize_int8(col("scaled")).as("qb"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Double](0) == r.getSeq[Double](1)))
  }

  test("jaccard: 1 on identical sets, 0 on disjoint, long and string paths agree") {
    val samples = Gen.listOfN(40, Gen.zip(setGen, setGen)).sample.get
    val rows = samples
      .map { case (a, b) => (a, b.map(_ + "_x")) } // force disjoint
      .toDF("a", "b")
      .select(
        LshFunctions.jaccard(col("a"), col("a")).as("self_str"),
        LshFunctions.jaccard(col("a"), col("b")).as("disj_str"),
        LshFunctions.jaccard(LshFunctions.hashed_shingles(col("a")),
          LshFunctions.hashed_shingles(col("a"))).as("self_long"),
        LshFunctions.jaccard(LshFunctions.hashed_shingles(col("a")),
          LshFunctions.hashed_shingles(col("b"))).as("disj_long"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 1.0 && r.getDouble(2) == 1.0)
      assert(r.getDouble(1) == 0.0 && r.getDouble(3) == 0.0)
    }
  }
}
