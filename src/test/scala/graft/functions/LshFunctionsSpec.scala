package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Public LSH primitive surface. */
class LshFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("word_shingles: n-grams, distinct, short-text empty") {
    val df = Seq(
      (1, "a b c d"),
      (2, "x y"),
      (3, "r r r r")  // repeated trigram collapses
    ).toDF("id", "text")
    val rows = df.select(col("id"), LshFunctions.word_shingles("text", 3).as("s"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](1).isEmpty)
    assert(rows(2).getSeq[String](1) == Seq("r r r"))
  }

  test("minhash_signature: deterministic, seed-sensitive, signature length") {
    val df = Seq((1, Seq("aa", "bb", "cc"))).toDF("id", "s")
    val sig1 = df.select(LshFunctions.minhash_signature(col("s"), 4)).head().getSeq[String](0)
    val sig2 = df.select(LshFunctions.minhash_signature(col("s"), 4)).head().getSeq[String](0)
    assert(sig1 == sig2 && sig1.length == 4)
    assert(sig1.distinct.length > 1, "different seeds should generally pick different minima")
    sig1.foreach(h => assert(h.matches("[0-9a-f]{32}")))
  }

  test("minhash union law: sig(A ∪ B) is the element-wise min of sig(A) and sig(B)") {
    // the algebraic property banded LSH soundness rests on (and what lets
    // a distributed mine compute signatures per shard and MERGE them):
    // min over a union = min of the mins, per XOR-masked seed
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong() & ((1L << 56) - 1))
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong() & ((1L << 56) - 1))
      val row = Seq((a, b, (a ++ b).distinct)).toDF("a", "b", "u")
        .select(
          LshFunctions.minhash_signature_long(col("a"), 8),
          LshFunctions.minhash_signature_long(col("b"), 8),
          LshFunctions.minhash_signature_long(col("u"), 8))
        .head()
      val (sa, sb, su) = (row.getSeq[Long](0), row.getSeq[Long](1), row.getSeq[Long](2))
      su.indices.foreach { i =>
        assert(su(i) == math.min(sa(i), sb(i)),
          s"seed $i: sig(A∪B)=${su(i)} != min(${sa(i)}, ${sb(i)})")
      }
    }
  }

  test("simhash_bits + band_keys: bit count, binary alphabet, band split") {
    val df = Seq((1, Seq.tabulate(8)(i => i.toDouble - 3.5))).toDF("id", "v")
    val bits = df.select(LshFunctions.simhash_bits(col("v"), 12, 8)).head().getSeq[String](0)
    assert(bits.length == 12 && bits.forall(b => b == "0" || b == "1"))
    val keys = df.select(LshFunctions.band_keys(
      LshFunctions.simhash_bits(col("v"), 12, 8), 3, 4)).head().getSeq[String](0)
    assert(keys.length == 3 && keys.forall(_.length == 4))
    assert(keys.mkString == bits.mkString)
  }

  test("jaccard: exact ratios on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(LshFunctions.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
  }

  test("hash56 native ≡ composed conv(substring(md5)) form") {
    val df = Seq("", "a", "spark graft", "héllo ωorld", "x" * 500).toDF("t")
    val rows = df.select(
      LshFunctions.hash56(col("t")).as("fused"),
      conv(substring(md5(col("t").cast("binary")), 1, 14), 16, 10).cast("long").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("char_shingle_hash56 ≡ hash56 over char n-grams (set-equal, incl. multibyte)") {
    val df = Seq("", "ab", "abcdefgh", "ααββγγδδεε", "a b  c\td", "x" * 50).toDF("t")
    val composed = expr(
      """CASE WHEN length(t) >= 4 THEN
        |  array_distinct(transform(sequence(0, length(t) - 4),
        |    i -> substring(t, i + 1, 4)))
        |ELSE array() END""".stripMargin)
    val rows = df.select(
      LshFunctions.char_shingle_hash56(col("t"), 4).as("fused"),
      LshFunctions.hashed_shingles(composed).as("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet)
      assert(r.getSeq[Long](0).distinct.size == r.getSeq[Long](0).size)
    }
  }

  test("minhash_band_keys fused ≡ composed band_keys(minhash_signature_long)") {
    val df = Seq("abcdefghijklm", "spark graft near dedup", "ωμυλτι βψτε τεξτ here",
      "x" * 200, "shortish")
      .toDF("t")
      .select(LshFunctions.char_shingle_hash56(col("t"), 4).as("hs"))
    val rows = df.select(
      LshFunctions.minhash_band_keys(col("hs"), 12, 4).as("fused"),
      LshFunctions.band_keys(
        transform(LshFunctions.minhash_signature_long(col("hs"), 12),
          v => v.cast("string")), 4, 3, "|").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // empty shingle array → empty key array (callers precondition empties out)
    val empty = Seq("ab").toDF("t")
      .select(LshFunctions.char_shingle_hash56(col("t"), 4).as("hs"))
      .select(LshFunctions.minhash_band_keys(col("hs"), 12, 4).as("k"))
      .collect()
    assert(empty.head.getSeq[String](0).isEmpty)
  }

  test("minhash_signature_fused ≡ composed minhash_signature_long") {
    val df = Seq("abcdefghijkl", "spark graft near dedup approx", "y" * 120)
      .toDF("t")
      .select(LshFunctions.char_shingle_hash56(col("t"), 4).as("hs"))
    val rows = df.select(
      LshFunctions.minhash_signature_fused(col("hs"), 12).as("fused"),
      LshFunctions.minhash_signature_long(col("hs"), 12).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("word_shingle_hash56 ≡ hash56 over word n-grams (set-equal, empties kept)") {
    val df = Seq("", "a b", "a b c d e", "a  b c", " lead", "trail ", "ω multi byte token ω")
      .toDF("t")
    val composed = expr(
      """CASE WHEN size(split(t, ' ')) >= 3 THEN
        |  array_distinct(transform(sequence(0, size(split(t, ' ')) - 3),
        |    i -> concat_ws(' ', slice(split(t, ' '), i + 1, 3))))
        |ELSE array() END""".stripMargin)
    val rows = df.select(
      LshFunctions.word_shingle_hash56(col("t"), 3).as("fused"),
      LshFunctions.hashed_shingles(composed).as("composed")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet))
  }
}
