package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable LSH / sketching primitives over Columns — the public building
  * blocks behind `operators.Dedup` and `operators.Ann`, exposed so pipelines
  * can mix them (e.g. store a signature column at ingest, band it at query
  * time).
  *
  * All primitives are built-in codegen'd expressions seeded from md5, so
  * results are deterministic across engines (see SURVEY.md §2.6 on oracle
  * reproducibility) and across JVMs/executors.
  */
object LshFunctions {

  /** Distinct word n-gram shingles of a text column (split on single
    * spaces). Rows with fewer than `n` tokens yield an empty array. */
  def word_shingles(textCol: String, n: Int): Column = {
    val t = s"filter(split($textCol, ' '), x -> x != '')"
    expr(
      s"""CASE WHEN size($t) >= $n THEN
         |  array_distinct(transform(sequence(0, size($t) - $n),
         |    i -> concat_ws(' ', slice($t, i + 1, $n))))
         |ELSE array() END""".stripMargin)
  }

  /** Distinct character n-gram shingles of a text column. Robust to
    * whitespace-free text (CJK, code, minified HTML) where word shingles
    * degenerate; rows shorter than `n` chars yield an empty array. */
  def char_shingles(textCol: String, n: Int): Column =
    expr(
      s"""CASE WHEN length($textCol) >= $n THEN
         |  array_distinct(transform(sequence(0, length($textCol) - $n),
         |    i -> substring($textCol, i + 1, $n)))
         |ELSE array() END""".stripMargin)

  /** MinHash signature: element s = min over shingles of md5("<s>_" ‖
    * shingle) — fixed-width hex strings, so lexicographic min ≡ numeric. */
  def minhash_signature(shinglesCol: Column, seeds: Int): Column =
    transform(sequence(lit(0), lit(seeds - 1)), sd =>
      array_min(transform(shinglesCol, x =>
        md5(concat(sd.cast("string"), lit("_"), x)))))

  /** 56-bit integer fingerprint per shingle — md5 evaluated ONCE per
    * shingle (the seeded variants derive from this by integer arithmetic,
    * see [[minhash_signature_long]]; seed-prefixed md5 costs seeds× more
    * digests and dominates the dedup profile). First 14 hex digits parsed
    * as an integer — DuckDB reproduces it exactly via
    * `('0x' || substr(md5(x), 1, 14))::UBIGINT`. */
  def hashed_shingles(shinglesCol: Column): Column =
    transform(shinglesCol, x => hash56(x))

  /** THE cross-engine 56-bit fingerprint: first 14 hex digits of md5 as a
    * BIGINT. Every hash-derived surface (shingles, sampling buckets,
    * winnowing) goes through this one definition so the oracle contract
    * cannot drift per call site. DuckDB equivalent:
    * `('0x' || substr(md5(x), 1, 14))::UBIGINT`. Computed by the native
    * [[Hash56]] expression (digest bytes → long directly); value-identical
    * to the composed `conv(substring(md5(x), 1, 14), 16, 10)` form. */
  def hash56(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Hash56(Bridge.expression(c.cast("binary"))))
  }

  /** Fused distinct char-n-gram 56-bit shingle hashes — one digest per
    * text position straight off the byte buffer (see [[CharShingleHash56]]);
    * set-equal to `hashed_shingles(char_shingles(text, n))`. */
  def char_shingle_hash56(textCol: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CharShingleHash56(Bridge.expression(textCol), n))
  }

  /** Fused distinct word-n-gram 56-bit shingle hashes (tokens split on
    * single space, empties kept — `split(text, ' ')` semantics); set-equal
    * to `hashed_shingles(transform(word n-grams))`. See [[WordShingleHash56]]. */
  def word_shingle_hash56(textCol: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(WordShingleHash56(Bridge.expression(textCol), n))
  }

  /** Per-seed 56-bit XOR mask: first 14 hex digits of md5(seed). Computed
    * plan-side here; the oracle computes the same value inline via
    * `('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT`. */
  def seedMask(sd: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(sd.toString.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16)
  }

  /** MinHash signature over hashed shingles: element sd = min over
    * shingles of (hash XOR mask_sd) — each mask is a bijection of the
    * 56-bit space, so each seed ranks the shingle set differently, at one
    * integer op per (shingle, seed) instead of one md5. XOR (unlike a
    * small-multiplier mod-p affine map, which never wraps and is monotone
    * — every seed would elect the SAME min shingle) actually permutes the
    * order. Exact in signed 64-bit in any engine; inputs stay positive. */
  def minhash_signature_long(hashedCol: Column, seeds: Int): Column =
    array((0 until seeds).map(sd =>
      array_min(transform(hashedCol, b => b.bitwiseXOR(lit(seedMask(sd)))))): _*)

  /** Fused `band_keys(minhash_signature_long(hs, seeds) as strings, bands,
    * seeds/bands, "|")` — ONE primitive pass instead of `seeds`
    * interpreted array_min(transform(...)) scans (see [[MinHashBandKeys]];
    * the composed form's boxing dominated the near-dedup mining profile). */
  def minhash_band_keys(hashedCol: Column, seeds: Int, bands: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(MinHashBandKeys(Bridge.expression(hashedCol), seeds, bands))
  }

  /** Fused `minhash_signature_long(hs, seeds)` — the [[MinHashBandKeys]]
    * mins pass exposed as a signature array, for consumers that compare
    * whole signatures (estimated Jaccard = agreeing-seed fraction). */
  def minhash_signature_fused(hashedCol: Column, seeds: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(MinHashSignature(Bridge.expression(hashedCol), seeds))
  }

  /** Deterministic Rademacher hyperplanes for SimHash: sign(p, i) = +1 iff
    * the first hex digit of md5("<p>_<i>") < 8. */
  def simhashPlanes(bits: Int, dim: Int): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until bits).map { p =>
      (0 until dim).map { i =>
        md.reset()
        val h = md.digest(s"${p}_$i".getBytes(StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  /** SimHash sign bits ("1"/"0" strings) of a vector column against the
    * deterministic plane matrix — a native fused expression (see
    * [[SimHashBits]]; the plane matrix stays JVM-side instead of becoming
    * a 1500-literal codegen tree). */
  def simhash_bits(vecCol: Column, bits: Int, dim: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(SimHashBits(Bridge.expression(vecCol.cast("array<double>")), bits, dim))
  }

  /** Split a string array (sign bits or a minhash signature) into `bands`
    * concatenated keys of `r` elements each. `r` is the precision dial:
    * a candidate must agree on ALL `r` elements of some band, so bucket
    * sizes shrink geometrically in `r`. */
  def band_keys(bitsCol: Column, bands: Int, r: Int, sep: String = ""): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(sep, slice(bitsCol, b * r + 1, lit(r))))

  /** SimHash band keys of a vector column, each prefixed with its band
    * index ("<band>:<bits>") so keys from different bands never collide.
    * The probe/bucket primitive behind [[graft.operators.Ann]] and the
    * similarity-join rewrite rule. */
  def prefixed_band_keys(vecCol: Column, bits: Int, bands: Int, dim: Int): Column = {
    val r = bits / bands
    val bs = simhash_bits(vecCol, bits, dim)
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat(b.cast("string"), lit(":"),
        concat_ws("", slice(bs, b * r + 1, lit(r)))))
  }

  /** Exact Jaccard similarity of two string-array columns — a fused native
    * expression (see [[JaccardSimilarity]]); set semantics either way, so
    * callers may pass non-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(JaccardSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }
}
