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
    * deterministic plane matrix (folded in as a literal). */
  def simhash_bits(vecCol: Column, bits: Int, dim: Int): Column =
    transform(typedLit(simhashPlanes(bits, dim)), p =>
      when(aggregate(zip_with(vecCol, p, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) >= 0, lit("1")).otherwise(lit("0")))

  /** Split a string array (sign bits or a minhash signature) into `bands`
    * concatenated keys of `r` elements each. `r` is the precision dial:
    * a candidate must agree on ALL `r` elements of some band, so bucket
    * sizes shrink geometrically in `r`. */
  def band_keys(bitsCol: Column, bands: Int, r: Int, sep: String = ""): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(sep, slice(bitsCol, b * r + 1, lit(r))))

  /** Exact Jaccard similarity of two string-array columns — a fused native
    * expression (see [[JaccardSimilarity]]); set semantics either way, so
    * callers may pass non-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(JaccardSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }
}
