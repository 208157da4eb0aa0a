package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused banded MinHash signature keys over a hashed-shingle array —
  * value-identical to the composed form
  * `band_keys(transform(minhash_signature_long(hs, seeds), cast string),
  * bands, seeds/bands, "|")` but computed in ONE primitive pass.
  *
  * The composed tree is `seeds` separate `array_min(transform(hs, XOR))`
  * evaluations — higher-order functions Catalyst cannot codegen, each
  * allocating a boxed copy of the whole shingle array per row. On the
  * near-dedup mining path (thousands of shingles per document, the
  * signature subtree evaluated on both join sides) that interpreted
  * boxing dominated the profile: the round-10 stage audit measured the
  * inline incremental near-dedup at 300+ executor-seconds at sf0.1 with
  * ~10% of it GC, collapsing to single-digit seconds with this fusion.
  * Here each shingle hash is XOR'd against all `seeds` masks in a tight
  * primitive loop (no allocation beyond the seeds-length mins array), and
  * band keys are built straight from the mins.
  *
  * Cross-engine contract unchanged: masks are [[LshFunctions.seedMask]]
  * (md5 of the seed index), mins are signed-64-bit comparisons on values
  * in [0, 2^56), keys are decimal strings joined by '|' — exactly what the
  * DuckDB oracles compute inline. An empty shingle array yields an empty
  * key array (callers gate empties out with a precondition; the composed
  * form produced a degenerate all-null-min key there, which no caller
  * relied on).
  */
case class MinHashBandKeys(child: Expression, seeds: Int, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if seeds >= 1 && bands >= 1 && seeds % bands == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires seeds >= 1 divisible by bands >= 1, got seeds=$seeds bands=$bands")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def nullSafeEval(hs: Any): Any =
    MinHashBandKeys.compute(hs.asInstanceOf[ArrayData], seeds, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.MinHashBandKeys.compute($x, $seeds, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** Fused MinHash signature (array of the `seeds` masked minima) — the
  * [[MinHashBandKeys]] mins pass WITHOUT the banding, for consumers that
  * compare whole signatures (the approximate verify path: estimated
  * Jaccard = fraction of agreeing seeds). Value-identical to
  * `minhash_signature_long(hs, seeds)`; empty input yields an empty array
  * (callers precondition empties out). */
case class MinHashSignature(child: Expression, seeds: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if seeds >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires seeds >= 1, got $seeds")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def nullSafeEval(hs: Any): Any = {
    val mins = MinHashBandKeys.seedMins(hs.asInstanceOf[ArrayData], seeds)
    if (mins == null) MinHashBandKeys.EmptyArray
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""long[] ${ev.value}_m = graft.functions.MinHashBandKeys.seedMins($x, $seeds);
         |${ev.value} = ${ev.value}_m == null ? graft.functions.MinHashBandKeys.EmptyArray()
         |  : new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_m);
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashBandKeys {
  // masks are a pure function of the seed index; memoize per seed count
  private val maskCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def masks(seeds: Int): Array[Long] =
    maskCache.computeIfAbsent(seeds, s => Array.tabulate(s)(LshFunctions.seedMask))

  /** The shared mins pass: all `seeds` masked minima in one scan, or null
    * for an empty input array. */
  def seedMins(hs: ArrayData, seeds: Int): Array[Long] = {
    val n = hs.numElements()
    if (n == 0) return null
    val mk = masks(seeds)
    val mins = new Array[Long](seeds)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var s = 0
      while (s < seeds) {
        val v = h ^ mk(s)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    mins
  }

  /** Shared empty result (codegen calls this as `EmptyArray()`). */
  def EmptyArray(): GenericArrayData = Empty

  def compute(hs: ArrayData, seeds: Int, bands: Int): GenericArrayData = {
    val mins = seedMins(hs, seeds)
    if (mins == null) return Empty
    val r = seeds / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(r * 18)
      var j = 0
      while (j < r) {
        if (j > 0) sb.append('|')
        sb.append(mins(b * r + j))
        j += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  private val Empty = new GenericArrayData(Array.empty[Any])
}
