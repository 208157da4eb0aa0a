package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The cross-engine 56-bit fingerprint (first 7 bytes of md5, big-endian)
  * as a native Catalyst expression.
  *
  * Value-identical to the composed form
  * `conv(substring(md5(x), 1, 14), 16, 10)::long` — the first 14 hex
  * digits of an md5 are exactly its first 7 bytes — but computed without
  * materializing the 32-char hex string or re-parsing it base-16 per row.
  * DuckDB reproduces it as `('0x' || substr(md5(x), 1, 14))::UBIGINT`, so
  * every oracle contract built on the composed form holds unchanged.
  */
case class Hash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash56"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    Hash56.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Hash56.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Hash56 =
    copy(child = newChild)
}

object Hash56 {
  // MessageDigest is stateful; one instance per executor thread.
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 7 md5 bytes, big-endian — always in [0, 2^56). */
  def compute(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  private def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val h = md.digest()
    ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) |
      ((h(3) & 0xffL) << 24) | ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) |
      (h(6) & 0xffL)
  }

  /** Distinct 56-bit hashes of all character n-gram shingles, fused into
    * one pass: code-point boundaries are computed once over the UTF-8
    * bytes and each shingle is digested straight from its byte range — no
    * per-shingle substring, hex string, or string-distinct pass. Output
    * ORDER is unspecified (first occurrence); every consumer (minhash,
    * jaccard, banding) is set-semantic. */
  def charShingles(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars < n) return EmptyLongs
    // offs(c) = byte offset where code point c starts; offs(numChars) = end
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(numChars) = bytes.length
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (numChars - n + 1) * 2))
    val out = new Array[Long](numChars - n + 1)
    var k = 0
    var p = 0
    while (p <= numChars - n) {
      val h = hashRange(bytes, offs(p), offs(p + n) - offs(p))
      if (seen.add(h)) { out(k) = h; k += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Distinct 56-bit hashes of all word n-gram shingles (tokens = split on
    * single space, exactly like `split(text, ' ')` — empty tokens from
    * consecutive spaces included; shingle = n consecutive tokens joined by
    * one space). Because the separator is a single space, each shingle is
    * a contiguous byte range of the original text, digested in place. */
  def wordShingles(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    val m = spaces + 1 // token count under split-keeping-empties
    if (m < n) return EmptyLongs
    // starts(t) = byte offset where token t starts; token t ends at
    // starts(t+1)-1 (the separating space) or end-of-bytes for the last
    val starts = new Array[Int](m + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(m) = bytes.length + 1 // virtual space after the last token
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (m - n + 1) * 2))
    val out = new Array[Long](m - n + 1)
    var k = 0
    var p = 0
    while (p <= m - n) {
      val from = starts(p)
      val until = starts(p + n) - 1 // drop the trailing separator
      val h = hashRange(bytes, from, until - from)
      if (seen.add(h)) { out(k) = h; k += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  private val EmptyLongs = new GenericArrayData(Array.empty[Long])
}

/** Fused `array_distinct(transform(char-shingles, hash56))` — the
  * dedup-mining hot path digests each n-gram straight from the text's
  * byte buffer. Value-equal (as a SET) to the composed form; see
  * [[Hash56.charShingles]]. */
case class CharShingleHash56(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingle_hash56"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    Hash56.charShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Hash56.charShingles($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHash56 =
    copy(child = newChild)
}

/** Fused word-n-gram variant of [[CharShingleHash56]] — see
  * [[Hash56.wordShingles]]. */
case class WordShingleHash56(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hash56"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    Hash56.wordShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Hash56.wordShingles($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHash56 =
    copy(child = newChild)
}
