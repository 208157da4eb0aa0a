package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Product-quantization reconstruction as one fused native expression:
  * split the vector into M contiguous subspaces, snap each subvector to
  * its nearest codebook centroid (L2, first index on ties), and emit the
  * concatenated centroids — the vector a PQ-compressed store would hand
  * back for that row. Asymmetric-distance (ADC) scoring is then just the
  * ordinary similarity of a RAW query against this reconstruction, so
  * every downstream scorer (cosine, dot) reuses the existing expressions
  * unchanged.
  *
  * The codebook rides as a codegen reference object (`addReferenceObj`) —
  * an M×K×dsub literal tree would be ~1024 nodes of Janino input (the
  * [[NearestCentroid]]/[[SimHashBits]] lesson). Distances accumulate
  * sequentially per subvector, matching the oracle's
  * `list_sum(list_transform(...))` exactly, and argmin uses strict `<`,
  * matching `list_position(sc, list_min(sc))` first-occurrence
  * semantics.
  */
case class PqReconstruct(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_reconstruct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
      if codebook.nonEmpty && codebook.forall(_.nonEmpty) &&
        codebook.flatten.map(_.length).distinct.size == 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-empty rectangular codebook")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqReconstruct.compute(v.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PqReconstruct.compute($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
}

/** 0-based PQ code per subspace as a column — the STORED form of a
  * PQ-compressed vector store (M small ints instead of M·dsub doubles).
  * Same argmin as [[PqReconstruct]], so
  * `PqDecode(PqCodes(v)) == PqReconstruct(v)` by construction. */
case class PqCodes(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if codebook.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(PqReconstruct.codes(v.asInstanceOf[ArrayData], cb).map(_.toLong))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PqReconstruct.codesArrayData($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Decode stored PQ codes back to the concatenated centroids — the read
  * side of the compressed store: an ADC scan reads ONLY the M codes per
  * row (8× less IO than raw 64-dim doubles here) and reconstructs from
  * the per-executor codebook constant. */
case class PqDecode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) if codebook.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> codes, got ${t.simpleString}")
  }

  private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(c: Any): Any =
    PqReconstruct.decode(c.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PqReconstruct.decode($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}

object PqReconstruct {

  /** Concatenated nearest centroids; also the shared argmin used by
    * [[codes]]. */
  def compute(v: ArrayData, cb: Array[Array[Array[Double]]]): GenericArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    ExpressionGuards.requireVector("pq_reconstruct", v, m * dsub)
    val out = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val row = cb(s)(nearest(v, cb(s), base, dsub))
      var i = 0
      while (i < dsub) { out(base + i) = row(i); i += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** 0-based code per subspace — the stored form (M bytes per vector when
    * K ≤ 256). */
  def codes(v: ArrayData, cb: Array[Array[Array[Double]]]): Array[Int] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    ExpressionGuards.requireVector("pq_codes", v, m * dsub)
    Array.tabulate(m)(s => nearest(v, cb(s), s * dsub, dsub))
  }

  /** [[codes]] boxed for codegen call sites. */
  def codesArrayData(v: ArrayData, cb: Array[Array[Array[Double]]]): GenericArrayData =
    new GenericArrayData(codes(v, cb).map(_.toLong))

  /** Concatenated centroids for stored codes; out-of-range codes raise
    * (a corrupt store must fail loudly, not read a wild centroid). */
  def decode(c: ArrayData, cb: Array[Array[Array[Double]]]): GenericArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    if (c.numElements() != m)
      throw new org.apache.spark.SparkException(
        s"pq_decode: expected $m codes, got ${c.numElements()}")
    val out = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      val code = c.getLong(s)
      if (code < 0 || code >= cb(s).length)
        throw new org.apache.spark.SparkException(
          s"pq_decode: code $code out of range [0, ${cb(s).length}) in subspace $s")
      val row = cb(s)(code.toInt)
      var i = 0
      while (i < dsub) { out(s * dsub + i) = row(i); i += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  private def nearest(v: ArrayData, cents: Array[Array[Double]],
                      base: Int, dsub: Int): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < cents.length) {
      val row = cents(j)
      var d = 0.0
      var i = 0
      while (i < dsub) {
        val diff = v.getDouble(base + i) - row(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }
}
