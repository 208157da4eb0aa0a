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
