package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Argmax-cosine centroid assignment as a native expression: the centroid
  * matrix rides along as a codegen REFERENCE OBJECT (`addReferenceObj`),
  * not as an expression-tree literal — a k×d `typedLit` matrix is k·d
  * literal nodes for Janino to compile, and the `transform(...)` HOF
  * around it evaluates interpreted per row (the same two costs the
  * [[SimHashBits]] scaladoc documents; measured ~5 s per 1M rows for
  * 16×64 centroids, ~4× the fused loop).
  *
  * Semantics are exactly `array_position(scores, array_max(scores))` over
  * unrounded [[CosineSimilarity]] scores: 1-based cell id, FIRST index on
  * ties, zero-norm vectors score 0.0, and (matching `array_max`'s NaN-is-
  * greatest ordering) the first NaN-scoring centroid wins if any score is
  * NaN. Norms accumulate in the same sequential order as
  * `CosineSimilarity.compute` — centroid norms once at construction, the
  * row norm once per row — so every score is bit-identical to the HOF
  * formulation and to the oracle's `list_position(sc, list_max(sc))`
  * while doing a third of the arithmetic. Mismatched-length or
  * NULL-holed vectors raise (as `CosineSimilarity` did) instead of
  * silently scoring a prefix.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private lazy val matrix: Array[Array[Double]] = cents.map(_.toArray).toArray
  private lazy val norms: Array[Double] = NearestCentroid.centroidNorms(matrix)

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], matrix, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refM = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val refN = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NearestCentroid.compute($x, $refM, $refN);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** sqrt of each centroid's squared norm, accumulated sequentially —
    * the same ny the fused cosine loop would produce. */
  def centroidNorms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { row =>
      var ny = 0.0; var i = 0
      while (i < row.length) { ny += row(i) * row(i); i += 1 }
      math.sqrt(ny)
    }

  /** 1-based argmax of cosine(v, cents(i)); first index wins ties; first
    * NaN wins if present (array_max NaN ordering). */
  def compute(v: ArrayData, cents: Array[Array[Double]], norms: Array[Double]): Long = {
    val dim = if (cents.length > 0) cents(0).length else 0
    ExpressionGuards.requireVector("nearest_centroid", v, dim)
    var nx = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); nx += x * x; i += 1 }
    val xNorm = math.sqrt(nx)

    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val row = cents(c)
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += v.getDouble(j) * row(j); j += 1 }
      val s = if (nx == 0.0 || norms(c) == 0.0) 0.0 else dot / (xNorm * norms(c))
      if (s.isNaN) return (c + 1).toLong // array_max orders NaN greatest; first NaN wins
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    (best + 1).toLong
  }
}
