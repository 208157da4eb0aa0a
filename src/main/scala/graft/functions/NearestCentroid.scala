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
  * ties, zero-norm vectors score 0.0. Same accumulation order as
  * `CosineSimilarity.compute`, so the chosen cell is bit-identical to the
  * HOF formulation and to the oracle's `list_position(sc, list_max(sc))`.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private lazy val matrix: Array[Array[Double]] = cents.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NearestCentroid.compute($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** 1-based argmax of cosine(v, cents(i)); first index wins ties. */
  def compute(v: ArrayData, cents: Array[Array[Double]]): Long = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val row = cents(c)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < row.length) {
        val x = v.getDouble(i); val y = row(i)
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      val s = if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    (best + 1).toLong
  }
}
