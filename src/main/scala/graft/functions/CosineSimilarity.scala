package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two `ARRAY<DOUBLE>` vectors as a native Catalyst
  * expression (whole-stage-codegen friendly — no UDF serialization fence).
  *
  * Semantics pinned to the reference implementation
  * (`/root/reference/utils/utils.go:9-24`):
  *   - fused single-pass dot + norms (one loop, no allocation);
  *   - length mismatch → error (utils.go:11-13);
  *   - either vector zero-norm → 0.0, never NaN (utils.go:19-21);
  *   - NULL input → NULL (SQL-standard; the reference cannot see nulls).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be ARRAY<DOUBLE>; the Column/SQL helpers in
  // VectorFunctions insert the Cast, so no ExpectsInputTypes machinery
  // (private[sql] in Spark 4) is needed here.
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Fused single-pass loop over the two arrays; called from both interpreted
    * eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new SparkException(
        s"cosine_sim: vectors must be of equal length (got $n vs ${y.numElements()})")
    }
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) {
        throw new SparkException(
          s"cosine_sim: vectors must not contain NULL elements (at index $i)")
      }
      val a = x.getDouble(i)
      val b = y.getDouble(i)
      dot += a * b
      nx += a * a
      ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}
