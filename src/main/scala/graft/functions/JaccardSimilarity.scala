package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two `ARRAY<STRING>` (or `ARRAY<BIGINT>` — hashed
  * shingles) columns as a native Catalyst expression: |A ∩ B| / |A ∪ B| in
  * one fused pass (one hash set per side, intersection counted during the
  * second insert) — replaces the `size(array_intersect)/size(array_union)`
  * composition, which materializes two intermediate arrays per row on the
  * dedup-verification hot path.
  *
  * Semantics: set semantics (duplicates collapse), NULL input → NULL, two
  * empty arrays → 0.0. Exact rational result — identical to the composed
  * form and to the DuckDB oracle's `len(list_intersect)/len(list_distinct(
  * list_concat))`.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sim"

  private lazy val longElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        // mismatched or unsupported element types would silently reinterpret
        // raw ArrayData bytes — fail analysis instead
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two ARRAY<STRING> or two ARRAY<BIGINT> " +
            s"arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (longElems)
      JaccardSimilarity.computeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      JaccardSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (longElems) "computeLong" else "compute"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaccardSimilarity.$method($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  /** One fused pass; null elements are ignored (treated as absent). */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val xs = new java.util.HashSet[UTF8String](math.max(8, x.numElements() * 2))
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) xs.add(x.getUTF8String(i))
      i += 1
    }
    val ys = new java.util.HashSet[UTF8String](math.max(8, y.numElements() * 2))
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      if (!y.isNullAt(j)) {
        val s = y.getUTF8String(j)
        if (ys.add(s) && xs.contains(s)) inter += 1
      }
      j += 1
    }
    val union = xs.size + ys.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Same fused pass over BIGINT elements (hashed shingle sets). */
  def computeLong(x: ArrayData, y: ArrayData): Double = {
    val xs = new java.util.HashSet[java.lang.Long](math.max(8, x.numElements() * 2))
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) xs.add(x.getLong(i))
      i += 1
    }
    val ys = new java.util.HashSet[java.lang.Long](math.max(8, y.numElements() * 2))
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      if (!y.isNullAt(j)) {
        val s: java.lang.Long = y.getLong(j)
        if (ys.add(s) && xs.contains(s)) inter += 1
      }
      j += 1
    }
    val union = xs.size + ys.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
