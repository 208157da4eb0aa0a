package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.util.ArrayData

/** Input guards shared by the native vector expressions. Blind
  * `ArrayData.getDouble(i)` past the array's element count is an unsafe
  * out-of-bounds read (silent garbage on UnsafeArrayData in production),
  * and NULL elements read as 0.0 — both must fail loudly instead. */
private[functions] object ExpressionGuards {

  def requireVector(fn: String, v: ArrayData, dim: Int): Unit = {
    if (v.numElements() != dim)
      throw new SparkException(
        s"$fn: vector length ${v.numElements()} does not match expected dimension $dim")
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i))
        throw new SparkException(s"$fn: vector must not contain NULL elements")
      i += 1
    }
  }
}
