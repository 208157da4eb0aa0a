package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Column-level vector math over `ARRAY<DOUBLE>` columns.
  *
  * `cosine_sim` is the engine's only *necessary* custom scalar (reference
  * `/root/reference/utils/utils.go:9-24`); the rest are composition helpers
  * built from codegen'd higher-order functions.
  */
object VectorFunctions {

  private def asDoubleArrayExpr(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Cosine similarity as a native expression — see [[CosineSimilarity]]. */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      asDoubleArrayExpr(Bridge.expression(a)),
      asDoubleArrayExpr(Bridge.expression(b))))

  /** Cast an ARRAY<FLOAT> (testdata storage type) to ARRAY<DOUBLE> for math. */
  def as_double_array(c: Column): Column = c.cast("array<double>")

  /** Elementwise dot product via built-in higher-order functions (no UDF). */
  def dot_product(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2_norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Euclidean distance. */
  def l2_dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))

  /** Per-vector max-abs — the symmetric int8 quantization range. */
  def max_abs(a: Column): Column = array_max(transform(a, x => abs(x)))

  /** Symmetric int8 quantization: q_i = round(v_i · 127 / max|v|), values
    * in [-127, 127] (kept as DOUBLE so the arithmetic — and the DuckDB
    * oracle's — stays in one numeric tower). The all-zero vector maps to
    * all zeros. 4× storage cut per embedding; the error introduced is
    * bounded by scale/2 per component (see [[dequantize_int8]]). */
  def quantize_int8(v: Column): Column = {
    val mx = max_abs(v)
    when(mx === lit(0.0), transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x => round(x * lit(127.0) / mx, 0)))
  }

  /** Reverse of [[quantize_int8]] given the stored max|v|:
    * v̂_i = q_i · max|v| / 127. */
  def dequantize_int8(q: Column, mx: Column): Column =
    transform(q, x => x * mx / lit(127.0))

  /** Register SQL surface: `SELECT cosine_sim(a, b) FROM ...` plus the
    * ingest-side `graft_embed(embedder_name, blob)`. The embed function is a
    * Scala UDF by necessity — embedding IS a JVM-function boundary (registry
    * dispatch), same fence as the mapPartitions batch path; keep it out of
    * scan/score hot paths. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("graft_embed",
      (name: String, blob: Array[Byte]) => graft.core.Embedders.get(name)(blob))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => {
        if (exprs.length != 2) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "cosine_sim",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "-"))
        }
        CosineSimilarity(asDoubleArrayExpr(exprs.head), asDoubleArrayExpr(exprs(1)))
      },
      "built-in")
  }
}
