package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point — the idiomatic way to ship the
  * engine's SQL surface as a library:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * Injects `cosine_sim` as a registry-level function (available in every
  * session derived from the config, not just one SparkSession like
  * `VectorFunctions.registerAll`). The expression is a native codegen'd
  * Catalyst `BinaryExpression`, so SQL users get the same whole-stage
  * codegen path as the Scala DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.jaccardSimDescriptor)
    ext.injectFunction(GraftExtensions.hash56Descriptor)
    // Opt-in (spark.graft.similarityJoin.rewrite=true): brute-force
    // cosine-threshold cross joins → LSH-banded candidate equi-joins.
    ext.injectOptimizerRule(_ => graft.plans.RewriteSimilarityJoin())
  }
}

object GraftExtensions {

  private def asDoubleArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  /** (name, info, builder) tuple in the shape injectFunction expects. */
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "cosine_sim",
            "expectedNum" -> "2",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "-"))
      }
      CosineSimilarity(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))
    })

  /** `jaccard_sim(a, b)` over two ARRAY<STRING> / ARRAY<BIGINT> columns —
    * the fused set-similarity scalar behind the dedup verifiers, exposed
    * to SQL; element-type validation happens in the expression's
    * checkInputDataTypes. */
  val jaccardSimDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("jaccard_sim"),
    new ExpressionInfo(classOf[graft.functions.JaccardSimilarity].getName, "jaccard_sim"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "jaccard_sim",
            "expectedNum" -> "2",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "-"))
      }
      graft.functions.JaccardSimilarity(exprs.head, exprs(1))
    })

  /** `hash56(x)` — THE cross-engine 56-bit fingerprint (first 7 md5
    * bytes as a BIGINT), exposed to SQL so stored fingerprints, sampling
    * buckets, and shingle hashes written via SQL agree with every
    * operator and with the DuckDB form
    * `('0x' || substr(md5(x), 1, 14))::UBIGINT`.
    *
    * The argument goes through a STRING cast before the BINARY one:
    * `hash56(42)` must digest the characters "42" — as
    * `Sampling.hashBucket` (`.cast("string")`) and every DuckDB oracle
    * (`md5(CAST(id AS VARCHAR))`) do — not the numeric's 8-byte binary
    * encoding, which a direct numeric→BINARY cast would silently hash to
    * a different fingerprint. String→string is a no-op and
    * binary→string→binary round-trips the same bytes, so string/binary
    * arguments are unaffected. */
  val hash56Descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("hash56"),
    new ExpressionInfo(classOf[graft.functions.Hash56].getName, "hash56"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 1) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "hash56",
            "expectedNum" -> "1",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "-"))
      }
      graft.functions.Hash56(org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.BinaryType))
    })
}
