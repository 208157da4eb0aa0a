package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.as_double_array

/** Loaders for the driver-generated parquet tables (`/root/repo/TESTDATA.md`).
  * All math-facing loads normalize the embedding column to ARRAY<DOUBLE>.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT` */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), as_double_array(col("embedding")).as("embedding"), col("label"))

  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")

  /** Normalize a driver-table timestamp column to TIMESTAMP (LTZ), which is
    * what every downstream operator (`unix_micros`, windows, watermarks)
    * expects. The driver has generated two physical encodings across rounds:
    *   - parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it;
    *     sessions set `spark.sql.legacy.parquet.nanosAsLong`, it reads as a
    *     LONG of nanos, converted here via integer div (nanos exceed double
    *     precision);
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark 4 infers
    *     TIMESTAMP_NTZ; cast to LTZ here. Sessions pin
    *     `spark.sql.session.timeZone=UTC`, so the cast reinterprets the
    *     wall-clock as the same UTC instant the DuckDB oracle reads.
    * Already-LTZ columns pass through untouched. */
  private def nanosToTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
        case _ => d
      }
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    nanosToTs(table(spark, dir, "events"), "ts")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    nanosToTs(table(spark, dir, "lineitem"), "l_shipdate")
  def orders(spark: SparkSession, dir: String): DataFrame =
    nanosToTs(table(spark, dir, "orders"), "o_orderdate")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
}
