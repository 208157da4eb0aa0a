package graft.core

import org.apache.spark.sql.types._

/** One embedded chunk — mirrors the reference record
  * (`/root/reference/records/records.go:11-16`): (id, blob, embedding,
  * embedderId). The reference holds these in an in-memory hash map; here a
  * record is one row of a Parquet-backed collection DataFrame (columnar at
  * rest, vectorized scan — the 100 TB-scale difference).
  */
final case class Record(
    id: String,
    embedderId: String,
    blob: Array[Byte],
    embedding: Array[Double])

object Record {
  /** Canonical collection schema (SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("embedderId", StringType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = true)
  ))
}

/** Engine-level error with the reference's error semantics (duplicate add,
  * missing get/delete, embedder mismatch, ...). */
final class GraftException(msg: String) extends RuntimeException(msg)
