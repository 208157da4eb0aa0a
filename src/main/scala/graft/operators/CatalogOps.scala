package graft.operators

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftDatabase, Tables}

/** Driver-contract glue: run reference-shaped operations through the full
  * catalog surface (`GraftDatabase`, O2/O5–O17) so the CRUD path itself gets
  * an oracle-checked CORRECTNESS row, not just unit tests.
  */
object CatalogOps {

  val CollectionId = "embeddings"
  val EmbedderId = "local/hash-64"

  /** Deterministic scratch location per source dir (so sf0.01 and sf0.1 runs
    * don't collide and repeat runs are idempotent). */
  private def scratchBase(dir: String): String = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft-db-$h"
  }

  /** The catalog instance that owns the secondary indexes derived from
    * `dir`'s tables (same scratch root as [[database]], so one catalog sees
    * both the ingested collection and its indexes). Cheap: `make` only
    * restores the two tiny manifests — it does NOT trigger the collection
    * ingest [[database]] performs. */
  def indexRegistry(spark: SparkSession, dir: String): GraftDatabase =
    GraftDatabase.make(spark, scratchBase(dir))

  /** Build (or reuse) a catalog-backed copy of `embeddings.parquet` ingested
    * through the bulk AddRecord path. Idempotent: a completed previous ingest
    * (marked by Spark's _SUCCESS) is reused; a partial one is rebuilt. */
  def database(spark: SparkSession, dir: String): GraftDatabase = {
    val db = GraftDatabase.make(spark, scratchBase(dir))
    if (!db.isCollectionInDB(CollectionId)) // may be restored from the manifest
      db.addCollection(db.makeCollection(CollectionId, EmbedderId))
    val path = db.getCollection(CollectionId).path
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      deleteRecursively(Paths.get(path))
      val recs = Tables.embeddings(spark, dir).select(
        col("vec_id").cast("string").as("id"),
        lit(EmbedderId).as("embedderId"),
        col("vec_id").cast("string").cast("binary").as("blob"),
        col("embedding"))
      db.addRecords(CollectionId, recs)
    }
    db
  }

  /** O1/O2 through the catalog: top-k over the ingested collection using the
    * stored vector of `queryVecId` as the query. Output (id, score) with the
    * canonical `score DESC, id ASC` tie-break (string id — the catalog's key
    * type, matching the reference's string record ids). */
  def topkViaCatalog(spark: SparkSession, dir: String,
                     queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val db = database(spark, dir)
    db.queryByVector(CollectionId, Similarity.queryVector(spark, dir, queryVecId), k)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
}
