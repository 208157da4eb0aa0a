package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions._

/** Exact similarity search — the reference's flagship operator family
  * (`/root/reference/collection/collection.go:64-151`) re-expressed as Spark
  * bulk operations.
  *
  * Scale notes (100 TB design):
  *  - single-query top-k plans as `TakeOrderedAndProject` over a parquet scan:
  *    per-partition bounded heap + driver merge of k·P rows — no shuffle of
  *    data, embarrassingly parallel across executors;
  *  - the query vector travels as a literal inside the codegen'd expression
  *    (constant-folded), not as a joined row;
  *  - batch similarity join broadcasts the (small) query side and computes a
  *    per-query top-k window partitioned by query id — the shuffle is over
  *    k·Q candidate rows, not the full cross product, when combined with the
  *    per-partition `row_number` pre-filter Catalyst applies after AQE.
  *
  * Determinism: reference tie behavior is nondeterministic
  * (`collection/collection.go:105-146`); we pin `score DESC, id ASC` and rank
  * by the 6-dp-rounded score so Spark and the DuckDB oracle agree bit-for-bit
  * (SURVEY.md §2.2, §7.5).
  */
object Similarity {

  /** Rounded score used for both ranking and output — ranking on the rounded
    * value makes cross-engine ordering stable (sub-1e-6 float drift collapses
    * into the deterministic `id` tie-break). */
  private def score(embedding: Column, queryVec: Column): Column =
    round(cosine_sim(embedding, queryVec), 6)

  /** Fetch one stored embedding to use as the query vector (driver-side point
    * lookup of a single 64-dim row — the "query text → query vector" step;
    * reference embeds the query with the collection's embedder,
    * `collection/collection.go:66-73`). Memoized per (dir, vecId): several
    * operators probe with the same vector, and the source parquet is
    * immutable — one point-scan job instead of one per query. */
  private val queryVectorCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Array[Double]]

  def queryVector(spark: SparkSession, dir: String, vecId: Long): Array[Double] =
    queryVectorCache.getOrElseUpdate((dir, vecId),
      Tables.embeddings(spark, dir)
        .where(col("vec_id") === vecId)
        .select("embedding")
        .collect()
        .headOption
        .getOrElse(throw new graft.core.GraftException(
          s"query vector $vecId not found in $dir/embeddings.parquet"))
        .getSeq[Double](0)
        .toArray)

  /** O1/X1 — exact top-k cosine search against a single query vector. */
  def topKSingle(spark: SparkSession, dir: String, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val q = typedLit(queryVector(spark, dir, queryVecId))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), score(col("embedding"), q).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** X4 — metadata-filtered top-k: arbitrary column predicates applied before
    * scoring; Catalyst pushes them into the parquet scan (the reference lists
    * metadata filtering as a roadmap gap, README.md:146). */
  def topKFiltered(spark: SparkSession, dir: String, queryVecId: Long = 0L,
                   k: Int = 10, labelFilter: Int = 3): DataFrame = {
    val q = typedLit(queryVector(spark, dir, queryVecId))
    Tables.embeddings(spark, dir)
      .where(col("label") === labelFilter)
      .select(col("vec_id"), col("label"), score(col("embedding"), q).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** O7 — point lookup by record id (predicate-pushdown point scan;
    * reference `collection/collection.go:56-62`). */
  def pointLookup(spark: SparkSession, dir: String, vecId: Long = 42L): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") === vecId)
      .select(col("vec_id"), col("label"), round(l2_norm(col("embedding")), 6).as("norm"))

  /** X2 — batch similarity join: Q query vectors × N records, per-query exact
    * top-k. The query side (small) is broadcast — explicitly, because the
    * correctness of this plan depends on Q ≪ N (the broadcast side must fit
    * in executor memory; with the 64-dim doubles here that's ~1 KB/query, so
    * even 10^6 queries broadcast in ~1 GB). Scoring happens map-side with no
    * shuffle of the big side, and Spark 4 inserts a partial WindowGroupLimit
    * BEFORE the exchange, so the shuffle carries ≤ k rows per partition per
    * query, not the cross product. At 100 TB the remaining exposure is
    * O(N·Q·d) compute; [[graft.operators.Ann.annTopk]] is the LSH-bucketed
    * pre-filter for that regime. */
  def batchSimilarityJoin(spark: SparkSession, dir: String,
                          numQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    similarityJoin(e, queries, k)
  }

  /** The generic core of X2: per-query exact top-k of `queries`
    * (`query_id`, `query_vec`) against `corpus` (`vec_id`, `label`,
    * `embedding`). Also the per-micro-batch body of the stream-static
    * enrichment ([[graft.streaming.Streaming.streamSimilarity]]) — one
    * code path owns the scoring semantics. */
  def similarityJoin(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), col("label"),
              score(col("embedding"), col("query_vec")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), asc("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint")) // bigint: matches DuckDB row_number
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("label"), col("score"))
      .orderBy(asc("query_id"), asc("rnk"))
  }
}
