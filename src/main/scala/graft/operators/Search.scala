package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Embedders
import graft.functions.VectorFunctions.cosine_sim

/** Lexical ranked retrieval — BM25, the scoring function behind every
  * full-text search engine and the standard lexical half of hybrid
  * (BM25 + embedding) retrieval in RAG pipelines. Complements the
  * engine's vector search ([[Similarity]], [[Ann]]) with the keyword
  * side.
  *
  * Scale shape: two passes over the corpus, both narrow —
  *  1. per-document term frequencies + length (fixed small query-term
  *     list ⇒ fixed columns, no explode, no vocabulary shuffle);
  *  2. corpus statistics (N, avgdl, per-term document frequencies)
  *     reduce to ONE row, broadcast back over the scoring scan.
  * The k-selection is `orderBy + limit` ⇒ `TakeOrderedAndProject` (per-
  * partition bounded heap). Nothing shuffles but the one-row stats.
  *
  * Determinism: avgdl and each idf are rounded to 9 dp before scoring,
  * scores to 6 dp with a doc_id tie-break, so both engines rank the
  * same values (ln differs by at most an ulp between libm
  * implementations; 9 dp keeps that far from any rounding boundary).
  */
object Search {

  /** Top-k documents by BM25 over lowercased whitespace tokens.
    * Standard Robertson/Sparck-Jones parameters k1, b; idf in the
    * always-positive `ln(1 + (N - df + 0.5)/(df + 0.5))` form (Lucene's
    * choice, so a term in most documents cannot score negative). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z0-9]+")),
      s"query terms must be lowercase alphanumeric words, got $terms")

    val toks = s"filter(split(lower($textCol), ' '), x -> x != '')"
    def tfCol(i: Int): String = s"tf$i"
    def dfCol(i: Int): String = s"df$i"

    // tokenization is the expensive projection and feeds BOTH branches
    // (stats + scoring) — pin its parallelism off the source's split
    // count (single small test file = one-core stage otherwise)
    val tf = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(
      col(idCol).as("doc_id") +:
        expr(s"size($toks)").cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          expr(s"size(filter($toks, x -> x = '$t'))").cast("double").as(tfCol(i))
        }: _*)

    val stats = tf.agg(
      count(lit(1)).cast("double").as("n"),
      round(avg(col("dl")), 9).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(tfCol(i)) > 0, 1L).otherwise(0L)).cast("double").as(dfCol(i))): _*)

    // idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)), rounded before use
    def idf(i: Int): Column =
      round(log(lit(1.0) + (col("n") - col(dfCol(i)) + lit(0.5)) / (col(dfCol(i)) + lit(0.5))), 9)

    // term contributions summed left-to-right in declared term order —
    // the oracle adds them in the same order, so the doubles agree
    val score = terms.indices.map { i =>
      idf(i) * (col(tfCol(i)) * lit(k1 + 1.0)) /
        (col(tfCol(i)) + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduceLeft(_ + _)

    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .where(col("score") > 0.0)
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Rank the ≤ k survivors of a (score, doc_id)-ordered top-k. The
    * window partition is pmod(doc_id, 1) — identically 0 but not
    * constant-foldable, so it is single-valued over the k rows by
    * construction (never an unpartitioned window over unbounded data;
    * same device as TextAnalysis.tokenTopK). */
  private def ranked(topk: DataFrame): DataFrame = {
    val w = Window.partitionBy(pmod(col("doc_id"), lit(1L)))
      .orderBy(desc("score"), asc("doc_id"))
    topk.withColumn("rnk", row_number().over(w)).select(col("doc_id"), col("rnk"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion (RRF) of the BM25 ranking
    * and an embedding-cosine ranking of the same corpus —
    * `score(d) = Σ_arms 1/(rrfK + rank_arm(d))` over the union of both
    * top-`kEach` lists, the standard score-free fusion rule (robust to
    * incomparable score scales, which is exactly the BM25-vs-cosine
    * situation).
    *
    * Scale shape: each arm ends in a bounded-heap top-kEach, so the
    * fusion joins two ≤ kEach-row sets (broadcast-sized by construction)
    * — the corpus is scanned, never shuffled. The embedding arm embeds
    * text inline here (partition-batched, the deliberate JVM fence); a
    * production pipeline reads the stored embedding column instead and
    * the fusion is unchanged. Ranks are integers, so fused scores are
    * bit-identical across engines by construction. */
  def hybridTopK(docs: DataFrame, terms: Seq[String], queryText: String, k: Int,
                 kEach: Int = 50, rrfK: Int = 60,
                 embedderId: String = "local/hash-64",
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val bm = ranked(bm25TopK(docs, terms, kEach, idCol = idCol, textCol = textCol))
      .withColumnRenamed("rnk", "bm25_rnk")

    val embedded = docs
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(512).flatMap { g =>
          val embs = Embedders.embedBatch(embedderId, g.iterator.map(_._2.getBytes("UTF-8")))
          g.iterator.zip(embs).map { case ((id, _), e) => (id, e) }
        }
      }
      .toDF("doc_id", "emb")
    val qv = Embedders.get(embedderId)(queryText.getBytes("UTF-8"))
    val cos = ranked(
      embedded
        .select(col("doc_id"), round(cosine_sim(col("emb"), typedLit(qv)), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(kEach))
      .withColumnRenamed("rnk", "cos_rnk")

    bm.join(cos, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        col("bm25_rnk").cast("bigint").as("bm25_rnk"),
        col("cos_rnk").cast("bigint").as("cos_rnk"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rnk")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("cos_rnk")), lit(0.0)), 9).as("rrf"))
      .orderBy(desc("rrf"), asc("doc_id"))
      .limit(k)
  }

  /** Document-level retrieval over a CHUNK index (late-interaction lite):
    * chunk every document, embed the chunks, score them against the query
    * vector, and rank documents by their best-scoring chunk — the
    * max-pooled chunk-retrieval shape RAG systems use so a long document
    * is findable by any one passage. Returns the winning chunk id with
    * each document, which is exactly the passage a downstream reader
    * wants.
    *
    * Scale shape: chunk + embed + score are one narrow pipeline (the
    * partition-batched embedder, then the codegen'd cosine against the
    * literal query vector); the per-document max is a doc-keyed
    * `row_number` window — partial WindowGroupLimit bounds the shuffle at
    * one row per document per partition — and the final k-selection is a
    * bounded heap (`TakeOrderedAndProject`). With a persisted chunk
    * collection (the [[graft.operators.Ingest.ingestTopk]] layout) the
    * chunk/embed stages are amortized across queries. */
  def chunkDocRetrieval(spark: org.apache.spark.sql.SparkSession, dir: String,
                        queryText: String, k: Int = 10,
                        chunkSize: Int = 128): DataFrame = {
    val chunks = Ingest.chunk(graft.core.Tables.documents(spark, dir), "doc_id", "text", chunkSize)
    val recs = Ingest.makeRecords(spark, chunks, "local/hash-64")
    val qv = Embedders.embedBatch("local/hash-64",
      Iterator(queryText.getBytes("UTF-8"))).next()
    val scored = recs.select(
      expr("cast(split(id, '-')[0] as bigint)").as("doc_id"), col("id"),
      round(cosine_sim(col("embedding"), typedLit(qv)), 6).as("score"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), asc("id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("id").as("best_chunk"), col("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
