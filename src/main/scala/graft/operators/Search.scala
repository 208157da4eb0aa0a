package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

    val tf = docs.select(
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
}
