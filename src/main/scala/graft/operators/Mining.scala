package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim

/** Training-pair mining over a labeled embedding corpus — the step that
  * turns a curated corpus into contrastive-training inputs (anchor,
  * positive, hard negative). The reference stops at retrieval
  * (`/root/reference/collection/collection.go:64-151`); this is the
  * downstream consumer a 100 TB training pipeline actually runs.
  */
object Mining {

  /** For each of the first `nAnchors` stored vectors: the most-similar
    * SAME-label record (excluding the anchor itself — the positive) and the
    * most-similar DIFFERENT-label record (the hard negative), with
    * `margin = pos_score − neg_score`. Shrinking margins over time are the
    * embedding-collapse / label-noise signal; rows with negative margin are
    * exactly the anchors a contrastive fine-tune learns most from.
    *
    * Scale shape: one scored pass — corpus × broadcast(anchor set), scored
    * map-side with the codegen'd cosine — feeding two per-anchor
    * `row_number` windows (positive arm, negative arm). Spark 4 inserts a
    * partial WindowGroupLimit before each exchange, so the shuffle carries
    * one candidate row per anchor per partition, not the corpus. The final
    * join is anchors-sized. Ranking is on the 6-dp-rounded score with a
    * vec_id tie-break, so the oracle elects identical pairs. */
  def hardNegatives(embeddings: DataFrame, nAnchors: Int = 8): DataFrame = {
    val anchors = embeddings.where(col("vec_id") < nAnchors)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        col("embedding").as("query_vec"))
    val scored = embeddings.crossJoin(broadcast(anchors))
      .select(col("query_id"), col("query_label"), col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), col("query_vec")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), asc("vec_id"))
    val pos = scored
      .where(col("label") === col("query_label") && col("vec_id") =!= col("query_id"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .select(col("query_id"), col("vec_id").as("pos_id"), col("score").as("pos_score"))
    val neg = scored
      .where(col("label") =!= col("query_label"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .select(col("query_id"), col("vec_id").as("neg_id"), col("score").as("neg_score"))
    pos.join(neg, Seq("query_id"))
      .select(col("query_id"), col("pos_id"), col("pos_score"),
        col("neg_id"), col("neg_score"),
        round(col("pos_score") - col("neg_score"), 6).as("margin"))
      .orderBy(asc("query_id"))
  }
}
