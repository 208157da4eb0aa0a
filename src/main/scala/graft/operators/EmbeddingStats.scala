package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim

/** Embedding-quality statistics — X8: per-label centroid cohesion, the
  * embedding-health dashboard a training-data pipeline runs after ingest
  * (degenerate labels → centroid cosine near 0; duplicated clusters →
  * near 1).
  *
  * Shuffle budget: one position-explode aggregation to build centroids
  * (64·L groups — tiny), the centroid table broadcast back onto the
  * embeddings (no shuffle of the big side), one final per-label
  * aggregation with map-side partial aggregation. Scales linearly in
  * rows; never materializes pairwise anything.
  *
  * Determinism note: element means are rounded to 9 dp before the cosine
  * so that sub-ulp summation-order drift between engines (and between
  * partitionings) cannot leak through the 6 dp score rounding.
  */
object EmbeddingStats {

  def perLabelCohesion(embeddings: DataFrame): DataFrame = {
    val exploded = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))

    val centroids = exploded
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, x -> round(x.m, 9))").as("centroid"))

    embeddings
      .join(broadcast(centroids), "label")
      .select(col("label"),
        round(cosine_sim(col("embedding"), col("centroid")), 6).as("s"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("s")), 4).as("avg_cos"),
        min(col("s")).as("min_cos"),
        max(col("s")).as("max_cos"))
      .orderBy(col("label"))
  }
}
