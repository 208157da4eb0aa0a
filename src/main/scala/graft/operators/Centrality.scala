package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** Graph-centrality priors over the corpus similarity graph.
  *
  * Web-scale curation pipelines rank pages by link-graph centrality
  * (Common Crawl publishes harmonic-centrality rankings; OPIC/PageRank is
  * the classic form) and keep the top of the ranking as a quality prior.
  * This family applies the same idea to the EMBEDDING similarity graph: a
  * vector that many other vectors point to (it is among their nearest
  * neighbors) sits in a dense, well-connected region — a centrality score
  * over that graph separates prototypical from isolated/outlier content,
  * complementing [[Dedup.semanticDedup]] (which removes redundancy) and
  * [[EmbeddingStats]] (which audits geometry).
  *
  * Everything is a fixed-iteration dataflow — the
  * [[graft.operators.Ann.trainCentroids]] oracle-ability contract: no
  * convergence test, no RNG, every per-iteration reduction rounded to a
  * fixed 12-dp grid so cross-engine float drift cannot accumulate across
  * iterations.
  */
object Centrality {

  /** PageRank with a FIXED iteration count over an explicit directed edge
    * table (`src`, `dst`), for the node set `nodes` (column `vec_id`).
    *
    * Semantics: `r₀ = 1/N`; each step
    * `r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u)`, the leaked-mass
    * variant — a node with no out-edges drops its mass rather than
    * redistributing it (deterministic, and irrelevant for kNN graphs
    * where every node has out-degree k). Per-step ranks round to 12 dp
    * (the cross-engine determinization grid), the returned `rank` to 6 dp.
    *
    * Scale shape: per iteration, one equi-join of the edge table against
    * the current rank vector on `src` and one `dst`-keyed aggregation with
    * map-side partials — the textbook distributed PageRank step; nothing
    * is ever collected to the driver (N is the only driver scalar, the
    * same bounded-state contract as Lloyd's convergence check). The edge
    * table (with out-degrees) is CACHED for the loop — every iteration
    * re-reads it, and when the edge build is itself expensive (the kNN
    * scoring below) an uncached plan re-runs it per iteration (measured
    * 15.8 s → 3 s at sf0.1). The [[Dedup.dedupGroups]] lifecycle contract:
    * the final ranks are materialized into the cache (they are the
    * result's working set) and the edge cache is released before
    * returning. At 100 TB the edge table is a stored artifact (build it
    * with the ANN index probes and persist via the catalog), and `iters`
    * stays small — PageRank's useful signal saturates in a few rounds. */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val n = nodes.count().toDouble // bounded driver scalar, like Lloyd's tol
    val esrc = edges.join(
      edges.groupBy(col("src")).agg(count(lit(1)).as("odeg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var r = nodes.select(col("vec_id"), (lit(1.0) / lit(n)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = esrc
        .join(r.withColumnRenamed("vec_id", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("r") / col("odeg")).as("m"))
      r = nodes
        .join(contrib.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
          round((lit(1.0) - lit(damping)) / lit(n) +
            lit(damping) * coalesce(col("m"), lit(0.0)), 12).as("r"))
    }
    val out = r.select(col("vec_id"), round(col("r"), 6).as("rank"))
      .orderBy(col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try out.queryExecution.toRdd.count() // materialize before releasing edges
    finally esrc.unpersist(false)
    out
  }

  /** [[pageRank]] over the exact kNN cosine graph: a directed edge
    * `u → v` for each of u's `k` nearest neighbors v (self excluded; ties
    * on the 6-dp-rounded score break by `dst` id — the
    * [[Similarity.similarityJoin]] ranking contract). High rank = the
    * vector is a near neighbor of many others = prototypical region.
    *
    * The edge build here is the exact all-pairs scoring with the query
    * side broadcast — the [[Similarity.similarityJoin]] shape, right for
    * a corpus whose QUERY side fits an executor. At 100 TB build the edge
    * table from the stored ANN index instead ([[Ann.annTopkIndexed]] /
    * [[Ann.ivfTopkTrained]] per shard) and feed it to [[pageRank]]
    * directly — the centrality core is edge-source-agnostic. */
  def similarityPageRank(embeddings: DataFrame, k: Int = 5, iters: Int = 5,
                         damping: Double = 0.85): DataFrame = {
    val q = embeddings
      .select(col("vec_id").as("src"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("src"))
      .orderBy(desc("score"), asc("dst"))
    val edges = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("src"))
      .select(col("src"), col("vec_id").as("dst"),
        round(cosine_sim(col("embedding"), col("qv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("src"), col("dst"))
    pageRank(edges, embeddings.select(col("vec_id")), iters, damping)
  }
}
