package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the checks run BEFORE committing a
  * 100 TB job to a plan: a shuffle join on a key with heavy hitters
  * stalls on a handful of straggler tasks, and the fix (salting, AQE
  * skew splitting, broadcasting the other side) has to be chosen before
  * the job runs, from exactly this report.
  */
object Diagnostics {

  /** Heavy-hitter audit for a prospective join/aggregation key: the topN
    * keys by row count with each key's share of the table and its skew
    * factor (rows vs the mean key). skew ≫ 1 on the top key = salt it or
    * split it; share near 1/n_keys everywhere = shuffle is safe.
    *
    * Scale shape: one map-side-combined aggregation on the key (the same
    * shuffle the prospective join would do, but carrying one row per
    * distinct key), a one-row global stats broadcast, and a bounded-heap
    * top-N. */
  def skewAudit(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(
      sum(col("n_rows")).as("total"),
      round(avg(col("n_rows")), 9).as("avg_rows"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("n_rows"),
        round(col("n_rows") / col("total"), 6).as("share"),
        round(col("n_rows") / col("avg_rows"), 6).as("skew"))
      .orderBy(desc("n_rows"), asc("key"))
      .limit(topN)
  }
}
