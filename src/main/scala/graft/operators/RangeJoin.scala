package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — inequality joins (`r.ts ∈ (l.ts - Δ, l.ts]`) degenerate to
  * BroadcastNestedLoopJoin in Spark. For a FIXED range width the standard
  * scalable rewrite is bucketization: bucket both sides by Δ-wide time
  * buckets, probe each left row's own-and-previous bucket, EQUI-join on
  * (key, bucket), then apply the exact range predicate to the survivors.
  * Lossless for ranges ≤ Δ (a right row at-or-before the left row within Δ
  * is always in bucket b or b-1), and the join is a plain shuffled hash
  * join on (user, bucket) — no candidate blowup beyond 2× the matched
  * pairs.
  */
object RangeJoin {

  /** For each `leftType` event: how many `rightType` events the same user
    * produced in the preceding `rangeMicros` window (exclusive-open start,
    * inclusive end), plus their value sum. Left semantics: zero-count rows
    * are kept. */
  def eventCountsInRange(events: DataFrame, leftType: String = "purchase",
                         rightType: String = "click",
                         rangeMicros: Long = 3600L * 1000 * 1000): DataFrame = {
    val left = events.where(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(unix_micros(col("ts")) / rangeMicros).as("b"))
      .select(col("event_id"), col("user_id"), col("ts"),
        explode(array(col("b") - 1, col("b"))).as("bucket"))
    val right = events.where(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("value").as("r_value"),
        floor(unix_micros(col("ts")) / rangeMicros).as("bucket"))

    left
      .join(right, left("user_id") === right("r_user") && left("bucket") === right("bucket"),
        "left_outer")
      .withColumn("in_range",
        col("r_ts").isNotNull &&
          unix_micros(col("r_ts")) > unix_micros(col("ts")) - rangeMicros &&
          unix_micros(col("r_ts")) <= unix_micros(col("ts")))
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(
        sum(when(col("in_range"), 1L).otherwise(0L)).as("n_right"),
        round(coalesce(sum(when(col("in_range"), col("r_value"))), lit(0.0)), 4).as("sum_value"))
      .orderBy(col("event_id"))
  }
}
