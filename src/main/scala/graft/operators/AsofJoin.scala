package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark has no built-in for (and the
  * reference has no notion of): each left event is matched to the most
  * recent right event at-or-before it, per key.
  *
  * Formulation: UNION the two sides tagged, one window pass per key ordered
  * by (ts, side) carrying the last-seen right row forward (`last(...,
  * ignoreNulls)` over an unbounded-preceding frame), keep left rows. That is
  * a single shuffle on the key — same cost class as any keyed window — and
  * never materializes the (left × right) candidate space the naive
  * range-join formulation would. Right rows at exactly the left timestamp
  * match (ties order the right side first), mirroring ASOF `>=` semantics.
  */
object AsofJoin {

  /** For each `leftType` event, attach the most recent prior `rightType`
    * event's timestamp/value for the same user (NULL when none — left-join
    * semantics). Output is deterministic: one row per left event. */
  def eventsAsof(events: DataFrame, leftType: String = "purchase",
                 rightType: String = "click"): DataFrame = {
    val tagged = events
      .where(col("event_type").isin(leftType, rightType))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        (col("event_type") === leftType).cast("int").as("is_left"),
        when(col("event_type") === rightType, col("ts")).as("r_ts"),
        when(col("event_type") === rightType, col("value")).as("r_value"))

    val carry = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("asof_ts", last(col("r_ts"), ignoreNulls = true).over(carry))
      .withColumn("asof_value", last(col("r_value"), ignoreNulls = true).over(carry))
      .where(col("is_left") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts"),
        round(col("asof_value"), 4).as("asof_value"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("micros_since"))
      .orderBy(col("event_id"))
  }
}
