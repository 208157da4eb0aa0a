package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel over an event log: step i counts a user only
  * if their FIRST qualifying step-i event occurs at-or-after the event
  * that qualified them for step i−1 — the standard product-analytics
  * funnel (a purchase before ever clicking does not convert).
  *
  * Shape: one filtered aggregation per step (min ts per user), chained by
  * broadcast-friendly equi-joins on user_id — each stage's output is one
  * row per still-converted user, so the joined side shrinks
  * monotonically. No window over unbounded history, no self cross
  * product; per-step state is (users remaining) rows at any scale.
  */
object Funnel {

  def conversion(events: DataFrame,
                 steps: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")

    // fold: (users still in the funnel, their qualifying ts) per step
    var current = events
      .where(col("event_type") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("qual_ts"))
    var counts = Vector(steps.head -> current.count())

    steps.tail.foreach { step =>
      val next = events
        .where(col("event_type") === step)
        .join(current, "user_id")
        .where(col("ts") >= col("qual_ts"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("qual_ts"))
      current = next
      counts :+= step -> next.count()
    }

    val spark = events.sparkSession
    import spark.implicits._
    val base = counts.head._2.toDouble
    counts.zipWithIndex.map { case ((step, n), i) =>
      (i + 1, step, n,
        if (base > 0) BigDecimal(n / base).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0)
    }.toDF("step", "event_type", "n_users", "pct_of_first")
      .select(col("step").cast("bigint").as("step"), col("event_type"),
        col("n_users"), col("pct_of_first"))
  }
}
