package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands) over an event log — the batch
  * twin of [[graft.streaming.Streaming.sessionize]] (which keeps one state
  * struct per live user; this computes the same sessions over history).
  *
  * Scale shape: every window here is partitioned by `user_id`, so the work
  * is one hash shuffle on the user key followed by per-user sorted
  * scans — no global sort, no single-partition window, no join. Skewed
  * power users bound the per-partition sort at (events of the hottest
  * user), which is the natural limit of any order-dependent sessionizer;
  * AQE skew handling splits oversized shuffle partitions of *different*
  * users automatically.
  */
object Sessionize {

  /** Retention cohort matrix — the product-analytics staple over the same
    * event log the sessionizer consumes: users cohorted by their FIRST
    * active week, then for every (cohort, weeks-since-cohort) cell the
    * share of the cohort still active. Weeks are exact integer epoch
    * arithmetic (`unix_micros div week`) rather than calendar
    * `date_trunc` — engine-identical by construction, no week-start or
    * timezone convention to align.
    *
    * Scale shape: one (user, week) distinct (user-keyed shuffle with
    * map-side partials), one user-keyed min for cohort assignment, one
    * equi-join back on `user_id`, then a (cohort, offset)-keyed count —
    * all shuffles user- or cohort-keyed; the cohort-size table (one row
    * per week in history) is broadcast back onto the matrix. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekMicros = 7L * 86400L * 1000000L
    // FLOOR division, not `div` (which truncates toward zero): the DuckDB
    // oracle's `//` floors, and the two diverge on pre-1970 timestamps
    // (negative unix_micros) — `x - pmod(x, w)` is exactly divisible and
    // stays in 64-bit integer arithmetic (micros overflow a double's
    // 53-bit mantissa for dates past ~2255, so no float detour).
    val active = events
      .select(col("user_id"), expr(
        s"(unix_micros(ts) - pmod(unix_micros(ts), $weekMicros)) div $weekMicros")
        .as("week"))
      .distinct()
    val cohort = active.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Close sessions after `gapMinutes` of user silence; emit one row per
    * session with start/end, event count and value sum. Deterministic
    * ordering inside a user via the (ts, event_id) tie-break. */
  /** Training-sequence export for sequential models: each user's event
    * types assembled in event-time order into one row — the last step that
    * turns a curated event log into model inputs. Emits the event count,
    * an md5 fingerprint of the full ordered sequence (the dedup/shuffle-
    * stability key for downstream training), and the first `headLen`
    * elements for inspection.
    *
    * Scale contract: histories are CAPPED before assembly — a per-user
    * ranking window keeps only the latest `maxLen` events (Spark 4 plants
    * a partial WindowGroupLimit before the exchange, so the shuffle
    * carries ≤ maxLen rows per user per partition), and only then does
    * `collect_list` run. Per-user state is therefore bounded by maxLen
    * regardless of how hot the hottest user is — an uncapped collect would
    * OOM on power users at 100 TB. Ordering is (ts, event_id) — total and
    * engine-stable, so the fingerprints are reproducible. */
  def userSequences(events: DataFrame, maxLen: Int = 256, headLen: Int = 8): DataFrame = {
    val wRecent = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
    events
      .withColumn("rn", row_number().over(wRecent)).where(col("rn") <= maxLen)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
          .as("seq"))
      .select(col("user_id"), col("n_events"),
        md5(array_join(expr("transform(seq, x -> x.event_type)"), "|")).as("seq_fp"),
        array_join(expr(s"slice(transform(seq, x -> x.event_type), 1, $headLen)"), "|")
          .as("head"))
      .orderBy(col("user_id"))
  }

  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros).cast("int"))
      .withColumn("session_seq", sum(col("new_session")).over(running).cast("bigint"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000"))
      .orderBy(col("user_id"), col("session_seq"))
  }
}
