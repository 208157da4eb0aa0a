package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Batch sessionization semantics on a hand-built log, plus the plan
  * guard: every window must be partitioned by user_id (a sessionizer with
  * an unpartitioned window is a single-machine sort at scale).
  */
class SessionizeSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("gap splits sessions; counts, sums and durations are per-session") {
    import spark.implicits._
    // user 1: events at 10:00, 10:10, 11:00(+60) → two sessions (gap 30m)
    // user 2: single event → one 1-event session
    val events = Seq(
      (1L, 1L, ts(0), 1.0),
      (2L, 1L, ts(10), 2.0),
      (3L, 1L, Timestamp.valueOf("2026-01-01 11:00:00"), 4.0),
      (4L, 2L, ts(5), 8.0)
    ).toDF("event_id", "user_id", "ts", "value")

    val rows = Sessionize.sessions(events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5), r.getLong(6)))

    assert(rows.toSeq == Seq(
      (1L, 1L, 2L, 3.0, 600L), // user 1 session 1: 2 events, 10 min
      (1L, 2L, 1L, 4.0, 0L),   // user 1 session 2
      (2L, 1L, 1L, 8.0, 0L)))  // user 2
  }

  test("userSequences: event-time order, head truncation, and the latest-N cap") {
    import spark.implicits._
    val events = Seq(
      (3L, 1L, ts(2), "c"),
      (1L, 1L, ts(0), "a"),
      (2L, 1L, ts(1), "b"),
      (4L, 2L, ts(0), "x")
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumnRenamed("value", "event_type")

    val full = Sessionize.userSequences(events, maxLen = 256, headLen = 2).collect()
    val u1 = full.find(_.getLong(0) == 1L).get
    assert(u1.getLong(1) == 3L)
    assert(u1.getString(3) == "a|b")                 // head: chronological, truncated
    // cap keeps the LATEST two events, still emitted in chronological order
    val capped = Sessionize.userSequences(events, maxLen = 2, headLen = 8).collect()
    val c1 = capped.find(_.getLong(0) == 1L).get
    assert(c1.getLong(1) == 2L && c1.getString(3) == "b|c")
    // fingerprint is order-sensitive: full vs capped differ for user 1
    assert(u1.getString(2) != c1.getString(2))
  }

  test("every window is keyed by user_id — no unpartitioned window") {
    import spark.implicits._
    val events = Seq((1L, 1L, ts(0), 1.0)).toDF("event_id", "user_id", "ts", "value")
    val plan = Sessionize.sessions(events).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), s"unpartitioned window:\n$plan")
  }
}
