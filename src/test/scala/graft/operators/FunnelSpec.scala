package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel ordering semantics on a hand-built log: a step only counts when
  * its first qualifying event is at-or-after the previous step's
  * qualifying event.
  */
class FunnelSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2026-01-01 00:00:00").getTime + min * 60000L)

  test("out-of-order and missing steps drop users at the right stage") {
    import spark.implicits._
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // user 2: purchase without click → stops after signup
      (2L, "signup", ts(0)), (2L, "purchase", ts(5)),
      // user 3: click BEFORE signup only → click does not qualify
      (3L, "click", ts(0)), (3L, "signup", ts(10)),
      // user 4: never signs up → not even step 1
      (4L, "click", ts(0)), (4L, "purchase", ts(5))
    ).toDF("user_id", "event_type", "ts")

    val rows = Funnel.conversion(events).orderBy("step").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("signup", 3L, 1.0),
      ("click", 1L, 0.333333),
      ("purchase", 1L, 0.333333)))
  }

  test("same-timestamp chains qualify (>= semantics)") {
    import spark.implicits._
    val events = Seq(
      (1L, "signup", ts(0)), (1L, "click", ts(0)), (1L, "purchase", ts(0))
    ).toDF("user_id", "event_type", "ts")
    val rows = Funnel.conversion(events).orderBy("step").collect()
    assert(rows.forall(_.getLong(2) == 1L))
  }
}
