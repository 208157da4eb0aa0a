package graft.operators

import graft.SparkSpec

/** Skew-audit semantics: the dominant key surfaces first with the right
  * share/skew arithmetic, and a uniform key-space reports skew ≈ 1.
  */
class DiagnosticsSpec extends SparkSpec {

  import spark.implicits._

  test("heavy hitter ranks first; share and skew follow from the counts") {
    // key 7: 10 rows; keys 1-5: 1 row each => total 15, avg 2.5
    val rows = Seq.fill(10)(7L) ++ (1L to 5L)
    val df = rows.map(k => (k, "x")).toDF("user_id", "payload")
    val out = Diagnostics.skewAudit(df, "user_id", topN = 3).collect()
    assert(out.head.getLong(0) == 7L && out.head.getLong(1) == 10L)
    assert(math.abs(out.head.getDouble(2) - 10.0 / 15.0) < 1e-6) // share
    assert(math.abs(out.head.getDouble(3) - 10.0 / 2.5) < 1e-6)  // skew vs avg
    assert(out.length == 3 && out(1).getLong(1) == 1L)           // ties follow
  }

  test("uniform keys: every skew factor is 1") {
    val df = (1L to 8L).map(k => (k, "x")).toDF("user_id", "payload")
    val out = Diagnostics.skewAudit(df, "user_id", topN = 8).collect()
    assert(out.length == 8 && out.forall(_.getDouble(3) == 1.0))
  }
}
