package graft.operators

import graft.SparkSpec

/** BM25 ranking semantics: term-frequency saturation and idf ordering,
  * exclusion of documents with no query term, and the scale-shape
  * contract (one-row stats broadcast, bounded-heap k-selection, no
  * vocabulary shuffle).
  */
class SearchSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "cat cat cat cat cat"),            // stuffed with one term
    (2L, "cat dog"),                        // both terms once, short
    (3L, "cat dog " + ("filler words here " * 10).trim), // both terms, long
    (4L, "nothing relevant at all"),        // no query term
    (5L, "dog")                             // rare term only
  ).toDF("doc_id", "text")

  test("matches all query terms > one term; no-term docs excluded; k bounds rows") {
    val out = Search.bm25TopK(docs, Seq("cat", "dog"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(4L))                       // score 0 filtered
    assert(out(2L) > out(1L))                       // both terms beat tf-stuffing (saturation)
    assert(out(2L) > out(3L))                       // shorter doc wins at equal tf (length norm)
    assert(out.values.forall(_ > 0))
    val top1 = Search.bm25TopK(docs, Seq("cat", "dog"), k = 1).collect()
    assert(top1.length == 1 && top1.head.getLong(0) == 2L)
  }

  test("rejects non-word query terms (SQL is built from them)") {
    intercept[IllegalArgumentException] {
      Search.bm25TopK(docs, Seq("x' OR '1'='1"), k = 5)
    }
  }

  test("plan: broadcast stats join + TakeOrderedAndProject, no exchange of the corpus") {
    val plan = Search.bm25TopK(docs, Seq("cat", "dog"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded-heap top-k:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the one-row stats:\n$plan")
  }
}
