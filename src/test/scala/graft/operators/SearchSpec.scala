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

  test("hybrid RRF: fused score follows from the arm ranks; output ordered and bounded") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Search.hybridTopK(docs, Seq("vector", "hash", "join"),
      "spark data query", k = 10).collect()
    assert(out.nonEmpty && out.length <= 10)
    val rrfs = out.map(_.getDouble(3))
    assert(rrfs.sameElements(rrfs.sorted.reverse), "rrf must be descending")
    out.foreach { r =>
      val b = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val c = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(b.nonEmpty || c.nonEmpty, "a fused row must come from at least one arm")
      val expected = b.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        c.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expected) < 1e-9)
    }
    // two-arm docs must beat a doc whose single arm ranks no better
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    assert(both.nonEmpty, "expected at least one doc ranked by both arms in the top-k")
  }

  test("chunkDocRetrieval: one row per doc, best chunk belongs to it, doc score = its max chunk") {
    val dir = "/root/testdata/sf0.001"
    val rows = Search.chunkDocRetrieval(spark, dir, "spark data query", k = 10).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length) // doc-level: no dup docs
    rows.foreach(r => assert(r.getString(1).startsWith(r.getLong(0) + "-"),
      s"best chunk ${r.getString(1)} not from doc ${r.getLong(0)}"))
    // ordering: by score desc with doc_id tie-break
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sortBy(-_))
  }

  test("plan: broadcast stats join + TakeOrderedAndProject, no exchange of the corpus") {
    val plan = Search.bm25TopK(docs, Seq("cat", "dog"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded-heap top-k:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the one-row stats:\n$plan")
  }
}
