package graft.operators

import graft.SparkSpec

/** The assembled curation pipeline: each gate fails for its own reason,
  * verdicts stay auditable per document, and kept is the conjunction.
  */
class CorpusFilterSpec extends SparkSpec {

  import spark.implicits._

  test("each gate drops its own offender; the clean document survives") {
    val good = (1 to 120).map(i => s"w$i").mkString(" ") + " the of and is a to"
    val docs = Seq(
      (1L, good),                               // passes everything
      (2L, "too short"),                        // quality: far below length floor
      (3L, ("spam ham " * 80).trim),            // repetition: one dominant 2-gram
      (4L, good + " mail me at x@y.com"),       // pii
      (5L, good)                                // exact dup of 1 -> dedup drops
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))

    val out = CorpusFilter.decisions(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap

    assert(out(1L) == ((true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._5)   // quality gate
    assert(!out(3L)._2 && !out(3L)._5)   // repetition gate
    assert(!out(4L)._3 && !out(4L)._5)   // pii gate
    assert(!out(5L)._4 && !out(5L)._5)   // dedup gate (doc 1 is the keeper)
    // audit property: kept == AND of the four verdicts, every row
    out.values.foreach { case (q, r, p, d, kept) => assert(kept == (q && r && p && d)) }
  }

  test("decisionsDelta ≡ decisions(new) byte-for-byte; a changed doc re-elects its duplicate group's keeper") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    // engineered so every carry/re-scan arm matters: 1 unchanged, 2
    // changed (leaves the dup group with 6 -> 6 becomes its group's
    // keeper), 3 removed, 7 added as a dup of 1 (1 stays keeper, 7
    // dropped), 6 unchanged but its keeper flips — a verdict change on a
    // doc the delta never rescans, the decisionsFromEvidence contract
    val good = (1 to 120).map(i => s"w$i").mkString(" ") + " the of and is a to"
    val old = Seq(
      (1L, good), (2L, good + " dup"), (3L, "gone"), (6L, good + " dup")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val neu = Seq(
      (1L, good), (2L, good + " changed away"), (6L, good + " dup"),
      (7L, good)
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val full = CorpusFilter.decisions(neu).collect().toSeq
    val delta = CorpusFilter.decisionsDelta(
      CorpusFilter.gateEvidence(old), neu).collect().toSeq
    assert(delta == full, "delta path must equal the full re-gate")
    val byId = delta.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(byId(6L), "6 must become its group's keeper after 2 changed away")
    assert(!byId(7L), "7 duplicates 1 and must lose the keeper election")
    // and on the corpus pair: the real-table identity at spec scale
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val b = Sampling.hashBucket(col("doc_id"))
    val (o2, n2) = (docs.where(b < 90),
      docs.where(b >= 10).withColumn("text",
        when(b >= 40 && b < 50, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))))
    assert(CorpusFilter.decisionsDelta(CorpusFilter.gateEvidence(o2), n2)
      .collect().toSeq == CorpusFilter.decisions(n2).collect().toSeq)
  }

  test("report: per-lang rollup accounts for every doc; shares are probabilities") {
    import spark.implicits._
    val dup = "the a of and to is repeated body long enough to count"
    val docs = Seq(
      (1L, dup, "en"), (2L, dup, "en"),                       // exact dup pair
      (3L, "mail me at a@b.co now", "en"),                    // pii doc
      (4L, "el la de que y en words aqui", "es")
    ).toDF("doc_id", "text", "lang")
    val out = CorpusFilter.report(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set("en", "es"))
    assert(out("en")._1 == 3L && out("es")._1 == 1L) // every doc accounted once
    assert(out("en")._3 == 0.333333)                 // one dup of three en docs
    assert(out("en")._4 == 0.333333)                 // one pii doc of three
    assert(out("es")._3 == 0.0 && out("es")._4 == 0.0)
  }
}
