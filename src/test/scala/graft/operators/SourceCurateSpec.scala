package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The source-curation contracts: exact stats mergeability (the property
  * every incremental rung rests on), gate semantics including the
  * declared cold-start rule, indexed ≡ inline, and the per-doc filter's
  * consistency with the gate. */
class SourceCurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sourceStats merge is EXACT: merge(stats(A), stats(B)) == stats(A ∪ B) for any split") {
    val docs = Tables.documents(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).toSeq
    val whole = rows(SourceCurate.sourceStats(docs))
    // three different splits — bucket, parity, and a lopsided id cut —
    // all must reassemble identically (every column is a per-doc sum)
    val b = Sampling.hashBucket(col("doc_id"))
    Seq(
      (docs.where(b < 50), docs.where(b >= 50)),
      (docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1)),
      (docs.where(col("doc_id") < 37), docs.where(col("doc_id") >= 37))
    ).foreach { case (a, bb) =>
      assert(rows(SourceCurate.mergeSourceStats(
        SourceCurate.sourceStats(a), SourceCurate.sourceStats(bb))) == whole)
    }
    // and merging is associative over a 3-way split
    val (p1, p2, p3) = (docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1), docs.where(col("doc_id") % 3 === 2))
    assert(rows(SourceCurate.mergeSourceStats(
      SourceCurate.mergeSourceStats(
        SourceCurate.sourceStats(p1), SourceCurate.sourceStats(p2)),
      SourceCurate.sourceStats(p3))) == whole)
  }

  test("sourceGate: verdicts from shares; cold-start keeps the unmeasured; filter is the gate's per-doc consequence") {
    import spark.implicits._
    // engineered host evidence: srcA high quality, srcB low quality (all
    // punctuation-free junk is still low by token count), srcC has only 2
    // docs (below minDocs = 3 -> unmeasured, kept regardless of quality)
    // unique filler words between stopwords: high quality (length +
    // stopword ratio) WITHOUT repeated bigrams (the repetition gate)
    val good = (1 to 120).map(i => s"the w${i}a of w${i}b and w${i}c").mkString(" ")
    val docs = (
      (1L to 5L).map(i => (i, good, "en", "srcA")) ++
      (11L to 15L).map(i => (i, "x,,,.!!??;;::", "en", "srcB")) ++
      (21L to 22L).map(i => (i, "y.!?;:", "en", "srcC"))
    ).toDF("doc_id", "text", "lang", "source")
    val gate = SourceCurate.sourceGate(docs, minAvgQuality = 0.2, minDocs = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(7), r.getBoolean(10), r.getBoolean(11))).toMap
    assert(gate("srcA") == ((true, true, true)), "quality host measured and kept")
    assert(gate("srcB") == ((false, true, false)), "junk host measured and blocked")
    assert(gate("srcC")._2 == false, "2 docs < minDocs: unmeasured")
    assert(gate("srcC")._3 == true, "cold-start: the unmeasured host passes")
    // the per-doc filter carries exactly the gate's verdict per source
    val filt = SourceCurate.sourceFilter(docs, minAvgQuality = 0.2, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((1L to 5L).forall(filt(_)) && (21L to 22L).forall(filt(_)))
    assert((11L to 15L).forall(!filt(_)))
    // incremental form: judged on state MERGED with the batch — srcB's
    // second batch is blocked once the combined evidence crosses the rule
    val half1 = docs.where(col("doc_id") <= 12)
    val half2 = docs.where(col("doc_id") > 12)
    val inc = SourceCurate.sourceFilterIncremental(half2,
        SourceCurate.sourceStats(half1), minAvgQuality = 0.2, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((13L to 15L).forall(!inc(_)),
      "running evidence (2 prior + 3 batch junk docs) must block srcB")
  }

  test("sourceStatsFromMeasures ≡ sourceStats byte-for-byte (the composed-arm reuse form)") {
    val docs = Tables.documents(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).toSeq
    val measures = CorpusFilter.decisionsWithMeasures(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    assert(rows(SourceCurate.sourceStatsFromMeasures(measures)) ==
      rows(SourceCurate.sourceStats(docs)),
      "the reuse form must aggregate to the scan form's exact bytes")
    // and at a non-default threshold (the n_low_quality arm moves)
    val m2 = CorpusFilter.decisionsWithMeasures(docs, minQuality = 0.5)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    assert(rows(SourceCurate.sourceStatsFromMeasures(m2, minQuality = 0.5)) ==
      rows(SourceCurate.sourceStats(docs, minQuality = 0.5)))
  }

  test("NULL-source docs take the cold-start keep in the per-doc filter, never vanish") {
    import spark.implicits._
    val junk = "x,,,.!!??;;::"
    val docs = (
      (1L to 5L).map(i => (i, junk, "en", "srcB")) ++
      Seq((31L, junk, "en", null.asInstanceOf[String]),
          (32L, "the quick brown fox of the many and the few", "en",
            null.asInstanceOf[String]))
    ).toDF("doc_id", "text", "lang", "source")
    val filt = SourceCurate.sourceFilter(docs, minAvgQuality = 0.2, minDocs = 3L)
    assert(filt.count() == 7, "every doc gets a verdict row — none silently dropped")
    val m = filt.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((1L to 5L).forall(!m(_)), "the junk host still blocks")
    assert(m(31L) && m(32L),
      "unattributed docs pass cold-start — a pooled 'no host' verdict is never applied")
    // the incremental form follows the same rule
    val inc = SourceCurate.sourceFilterIncremental(
        docs.where(col("doc_id") >= 31),
        SourceCurate.sourceStats(docs.where(col("doc_id") <= 5)),
        minAvgQuality = 0.2, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(inc(31L) && inc(32L))
  }

  test("sourceGateAuto: exact bottom-pct rank rule, deterministic ties, unmeasured pass with NULL rank") {
    import spark.implicits._
    // five measured sources with strictly ordered quality (m1 worst …
    // m5 best) + one tiny source below the evidence floor. At 40% the
    // cutoff is floor(5 · 40 / 100) = 2: m1 and m2 block, m3 keeps —
    // the EXACT rank rule, not a percentile approximation.
    var nextId = 0L
    def mk(src: String, stop: Int, n: Int) = (1 to n).map { i =>
      val toks = (1 to 40).map(j =>
        if (j <= stop) s"the w${src}x${i}x$j" else s"w${src}y${i}y$j q${src}z$i$j")
      nextId += 1
      (nextId, toks.mkString(" "), "en", src)
    }
    val docs = (mk("m1", 0, 5) ++ mk("m2", 4, 5) ++ mk("m3", 8, 5) ++
      mk("m4", 16, 5) ++ mk("m5", 28, 5) ++ mk("tiny", 40, 2))
      .toDF("doc_id", "text", "lang", "source")
    val out = SourceCurate.sourceGateAuto(docs, blockBottomPct = 40, minDocs = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(4), if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6))).toMap
    // quality strictly increases with the stopword share, so ranks are 1..5
    assert((1 to 5).forall(i => out(s"m$i")._2 == i.toLong), s"ranks drifted: $out")
    assert(!out("m1")._3 && !out("m2")._3, "bottom 2 of 5 at 40% must block")
    assert(out("m3")._3 && out("m4")._3 && out("m5")._3)
    assert(out("tiny") == ((false, -1L, true)), "unmeasured: NULL rank, kept")
    // determinism under ties: two identical-quality sources rank by name
    val tied = (mk("ta", 8, 5) ++ mk("tb", 8, 5))
      .map { case (id, t, l, s) => (id, t.replaceAll("x|y|z", "k"), l, s) }
    val tdocs = tied.toDF("doc_id", "text", "lang", "source")
    val touts = SourceCurate.sourceGateAuto(tdocs, blockBottomPct = 50, minDocs = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(touts("ta") < touts("tb"), "ties must break by source name")
  }

  test("sourceGateIndexed ≡ inline; FailIfMissing honored; stats index is sources-sized") {
    val docs = Tables.documents(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).toSeq
    val reg = CatalogOps.indexRegistry(spark, dir)
    val name = SourceCurate.sourceStatsIndexName(0.3)
    if (reg.isIndexRegistered(name)) reg.dropIndex(name)
    intercept[graft.core.GraftException] {
      SourceCurate.sourceGateIndexed(spark, dir,
        policy = graft.core.IndexPolicy.FailIfMissing).collect()
    }
    val inline = rows(SourceCurate.sourceGate(docs, minAvgQuality = 0.29))
    assert(rows(SourceCurate.sourceGateIndexed(spark, dir,
      minAvgQuality = 0.29)) == inline)
    val built = CatalogOps.indexRegistry(spark, dir).getIndex(name)
    assert(rows(SourceCurate.sourceGateIndexed(spark, dir,
      minAvgQuality = 0.29,
      policy = graft.core.IndexPolicy.FailIfMissing)) == inline)
    assert(CatalogOps.indexRegistry(spark, dir).getIndex(name).version == built.version)
    // the stored table is per-source rows — the smallest index there is
    assert(spark.read.parquet(s"${built.path}/stats").count() ==
      docs.select(col("source")).distinct().count())
  }
}
