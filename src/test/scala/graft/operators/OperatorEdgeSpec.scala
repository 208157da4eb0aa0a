package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Edge-case coverage for operators whose main-path correctness is pinned by
  * the DuckDB oracle: chunk boundaries, ANN/IVF probe semantics, stat
  * invariants.
  */
class OperatorEdgeSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chunk: boundary sizes — exact multiple, off-by-one, empty") {
    val docs = Seq(
      (1L, "a" * 8),   // exactly 2 chunks of 4
      (2L, "b" * 9),   // 3rd chunk of length 1
      (3L, ""),        // no chunks
      (4L, "cc")       // single short chunk
    ).toDF("doc_id", "text")
    val out = Ingest.chunk(docs, "doc_id", "text", chunkSize = 4)
      .orderBy("id").collect()
    val byDoc = out.groupBy(_.getString(0).split("-")(0))
    assert(byDoc("1").length == 2)
    assert(byDoc("2").length == 3)
    assert(byDoc("2").map(_.getString(1)).mkString == "b" * 9) // reassembly identity
    assert(!byDoc.contains("3"))
    assert(byDoc("4").map(_.getString(1)).toSeq == Seq("cc"))
    assert(out.map(_.getString(0)).contains("1-0") && out.map(_.getString(0)).contains("1-1"))
  }

  test("annTopk: self-match ranks first at score 1.0; scores never beat exact top-k") {
    val ann = Ann.annTopk(spark, dir, queryVecId = 0L, k = 5).collect()
    assert(ann.nonEmpty)
    assert(ann.head.getLong(0) == 0L && ann.head.getDouble(2) == 1.0)
    val exact = Similarity.topKSingle(spark, dir, 0L, 5).collect()
    // ANN scores are a subset of the corpus, so the i-th ANN score can't
    // exceed the i-th exact score
    ann.zip(exact).foreach { case (a, e) =>
      assert(a.getDouble(2) <= e.getDouble(2) + 1e-12)
    }
  }

  test("annRecall: one row per query; hits in [1, k]; recall = hits/k; k=1 is perfect") {
    val k = 5
    val r = Ann.annRecall(spark, dir, nQueries = 4, k = k).collect()
    assert(r.length == 4)
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    r.foreach { row =>
      val hits = row.getLong(1)
      // the query vector itself shares every band key and scores 1.0, so
      // it is in both arms' top-k → at least one hit always
      assert(hits >= 1 && hits <= k)
      assert(math.abs(row.getDouble(2) - hits.toDouble / k) < 1e-9)
    }
    // at k=1 both arms elect the self-match → recall 1.0 for every query
    Ann.annRecall(spark, dir, nQueries = 4, k = 1).collect()
      .foreach(row => assert(row.getDouble(2) == 1.0))
  }

  test("ivfRecall: probing every cell is the exact scan (recall 1.0); partial probes floor at the self-hit") {
    Ann.ivfRecall(spark, dir, nQueries = 4, k = 5, nCells = 8, nProbe = 8).collect()
      .foreach(r => assert(r.getDouble(2) == 1.0))
    val partial = Ann.ivfRecall(spark, dir, nQueries = 4, k = 5, nCells = 8, nProbe = 2).collect()
    assert(partial.length == 4)
    partial.foreach { r =>
      // the query's own cell always ranks first in its probe list, so the
      // self-match survives any nProbe >= 1
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 5)
    }
  }

  test("ivfRetrainOnRecall: both branches pinned — forced keep serves the stale delta layout, forced rebuild the fresh retrain") {
    // minHits = 0 → no hit count is ever below it → the stale branch is
    // forced, and the served rows are EXACTLY ivfDeltaTopk (same base
    // slice, same frozen centroids, same probe)
    val kept = Ann.ivfRetrainOnRecall(spark, dir, 0L, 5, nCells = 8, nProbe = 2,
      splitId = 25L, nQueries = 4, minHits = 0L).collect()
    assert(kept.forall(!_.getBoolean(3)), "minHits=0 must never rebuild")
    val delta = Ann.ivfDeltaTopk(spark, dir, 0L, 5, nCells = 8, nProbe = 2,
      splitId = 25L).collect()
    assert(kept.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      delta.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    // minHits above the nQueries·k ceiling → rebuild always fires, and the
    // rebuilt arm IS the full-corpus retrain: ivfDeltaTopk with splitId
    // covering everything trains on the identical (whole) corpus with an
    // empty delta, so its rows are the rebuild's expected output
    val rebuilt = Ann.ivfRetrainOnRecall(spark, dir, 0L, 5, nCells = 8, nProbe = 2,
      splitId = 25L, nQueries = 4, minHits = 4L * 5 + 1).collect()
    assert(rebuilt.forall(_.getBoolean(3)), "minHits > nQueries*k must rebuild")
    val fresh = Ann.ivfDeltaTopk(spark, dir, 0L, 5, nCells = 8, nProbe = 2,
      splitId = Long.MaxValue).collect()
    assert(rebuilt.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      fresh.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    // the decision record is bounded by construction: every query's own
    // cell is probed, so the self-match floors hits at nQueries; the
    // ceiling is nQueries·k
    val hits = rebuilt.head.getLong(4)
    assert(hits >= 4L && hits <= 20L,
      s"hits must sit in [nQueries, nQueries*k], got $hits")
    assert(kept.head.getLong(4) == hits,
      "same stale training (same splitId) must measure the same total_hits")
  }

  test("hardNegatives: positive shares the anchor's label, negative doesn't, no self-pairs") {
    val labels = Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Mining.hardNegatives(Tables.embeddings(spark, dir), nAnchors = 6).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (qid, posId, negId) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(posId != qid)
      assert(labels(posId) == labels(qid))
      assert(labels(negId) != labels(qid))
      // margin is the rounded difference of the two reported scores
      assert(math.abs(r.getDouble(5) - BigDecimal(r.getDouble(2) - r.getDouble(4))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("embedDrift: split counts conserved per label; centroid cosine bounded") {
    val e = Tables.embeddings(spark, dir)
    val perLabel = e.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = EmbeddingStats.embedDrift(e).collect()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perLabel(r.getInt(0)))
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
    // trainPct=100 would drop every label (empty test split) — the inner
    // join is the guard against reporting a drift score with no data
    assert(EmbeddingStats.embedDrift(e, trainPct = 100).count() == 0)
  }

  test("dimRecall: full-width truncation is perfect recall; self-match floors the rest") {
    val e = Tables.embeddings(spark, dir)
    // truncating to the full 64 dims ranks identically => recall 1.0
    EmbeddingStats.dimRecall(e, nQueries = 4, k = 5, dims = 64).collect()
      .foreach(r => assert(r.getDouble(2) == 1.0))
    val r16 = EmbeddingStats.dimRecall(e, nQueries = 4, k = 5, dims = 16).collect()
    assert(r16.length == 4)
    r16.foreach { r =>
      // the anchor itself scores 1.0 in both arms, so hits >= 1
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 5)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("retrievalEval: hand-computed MRR and NDCG, small-label IDCG normalization") {
    import spark.implicits._
    // anchors are vec_id % 7 == 0 => ids 0 (label A) and 7 (label B)
    val e = Seq(
      (0L, "A", Seq(1f, 0f)),
      (1L, "A", Seq(1f, 0f)),    // exact match for anchor 0: rank 1, relevant
      (2L, "B", Seq(0.9f, 0.1f)),// near anchor 0 but label B: rank 2
      (3L, "A", Seq(0f, 1f)),    // orthogonal to 0 (rank 3 by id tie-break), top hit for 7
      (7L, "B", Seq(0f, 1f))
    ).toDF("vec_id", "label", "embedding")
    val out = EmbeddingStats.retrievalEval(e).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // anchor 0: relevant at ranks 1 and 3; label A has 2 other members => m=2
    val ndcgA = (1.0 / log2(2.0) + 1.0 / log2(4.0)) / (1.0 / log2(2.0) + 1.0 / log2(3.0))
    // anchor 7: the only other B lands at rank 2; m=1 => IDCG=1
    val ndcgB = 1.0 / log2(3.0)
    assert(out("A")._1 == 1L && out("A")._2 == 1.0)
    assert(math.abs(out("A")._3 - ndcgA) < 1e-5)
    assert(out("B")._1 == 1L && out("B")._2 == 0.5)
    assert(math.abs(out("B")._3 - ndcgB) < 1e-5)
  }

  test("retrievalEval: anchor conservation and metric bounds on real embeddings") {
    val e = Tables.embeddings(spark, dir)
    val nAnchors = e.where(expr("vec_id % 7 = 0")).count()
    val rows = EmbeddingStats.retrievalEval(e).collect()
    assert(rows.map(_.getLong(1)).sum == nAnchors) // every anchor graded once
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) // mrr
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // ndcg
      assert(r.getDouble(3) >= r.getDouble(2) * (1.0 / 10.0)) // both zero together
    }
  }

  test("knnLabelAudit: anchor counts conserved; acc = correct/n in [0,1]") {
    val e = Tables.embeddings(spark, dir)
    val nAnchors = e.where(expr("vec_id % 7 = 0")).count()
    val rows = EmbeddingStats.knnLabelAudit(e).collect()
    assert(rows.map(_.getLong(1)).sum == nAnchors) // every anchor classified once
    rows.foreach { r =>
      val (n, correct, acc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(correct >= 0 && correct <= n)
      assert(acc >= 0.0 && acc <= 1.0)
      assert(math.abs(acc - BigDecimal(correct.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("ivfTopk: query's own cell is probed (self-match present, rank 1)") {
    val ivf = Ann.ivfTopk(spark, dir, queryVecId = 0L, k = 5, nCells = 8, nProbe = 2).collect()
    assert(ivf.nonEmpty)
    assert(ivf.head.getLong(0) == 0L && ivf.head.getDouble(2) == 1.0)
  }

  test("trainCentroids: Lloyd loop converges to an assignment fixpoint") {
    val e = Tables.embeddings(spark, dir)
    val (cents, iters) = Ann.trainCentroids(e, nCells = 8, maxIters = 30)
    assert(iters < 30, s"Lloyd loop did not converge in 30 iterations")
    assert(cents.length == 8 && cents.forall(_.length == 64))
    // fixpoint law: one more step reproduces every centroid component —
    // i.e. the cell assignment is stable under the trained centroids
    Ann.kmeansStep(e, cents).collect().foreach { r =>
      assert(math.abs(cents(r.getLong(0).toInt - 1)(r.getLong(1).toInt) - r.getDouble(2)) <= 1e-9,
        s"centroid (${r.getLong(0)}, ${r.getLong(1)}) moved at the claimed fixpoint")
    }
  }

  test("ivfTopkTrained: exhaustive probe equals exact; persisted centroids round-trip") {
    // nProbe = nCells degenerates to the exact scan
    val trained = Ann.ivfTopkTrained(spark, dir, 0L, 5, nCells = 8, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.topKSingle(spark, dir, 0L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(trained == exact)
    // second call reads the _centroids parquet written beside the index
    // (not retrain) and must reproduce the same result
    val again = Ann.ivfTopkTrained(spark, dir, 0L, 5, nCells = 8, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(again == trained)
  }

  test("top-k monotonicity: top-k is a prefix of top-(k+1) (SURVEY §5.2)") {
    val ids = (k: Int) => Similarity.topKSingle(spark, dir, 0L, k)
      .collect().map(_.getLong(0)).toSeq
    (1 to 8).foreach { k =>
      assert(ids(k) == ids(k + 1).take(k), s"prefix property broke at k=$k")
    }
  }

  test("embedding stats: label partition is exhaustive and cosines bounded") {
    val e = Tables.embeddings(spark, dir)
    val stats = EmbeddingStats.perLabelCohesion(e).collect()
    assert(stats.map(_.getLong(1)).sum == e.count())
    stats.foreach { r =>
      assert(r.getDouble(2) <= 1.0 + 1e-9)           // avg_cos
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9) // min <= max
    }
  }

  test("winnowing: matches a direct implementation; shared substrings share fingerprints") {
    import spark.implicits._
    // reference winnow (k=5, w=4), mirroring the operator's hash exactly
    def hash56(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16)
    }
    def winnow(text: String): Seq[Long] =
      text.sliding(5).map(hash56).toVector.sliding(4).map(_.min).toVector.distinct

    val shared = "the quick brown fox jumps over it"
    val texts = Map(
      1L -> s"AAAA $shared BBBB",
      2L -> s"XXXXXXX $shared YYY",
      3L -> "completely different content here")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    texts.foreach { case (id, t) =>
      val fps = winnow(t)
      assert(got(id) == ((fps.length.toLong, fps.min, fps.max,
        fps.map(_ % 1000003L).sum)), s"summary mismatch for doc $id")
    }
    // coverage guarantee: a shared substring of length >= k+w-1 yields a
    // shared fingerprint between the two overlapping docs
    assert(winnow(texts(1L)).toSet.intersect(winnow(texts(2L)).toSet).nonEmpty)
    assert(winnow(texts(1L)).toSet.intersect(winnow(texts(3L)).toSet).isEmpty)
  }

  test("empty inputs: dedup families, sessions, and clustering yield empty results") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(noDocs).count() == 0)
    assert(Dedup.ngramNear(noDocs).count() == 0)
    assert(Dedup.minhashNear(noDocs).count() == 0)
    val noPairs = Seq.empty[(Long, Long, Double)].toDF("a_id", "b_id", "jaccard")
    assert(Dedup.dedupGroups(noDocs, noPairs).count() == 0)
    val noEvents = Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("event_id", "user_id", "ts", "value")
    assert(Sessionize.sessions(noEvents).count() == 0)
  }

  test("norm quantiles: ordered min <= p25 <= p50 <= p75 <= p99 <= max per label") {
    val e = Tables.embeddings(spark, dir)
    val rows = EmbeddingStats.normQuantiles(e).collect()
    assert(rows.map(_.getLong(1)).sum == e.count())
    rows.foreach { r =>
      val qs = (2 to 7).map(r.getDouble) // min, p25, p50, p75, p99, max
      assert(qs.sliding(2).forall(p => p.head <= p.last + 1e-9),
        s"quantiles out of order for label ${r.get(0)}: $qs")
    }
  }

  test("pricing summary: group counts add up to the filtered row count") {
    val res = Relational.pricingSummary(spark, dir).collect()
    val expected = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02"))).count()
    assert(res.map(_.getLong(9)).sum == expected)
  }

  test("ivfPqTopk: residual-seed query reconstructs exactly — ADC score 1.0 in its own cell") {
    // vec 16 is a RESIDUAL codebook seed: its residual (v16 − centroid of
    // its cell) is a codebook entry, so encode→decode round-trips it and
    // recon = centroid + residual ≈ v16 (exact to fp re-association; the
    // 6-dp score rounding absorbs the ulp), while its cell is the
    // top-probed cell for its own query
    val out = Ann.ivfPqTopk(spark, dir, 16L, 10).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) == 16L && out.head.getDouble(2) == 1.0)
    // two-layer containment: every ivfpq hit also lies in an ivf-probed cell
    val ivfIds = Ann.ivfTopk(spark, dir, 16L, 1000, 16, 4).collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).forall(ivfIds))
    // a CENTROID seed is no longer exactly reconstructible (its residual is
    // the zero vector, which is not a residual code) — the top hit for
    // query 0 still lands in a probed cell but below 1.0 says the encoding
    // really is residual-based
    val out0 = Ann.ivfPqTopk(spark, dir, 0L, 10).collect()
    assert(out0.nonEmpty && out0.head.getDouble(2) <= 1.0)
  }

  test("ivfPqRecall: residual encoding beats raw-vector codes in mean recall") {
    val r = Ann.ivfPqRecall(spark, dir, nQueries = 8, k = 10).collect()
    assert(r.length == 8)
    val (resid, raw) = (r.map(_.getDouble(3)).sum / 8, r.map(_.getDouble(4)).sum / 8)
    assert(resid >= raw, s"residual mean recall $resid < raw $raw")
    r.foreach(row => assert(row.getLong(1) <= 10 && row.getLong(2) <= 10))
  }

  test("pqTopkIndexed returns exactly pqTopk (same codes, decode, rerank)") {
    val inline = Ann.pqTopk(spark, dir, 0L, 10).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val indexed = Ann.pqTopkIndexed(spark, dir, 0L, 10).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(inline == indexed)
    assert(inline.head._1 == 0L && inline.head._3 == 1.0) // seed vec reconstructs exactly
  }

  test("repetition: looped text flagged, varied text clean, short text zero ratios") {
    import spark.implicits._
    val varied = (1 to 30).map(i => s"w$i").mkString(" ") // 29 distinct 2-grams
    val docs = Seq(
      (1L, ("spam ham " * 8).trim),  // one 2-gram dominates
      (2L, varied),
      (3L, "hello")                // no 2-grams at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    val (n1, dup1, top1, _, rep1) = out(1L)
    assert(n1 == 15 && dup1 > 0.8 && top1 > 0.5 && rep1)
    val (_, dup2, top2, _, rep2) = out(2L)
    assert(dup2 == 0.0 && top2 < 0.05 && !rep2)
    assert(out(3L) == ((0L, 0.0, 0.0, 0.0, false)))
  }

  test("bigram novelty: corpus-unique bigrams are rare, repeated boilerplate is not") {
    import spark.implicits._
    val boiler = "click here to subscribe now"   // shared by 3 docs => df 3
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),
      (4L, "zxq wvu tsr qpo"),                  // 3 bigrams, each df 1 => novelty 1.0
      (5L, "solo")                              // < 2 tokens => no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNovelty(docs, minDf = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // every document reported
    assert(out(1L) == ((4L, 0L, 0.0)))            // df=3 meets minDf: familiar
    assert(out(4L) == ((3L, 3L, 1.0)))            // df=1 everywhere: all rare
    assert(out(5L) == ((0L, 0L, 0.0)))            // vacuously familiar, not NULL
  }

  test("lm cross-entropy: add-one unigram bits, OOV mass, head-cut invariance") {
    import spark.implicits._
    val buckets = (0L until 50L).map(id => id ->
      Seq((id, "x")).toDF("id", "t").select(Sampling.hashBucket(col("id")))
        .collect().head.getLong(0)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 50 => id }.get
    val testId = buckets.collectFirst { case (id, b) if b >= 50 => id }.get
    val docs = Seq(
      (trainId, "aa aa bb"), // model: aa->2, bb->1; N=3, V=2, denom=6
      (testId, "aa cc"),     // aa: -log2(3/6)=1 bit; cc OOV: log2(6) bits
      (trainId + 100 * 50, "") // tokenless: restored with xent 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val log2_6 = math.log(6.0) / math.log(2.0)
    val log2_3 = math.log(3.0) / math.log(2.0)
    assert(out(testId)._1 == 2L)
    assert(math.abs(out(testId)._2 - (1.0 + log2_6) / 2) < 1e-6)
    assert(math.abs(out(trainId)._2 - (1.0 + 1.0 + log2_3) / 3) < 1e-6)
    assert(out(trainId + 100 * 50) == ((0L, 0.0)))
    // exactness must not depend on where the head-broadcast cut falls
    val small = TextAnalysis.lmCrossEntropy(docs, headSize = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(small == out)
  }

  test("winnow pairs: copied span detected, disjoint docs silent, boilerplate df-capped out") {
    import spark.implicits._
    val span = "the quick brown fox jumps over the lazy dog tonight"
    val boiler = "all rights reserved contact legal for permission terms"
    val docs = (Seq(
      (1L, s"0123456789 $span 9876543210"),      // copied span, different frame
      (2L, s"ABCDEFGHIJ $span JIHGFEDCBA"),
      (3L, "zzzzyyyyxxxxwwwwvvvvuuuuttttssss")   // shares nothing
    ) ++ (10L until 20L).map { i =>
        // disjoint-alphabet prefixes: the ONLY grams shared among these
        // docs come from the boilerplate span itself (fingerprint df is
        // selection-dependent, so near-identical prefixes can smuggle in
        // rare shared fingerprints)
        (i, s"${('a' + (i - 10)).toChar.toString * 12} $boiler")
      }).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the copied span guarantees shared fingerprints (winnowing coverage);
    // the boilerplate span sits in 10 docs > maxDf=8, so its fingerprints
    // are excluded and those docs produce NO pairs
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), pairs.mkString(","))
    assert(pairs.head._3 >= 2)
    // raising the cap re-admits the boilerplate family
    val loose = TextAnalysis.winnowPairs(docs, maxDf = 20).collect()
    assert(loose.length > 1)
  }

  test("topic balance: exhaustive accounting, identical texts co-cluster, deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Sampling.topicBalance(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._2).sum == docs.count())      // every doc lands somewhere
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    out.foreach { case (cell, _, share, mq) =>
      assert(cell >= 1 && cell <= 8 && share > 0.0 && mq >= 0.0 && mq <= 1.0)
    }
    assert(Sampling.topicBalance(docs).collect().toSeq ==
      Sampling.topicBalance(docs).collect().toSeq) // rerun-deterministic
    // identical text = identical hash embedding = same cell, always
    val twins = (0L until 40L).map(i => (i, if (i % 2 == 0) "alpha beta gamma delta"
                                            else "omega psi chi phi upsilon"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val cells = Sampling.topicBalance(twins, nCells = 4).collect()
    assert(cells.map(_.getLong(1)).sum == 40L)
    assert(cells.length <= 2, s"two distinct texts need at most two cells: ${cells.mkString(",")}")
  }

  test("doremi weights: normalized, hard sources gain over their token share, eta=0 is the baseline") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.doremiWeights(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(out.length > 1)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5) // normalized
    val total = out.map(_._2).sum.toDouble
    out.foreach { case (_, _, excess, w) => assert(excess >= 0.0 && w > 0.0) }
    // the actual multiplicative-weights guarantee: the uplift over the
    // token-share baseline is monotone in excess loss (normalization can
    // shrink everyone, but never reorder), and zero-excess sources can
    // only lose (Z >= 1)
    val uplifts = out.sortBy(_._3).map { case (_, ntok, excess, w) =>
      (excess, w / (ntok / total))
    }
    uplifts.sliding(2).foreach {
      case Array((e1, u1), (e2, u2)) =>
        if (e2 > e1) assert(u2 >= u1 - 1e-9, s"uplift not monotone: $uplifts")
      case _ => ()
    }
    uplifts.collect { case (0.0, u) => u }.foreach(u => assert(u <= 1.0 + 1e-9))
    // eta = 0 collapses to the pure token-share baseline
    val base = TextAnalysis.doremiWeights(docs, eta = 0.0).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(5))).toMap
    base.foreach { case (src, (ntok, w)) =>
      assert(math.abs(w - ntok / total) < 1e-5, src)
    }
  }

  test("retention cohorts: hand-computed matrix; week-0 retention is always 1.0") {
    import spark.implicits._
    def ts(week: Long, d: Int = 0) =
      new java.sql.Timestamp((week * 7 + d) * 86400L * 1000L)
    // users 1,2 start week 0 (1 returns week 1); user 3 starts week 1
    val ev = Seq(
      (1L, ts(0)), (1L, ts(0, 2)), (1L, ts(1)),
      (2L, ts(0, 3)),
      (3L, ts(1, 1)), (3L, ts(3))
    ).map { case (u, t) => (u, t, "click", 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Sessionize.retentionCohorts(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      (0L, 0L) -> (2L, 2L, 1.0),   // users 1,2 active in their week 0
      (0L, 1L) -> (1L, 2L, 0.5),   // only user 1 returns
      (1L, 0L) -> (1L, 1L, 1.0),   // user 3's cohort
      (1L, 2L) -> (1L, 1L, 1.0)))
    // structural invariant: every cohort's offset-0 cell retains 100%
    got.collect { case ((_, 0L), (_, _, r)) => r }.foreach(r => assert(r == 1.0))
  }

  test("degenerate-input contracts: empty corpus, tokenless docs, zero covariance") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // fertility: zeros, not an NPE; train: empty merge table
    val f = Bpe.fertility(empty).collect().head
    assert((f.getLong(0), f.getLong(1), f.getDouble(2)) == (0L, 0L, 0.0))
    assert(Bpe.train(empty).collect().isEmpty)
    // segmentCounts restores tokenless docs with a 0 budget
    val seg = Bpe.segmentCounts(
      Seq((1L, "low"), (2L, ""), (3L, "  ")).toDF("doc_id", "text"),
      Seq(("l", "o"), ("lo", "w"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seg == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
    // hll on a token-free corpus: (0, 0.0, 0.0) — no NaN
    val h = TextAnalysis.tokenHll(Seq((1L, " ")).toDF("doc_id", "text"))
      .collect().head
    assert((h.getLong(0), h.getDouble(1), h.getDouble(2)) == (0L, 0.0, 0.0))
    // identical embeddings: zero covariance at 6 dp -> ER reports 0.0
    val const = (1 to 50).map(i =>
      (i.toLong, Array.fill(64)(0.5).toSeq, 0)).toDF("vec_id", "embedding", "label")
    val s0 = EmbeddingStats.spectrum(const).collect().head
    assert(s0.getDouble(2) == 0.0 && !s0.getDouble(2).isNaN)
  }

  test("embed spectrum: matches the eigenvalue identity; rank-1 data scores ER ~ 1") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val s = EmbeddingStats.spectrum(e).collect().head
    val (trace, frob, er) = (s.getDouble(0), s.getDouble(1), s.getDouble(2))
    assert(er > 1.0 && er <= 64.0)
    // the identity the operator exploits: (sum λ)²/Σλ² over the ACTUAL
    // eigenvalues of the same covariance matrix — exercised through the
    // independent Jacobi solver
    val cov = EmbeddingStats.covariance(e).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    val mat = Array.tabulate(64, 64)((i, j) => cov((i, j)))
    val lambda = EmbeddingStats.jacobiEigen(mat, 64)._1
    val erEig = math.pow(lambda.sum, 2) / lambda.map(x => x * x).sum
    assert(math.abs(er - erEig) < 1e-3, s"op $er vs eigen $erEig")
    assert(math.abs(trace - lambda.sum) < 1e-3)
    assert(frob > 0.0)
    // all vectors on one line -> one nonzero eigenvalue -> ER ≈ 1
    val line = (1 to 200).map { i =>
      (i.toLong, Array.tabulate(64)(d => (d + 1.0) * (i % 7 + 1)).toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
    val er1 = EmbeddingStats.spectrum(line).collect().head.getDouble(2)
    assert(math.abs(er1 - 1.0) < 0.01, s"rank-1 ER $er1")
  }

  test("token hll: matches an independent recomputation; raw branch accurate at 10k distincts") {
    import spark.implicits._
    def hll(tokens: Seq[String], p: Int = 10): (Long, Double) = {
      val m = 1L << p
      val md = java.security.MessageDigest.getInstance("MD5")
      def h56(s: String): Long =
        BigInt(1, md.digest(s.getBytes("UTF-8")).take(7)).toLong
      val regs = Array.fill(m.toInt)(0L)
      tokens.distinct.foreach { w => // distinct irrelevant for max, clearer
        val h = h56(w); val b = (h % m).toInt; val r = h / m
        val rho = if (r > 0) 56 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(r))
                  else 56 - p + 1
        regs(b) = math.max(regs(b), rho)
      }
      val z = regs.map(x => math.pow(2.0, -x)).sum
      val v = regs.count(_ == 0)
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val e = alpha * m * m / z
      val est = if (e <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v) else e
      (tokens.distinct.size.toLong, est)
    }
    // small corpus -> linear-counting branch, recomputed exactly
    val small = Seq((1L, "aa bb cc dd aa"), (2L, "ee ff aa"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenHll(small).collect().head
    val (ex, est) = hll(Seq("aa", "bb", "cc", "dd", "ee", "ff"))
    assert(got.getLong(0) == ex)
    assert(math.abs(got.getDouble(1) - est) < 1e-6)
    assert(got.getDouble(2) ==
      BigDecimal((est - ex) / ex).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // 10k distincts over 1024 registers -> the raw-estimate branch; the
    // deterministic hash makes this a fixed number, bound it by theory
    val tokens = (0 until 10000).map(i => s"tok$i")
    val big = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
    val g2 = TextAnalysis.tokenHll(big).collect().head
    val (ex2, est2) = hll(tokens)
    assert(g2.getLong(0) == ex2 && math.abs(g2.getDouble(1) - est2) < 1e-4)
    assert(math.abs(g2.getDouble(2)) < 0.1, s"rel_err ${g2.getDouble(2)}")
  }

  test("bpe: hand-computed Sennrich merges, fertility, segment counts, early stop") {
    import spark.implicits._
    // the classic corpus: low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    // step 1: (e,s)=9 ties (s,t)=9 -> lhs asc; step 2: (es,t)=9;
    // step 3: (l,o)=7 ties (o,w)=7; step 4: (lo,w)=7
    val got = Bpe.train(docs, merges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "e", "s", "es", 9L), (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L), (4L, "lo", "w", "low", 7L)))
    // after 4 merges: low=[low], lower=[low,e,r], newest=[n,e,w,est],
    // widest=[w,i,d,est] -> 47 symbols over 16 word occurrences
    val f = Bpe.fertility(docs, merges = 4).collect().head
    assert((f.getLong(0), f.getLong(1), f.getDouble(2)) == (16L, 47L, 2.9375))
    // segmentation with the learned merges is the same arithmetic per doc
    val two = Seq((1L, "low lower"), (2L, "newest")).toDF("doc_id", "text")
    val seg = Bpe.segmentCounts(two, got.map(m => (m._2, m._3)).toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seg == Map(1L -> 4L, 2L -> 4L))
    // a fully-merged vocabulary stops early instead of emitting null steps
    val tiny = Bpe.train(Seq((1L, "ab ab")).toDF("doc_id", "text"), merges = 8)
      .collect()
    assert(tiny.length == 1 && tiny.head.getString(3) == "ab")
  }

  test("token cms: est >= exact always; wide sketch is exact; width-1 collapses to the total") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa aa bb"), (2L, "bb cc aa"), (3L, "dd"))
      .toDF("doc_id", "text") // counts: aa 4, bb 2, cc 1, dd 1; total 8
    val wide = TextAnalysis.tokenCms(docs, depth = 4, width = 4096, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(wide.map(t => t._1 -> t._2).toMap ==
      Map("aa" -> 4L, "bb" -> 2L, "cc" -> 1L, "dd" -> 1L))
    wide.foreach { case (w, exact, est, over) =>
      assert(est >= exact && over == est - exact, w) // the CMS guarantee
    }
    // 4 tokens in 4096 buckets x 4 rows: some row is collision-free
    wide.foreach { case (w, exact, est, _) => assert(est == exact, w) }
    // width 1: every row's single cell counts the whole stream
    val tiny = TextAnalysis.tokenCms(docs, depth = 2, width = 1, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tiny.values.toSet == Set(8L))
    // real corpus: the audit holds on actual Zipf mass
    val real = TextAnalysis.tokenCms(
      Tables.documents(spark, "/root/testdata/sf0.001"), k = 5).collect()
    assert(real.length == 5)
    real.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  test("page rank: matches a driver-side recomputation; dangling node leaks mass") {
    import spark.implicits._
    // 1→2, 1→3, 2→3, 3→1, 3→4; node 4 dangles (no out-edges): its mass
    // leaks, so the total settles below 1 — the documented variant
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    val got = Centrality.pageRank(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent recomputation with the same per-iteration 12-dp grid
    val odeg = Map(1L -> 2.0, 2L -> 1.0, 3L -> 2.0)
    val in = Map(1L -> Seq(3L), 2L -> Seq(1L), 3L -> Seq(1L, 2L), 4L -> Seq(3L))
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25)
    for (_ <- 1 to 5) r = r.map { case (v, _) =>
      v -> r12((1.0 - 0.85) / 4 + 0.85 * in(v).map(u => r(u) / odeg(u)).sum)
    }
    val want = r.map { case (v, x) =>
      v -> BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got == want)
    assert(got.values.sum < 1.0 - 1e-3) // leaked mass is visible
    assert(got(3L) > got(2L))           // two in-edges beat one
  }

  test("similarity page rank: deterministic, mass-conserving, non-degenerate on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Centrality.similarityPageRank(e, k = 4, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val b = Centrality.similarityPageRank(e, k = 4, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(a.sameElements(b)) // rerun-deterministic
    val n = e.count()
    assert(a.length == n)     // every node ranked
    // kNN graph has no dangling nodes: total mass conserved (to 6-dp grid)
    assert(math.abs(a.map(_._2).sum - 1.0) < n * 1e-6)
    assert(a.map(_._2).distinct.length > 1) // centrality actually varies
    a.foreach { case (_, s) => assert(s > 0.0 && s < 1.0) }
  }

  test("ann-edge page rank: edge recall vs exact kNN, rank agreement with the exact graph") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = e.count()
    // exact kNN edges: the similarityPageRank builder's semantics, rebuilt
    // independently with a driver-side scorer over the small corpus
    val rows = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exactEdges = rows.flatMap { case (src, v) =>
      rows.filter(_._1 != src)
        .map { case (dst, w) => (dst, r6(Ann.cosine(v, w))) }
        .sortBy { case (dst, s) => (-s, dst) }.take(5)
        .map { case (dst, _) => (src, dst) }
    }.toSet
    def edgeRecall(nProbe: Int): Double = {
      val annE = Centrality.annEdges(e, k = 5, nProbe = nProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every src emits exactly k edges (assignment is unique, self excluded)
      assert(annE.size == n * 5, s"nProbe=$nProbe edges=${annE.size}")
      annE.intersect(exactEdges).size.toDouble / exactEdges.size
    }
    assert(exactEdges.size == n * 5)
    // the ivfRecall dial, applied to edges: probing every cell IS the
    // exact builder (recall 1.0 by construction), and recall rises
    // monotonically toward it as nProbe grows
    val r4 = edgeRecall(4); val r8 = edgeRecall(8); val r16 = edgeRecall(16)
    assert(r16 == 1.0, s"full probe not exact: $r16")
    assert(r4 <= r8 && r8 <= r16, s"recall not monotone: $r4 $r8 $r16")
    assert(r4 >= 0.3, s"nProbe=4 edge recall degenerate: $r4")
    // rank agreement, strong form: with approximation off (full probe) the
    // ANN path must reproduce the exact path's ranks EXACTLY — same edges,
    // same 12-dp iteration grid, same 6-dp output
    val exactRanks = Centrality.similarityPageRank(e, k = 5, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fullProbe = Centrality.similarityPageRankAnn(e, k = 5, iters = 5, nProbe = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fullProbe == exactRanks)
    // partial probe: ~50 near-uniform synthetic vectors rank their head by
    // hair-thin margins, so top-set overlap is only a degeneracy check
    // here; the production dial is the recall curve above
    val topN = math.max((n / 10).toInt, 5)
    def topSet(m: Map[Long, Double]) = m.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(topN).map(_._1).toSet
    val annTop8 = topSet(Centrality.similarityPageRankAnn(e, k = 5, iters = 5, nProbe = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    val agree = annTop8.intersect(topSet(exactRanks)).size.toDouble / topN
    assert(agree >= 0.2, s"top-decile rank agreement at nProbe=8 degenerate: $agree")
  }

  test("two-level ann edges: full probe reproduces the exact graph; recall monotone in the probe dials") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = e.count()
    val rows = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exactEdges = rows.flatMap { case (src, v) =>
      rows.filter(_._1 != src)
        .map { case (dst, w) => (dst, r6(Ann.cosine(v, w))) }
        .sortBy { case (dst, s) => (-s, dst) }.take(5)
        .map { case (dst, _) => (src, dst) }
    }.toSet
    def edgeRecall(wCoarse: Int, nProbe: Int): Double = {
      val annE = Centrality.annEdges2(e, k = 5, nFine = 16, nCoarse = 4,
        wCoarse = wCoarse, nProbe = nProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(annE.size == n * 5, s"wCoarse=$wCoarse nProbe=$nProbe edges=${annE.size}")
      annE.intersect(exactEdges).size.toDouble / exactEdges.size
    }
    // opening everything IS the exact builder: every fine cell probed ⇒
    // candidate set is the corpus, same 6-dp ranking contract
    assert(edgeRecall(4, 16) == 1.0)
    // fixed wCoarse: larger nProbe opens a superset of fine cells; and the
    // full-open dial is an upper bound for both
    val r24 = edgeRecall(2, 4); val r28 = edgeRecall(2, 8)
    assert(r24 <= r28 && r28 <= 1.0, s"recall not monotone: $r24 $r28")
    assert(r24 >= 0.3, s"wCoarse=2 nProbe=4 edge recall degenerate: $r24")
    // rank agreement, strong form: approximation off ⇒ ranks EXACTLY equal
    // to the exact builder AND to the flat ANN builder at full probe
    val exactRanks = Centrality.similarityPageRank(e, k = 5, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full2 = Centrality.similarityPageRankAnn2(e, k = 5, iters = 5,
      nFine = 16, nCoarse = 4, wCoarse = 4, nProbe = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full2 == exactRanks)
  }

  test("two-level ivf topk: full probe equals the exact scan; indexed variant equals the scan-time variant") {
    val dir = "/root/testdata/sf0.001"
    val exact = Similarity.topKSingle(spark, dir, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2))).toSeq
    val full = Ann.ivfTopk2(spark, dir, 0L, 10, nFine = 16, nCoarse = 4,
      wCoarse = 4, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2))).toSeq
    assert(full == exact, "full two-level probe must reproduce the exact scan")
    val scan = Ann.ivfTopk2(spark, dir, 0L, 10, 16, 4, 2, 4).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2))).toSeq
    val indexed = Ann.ivfTopk2Indexed(spark, dir, 0L, 10, 16, 4, 2, 4).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2))).toSeq
    assert(indexed == scan, "persisted two-level layers must reproduce the scan-time probe")
  }

  test("ppl buckets: terciles match a direct recomputation from the operator's own xent") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.perplexityBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    // independent recomputation: thresholds = value at rank ceil(j*n/3) of
    // the 30%-sample xents per lang (xent itself is oracle-checked via
    // lm_score — here we pin the bucketing layer on top of it)
    def bucketOf(id: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = BigInt(1, md5.take(7)).toLong
      h % 100
    }
    val byLang = out.filter(r => bucketOf(r._1) < 30)
      .groupBy(_._2).map { case (lang, rs) =>
        val xs = rs.sortBy(r => (r._3, r._1)).map(_._3)
        val t1 = xs(math.ceil(xs.length / 3.0).toInt - 1)
        val t2 = xs(math.ceil(2.0 * xs.length / 3.0).toInt - 1)
        lang -> (t1, t2)
      }
    assert(out.nonEmpty && byLang.nonEmpty)
    out.foreach { case (id, lang, xent, bucket) =>
      val expected = byLang.get(lang) match {
        case None => "tail"
        case Some((t1, _)) if xent <= t1 => "head"
        case Some((_, t2)) if xent <= t2 => "middle"
        case _ => "tail"
      }
      assert(bucket == expected, s"doc $id lang $lang xent $xent")
    }
    // every language present in the sample has all three buckets populated
    byLang.keys.foreach { lang =>
      val bs = out.filter(_._2 == lang).map(_._4).toSet
      assert(bs == Set("head", "middle", "tail"), s"$lang -> $bs")
    }
  }

  test("dsir weights: hand-computed log-likelihood ratio, slice membership, empty-doc restore") {
    import spark.implicits._
    val buckets = (0L until 400L).map(id => id ->
      Seq((id, "x")).toDF("id", "t").select(Sampling.hashBucket(col("id")))
        .collect().head.getLong(0)).toMap
    val tgtId = buckets.collectFirst { case (id, b) if b < 20 => id }.get
    val rawId = buckets.collectFirst { case (id, b) if b >= 50 => id }.get
    val mids = buckets.collect { case (id, b) if b >= 20 && b < 50 => id }.toSeq.sorted
    val (midId, emptyId) = (mids.head, mids(1))
    val docs = Seq(
      (tgtId, "aa aa bb"),    // target model: aa->2, bb->1 (Nt=3)
      (rawId, "aa cc cc cc"), // raw model: aa->1, cc->3 (Nr=4)
      (midId, "aa bb"),       // scored only: in neither slice
      (emptyId, "")           // tokenless: restored with zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // add-one over the fixed 4096-feature space
    def lr(ct: Long, cr: Long) =
      log2((ct + 1.0) / (3 + 4096.0)) - log2((cr + 1.0) / (4 + 4096.0))
    val expMid = lr(2, 1) + lr(1, 0) // aa + bb
    assert(out(emptyId) == ((0L, 0.0, 0.0)))
    assert(out(midId)._1 == 2L)
    assert(math.abs(out(midId)._2 - expMid) < 1e-5)
    assert(math.abs(out(midId)._3 - expMid / 2) < 1e-5)
    // target-slice doc reads as target-like, raw-slice doc as raw-like
    val expTgt = lr(2, 1) * 2 + lr(1, 0)
    val expRaw = lr(2, 1) + lr(0, 3) * 3
    assert(math.abs(out(tgtId)._2 - expTgt) < 1e-5 && expTgt > 0)
    assert(math.abs(out(rawId)._2 - expRaw) < 1e-5 && expRaw < 0)
  }

  test("quality classifier: closed-form first step, separation after training, empty-doc bias score") {
    import spark.implicits._
    val buckets = (0L until 400L).map(id => id ->
      Seq((id, "x")).toDF("id", "t").select(Sampling.hashBucket(col("id")))
        .collect().head.getLong(0)).toMap
    val tgtId = buckets.collectFirst { case (id, b) if b < 20 => id }.get
    val rawId = buckets.collectFirst { case (id, b) if b >= 50 => id }.get
    val mids = buckets.collect { case (id, b) if b >= 20 && b < 50 => id }.toSeq.sorted
    // one target doc ("aa aa") vs one raw doc ("bb"): with w0 = 0 the first
    // step is closed-form: g(aa) = (0.5-1)/2, g(bb) = (0.5-0)/2, g(bias) = 0
    val docs = Seq(
      (tgtId, "aa aa"), (rawId, "bb"),
      (mids(0), "aa"),  // unlabeled probe: pure aa signal
      (mids(1), "bb"),  // unlabeled probe: pure bb signal
      (mids(2), "")     // tokenless: scored through the bias feature alone
    ).toDF("doc_id", "text")
    def sigma(s: Double) = 1.0 / (1.0 + math.exp(-s))
    val one = TextAnalysis.qualityClassifier(docs, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(math.abs(one(mids(0))._1 - sigma(0.25)) < 1e-6 && one(mids(0))._2)
    assert(math.abs(one(mids(1))._1 - sigma(-0.25)) < 1e-6 && !one(mids(1))._2)
    assert(one(mids(2))._1 == 0.5 && one(mids(2))._2) // bias weight stays 0
    // after the default 3 steps the separation only widens, scores stay in (0,1)
    val out = TextAnalysis.qualityClassifier(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(mids(0)) > one(mids(0))._1 && out(mids(1)) < one(mids(1))._1)
    out.values.foreach(s => assert(s > 0.0 && s < 1.0))
    assert(out(tgtId) > 0.5 && out(rawId) < 0.5)
  }

  test("bigram lm: interpolation, unseen-context backoff, position-0, head-cut invariance") {
    import spark.implicits._
    val buckets = (0L until 50L).map(id => id ->
      Seq((id, "x")).toDF("id", "t").select(Sampling.hashBucket(col("id")))
        .collect().head.getLong(0)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 50 => id }.get
    val testId = buckets.collectFirst { case (id, b) if b >= 50 => id }.get
    // model: uni aa->2 bb->2 (N=4, V=2, denom=7); big (aa,bb)->2 (bb,aa)->1;
    // ctx aa->2 bb->1
    val docs = Seq((trainId, "aa bb aa bb"), (testId, "aa bb cc"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropyBigram(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val lam = 0.7; val om = 1.0 - lam
    def pu(c: Long) = (c + 1.0) / 7.0
    // pos0 "aa": unigram only; (aa->bb): seen bigram; (bb->cc): seen
    // context, unseen bigram -> lambda*0 + (1-lambda)*P_uni(cc)
    val want = -(log2(pu(2)) + log2(lam * (2.0 / 2.0) + om * pu(2)) +
      log2(lam * 0.0 + om * pu(0))) / 3
    assert(out(testId)._1 == 3L)
    assert(math.abs(out(testId)._2 - want) < 1e-6, s"got ${out(testId)._2}, want $want")
    val small = TextAnalysis.lmCrossEntropyBigram(docs, headSize = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(small == out)
  }

  test("jacobi eigensolver: recovers analytic eigenpairs of a symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (v=[1,1]/√2) and 1 (v=[1,-1]/√2)
    val (vals, vecs) = EmbeddingStats.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = vals.zipWithIndex.sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-10 && math.abs(pairs(1)._1 - 1.0) < 1e-10)
    // A·v = λ·v for each recovered column
    for ((l, k) <- pairs) {
      val v = Array(vecs(0)(k), vecs(1)(k))
      assert(math.abs((2 * v(0) + v(1)) - l * v(0)) < 1e-10)
      assert(math.abs((v(0) + 2 * v(1)) - l * v(1)) < 1e-10)
    }
  }

  test("whiten: whitened embeddings have zero mean and identity covariance") {
    import org.apache.spark.sql.functions.{avg, posexplode}
    val e = Tables.embeddings(spark, dir)
    val w = EmbeddingStats.whiten(e).withColumnRenamed("whitened", "embedding")
    val cov = EmbeddingStats.covariance(w).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cov.foreach { case ((i, j), c) =>
      val want = if (i == j) 1.0 else 0.0
      // 6 dp projection rounding + eps regularization bound the residue
      assert(math.abs(c - want) < 1e-3, s"cov($i,$j) = $c, want $want")
    }
    // x' = W(x - mu): the common-direction removal a W-only projection
    // would miss shows up as a zero whitened mean
    val mus = w.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(avg(col("x")).as("m")).collect()
    assert(mus.length == 64)
    mus.foreach(r => assert(math.abs(r.getDouble(1)) < 1e-3,
      s"whitened mean dim ${r.getInt(0)} = ${r.getDouble(1)}"))
  }

  test("token drift: a split-exclusive token tops the report with the right rates") {
    import spark.implicits._
    val buckets = (0L until 50L).map(id => id ->
      Seq((id, "x")).toDF("id", "t").select(Sampling.hashBucket(col("id")))
        .collect().head.getLong(0)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 80 => id }.get
    val testId = buckets.collectFirst { case (id, b) if b >= 80 => id }.get
    val docs = Seq(
      (trainId, "shared shared trainonly"),
      (testId, "shared testonly")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenDrift(docs, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(out("trainonly") == ((1L, 0L, 1.0 / 3)) ||
      math.abs(out("trainonly")._3 - 1.0 / 3) < 1e-6)
    assert(out("testonly")._1 == 0L && out("testonly")._2 == 1L)
    // 'shared': 2/3 in train vs 1/2 in test -> diff 1/6
    assert(math.abs(out("shared")._3 - 1.0 / 6) < 1e-6)
  }

  test("token counts: char length consistent, counts positive on real docs") {
    val docs = Tables.documents(spark, dir)
    val tc = TextAnalysis.tokenCounts(docs).collect()
    assert(tc.length == docs.count())
    val lens = docs.select(col("doc_id"), length(col("text")).cast("bigint")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    tc.foreach { r =>
      assert(r.getLong(3) == lens(r.getLong(0)))
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("langId: marker majority wins, alphabetical tie-break, und/empty edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "de", "der Hund und die Katze ist nicht hier"), // 5 de hits
      (2L, "en", "the cat and the dog is in a house"),     // 6 en hits (occurrences)
      (3L, "fr", "le chat et le chien dans une maison"),   // 5 fr hits
      (4L, "en", "zzz qqq xxx"),                           // no markers -> und
      (5L, "zh", "的 是 猫 在 了"),                          // 4 zh hits
      (6L, "es", ""),                                      // empty -> und, score 0
      (7L, "en", "und the")                                // 1 de vs 1 en tie -> de (alphabetical)
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out(1L) == (("de", 5L, 8L, 0.625, true)))
    assert(out(2L) == (("en", 6L, 9L, 0.666667, true)))
    assert(out(3L) == (("fr", 5L, 8L, 0.625, true)))
    assert(out(4L) == (("und", 0L, 3L, 0.0, false)))
    assert(out(5L) == (("zh", 4L, 5L, 0.8, true)))
    assert(out(6L) == (("und", 0L, 0L, 0.0, false)))
    assert(out(7L) == (("de", 1L, 2L, 0.5, false)))
  }

  test("round-10 operators: empty/degenerate corpus edges never throw or mis-shape") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // trimSpans: empty corpus -> empty frame; tokenless doc passes through
    assert(Dedup.trimSpans(empty).collect().isEmpty)
    val spacey = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val ts = Dedup.trimSpans(spacey).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(ts(1L) == (("", 0L)) && ts(3L) == (("one two", 0L)))
    assert(ts(2L)._2 == 0L) // short doc untouched
    // tokenShards: tokenless docs contribute 0 but keep their row
    val sh = Sampling.tokenShards(spacey, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sh.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(sh.forall(_._3 == 0L)) // all before-sums under one budget
    assert(Sampling.tokenShards(empty, 10L).collect().isEmpty)
    // minhashNearApprox: corpus below the shingle size -> no pairs, no throw
    assert(Dedup.minhashNearApprox(spacey).collect().isEmpty)
    // gopherRules on whitespace-only text: zero words, all-false verdicts
    val gr = TextAnalysis.gopherRules(spacey).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(8))).toMap
    assert(gr(1L) == ((0L, false)) && gr(2L) == ((0L, false)))
    // mixtureDraw on a single-source corpus: every doc draws >= 1
    val single = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
    val md = Sampling.mixtureDraw(single, budgetTokens = 6L).collect()
    assert(md.length == 2 && md.forall(_.getLong(2) >= 1L))
  }

  test("bitext minePairs: translated twins mine as mutual best; full probe ≡ driver brute-force margins") {
    // deterministic "multilingual" corpus: 24 distinct unit-ish directions;
    // tgt i+1 is src i's near-identical "translation" (tiny perturbation
    // that cannot reorder 6-dp margins against unrelated directions)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val srcs = (0 until 24).map(i =>
      (2L * i, Array.fill(dim)(rnd.nextGaussian()).toSeq))
    val tgts = srcs.map { case (id, v) =>
      (id + 1L, v.map(_ * 1.000001)) } // same direction: cos = 1 exactly at 6 dp
    val x = srcs.toDF("src_id", "src_vec")
    val y = tgts.toDF("tgt_id", "tgt_vec")
    val mined = Bitext.minePairs(x, y, k = 4, tau = 1.0, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every src finds exactly its twin, margins > 1 (cos 1.0 vs a
    // neighborhood mean strictly below 1 on distinct random directions)
    assert(mined.map(p => (p._1, p._2)).toSet ==
      srcs.map(_._1).map(i => (i, i + 1L)).toSet, s"mined: ${mined.toSeq}")
    assert(mined.forall(_._3 > 1.0))

    // driver brute-force of the full definition (integer micro-cosines,
    // actual-count means, mutual argmax) must reproduce the operator
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (p, q) => p * q }.sum
      val na = math.sqrt(a.map(p => p * p).sum); val nb = math.sqrt(b.map(p => p * p).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val c6 = (for ((si, sv) <- srcs; (ti, tv) <- tgts)
      yield ((si, ti), math.round(cos(sv, tv) * 1e6))).toMap
    def fwdSum(si: Long): (Long, Long) = {
      val top = tgts.map(_._1).sortBy(ti => (-c6((si, ti)), ti)).take(4)
      (top.map(ti => c6((si, ti))).sum, top.length.toLong)
    }
    def bwdSum(ti: Long): (Long, Long) = {
      val top = srcs.map(_._1).sortBy(si => (-c6((si, ti)), si)).take(4)
      (top.map(si => c6((si, ti))).sum, top.length.toLong)
    }
    val margins = for ((si, _) <- srcs; (ti, _) <- tgts) yield {
      val (sx, kx) = fwdSum(si)
      val (sy, ky) = bwdSum(ti)
      val den = sx * ky + sy * kx
      ((si, ti), if (den > 0) BigDecimal(2.0 * c6((si, ti)) * kx * ky / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else Double.NaN)
    }
    val mm = margins.filterNot(_._2.isNaN).toMap
    val bestPerSrc = mm.groupBy(_._1._1).map { case (s, g) =>
      s -> g.toSeq.sortBy(t => (-t._2, t._1._2)).head._1._2 }
    val bestPerTgt = mm.groupBy(_._1._2).map { case (t, g) =>
      t -> g.toSeq.sortBy(s => (-s._2, s._1._1)).head._1._1 }
    val brute = mm.keys.toSeq
      .filter { case (s, t) => bestPerSrc(s) == t && bestPerTgt(t) == s && mm((s, t)) >= 1.0 }
      .map { case (s, t) => (s, t, mm((s, t))) }.toSet
    assert(mined.toSet == brute, s"operator ${mined.toSeq} vs brute $brute")

    // the two-level generator at FULL-OPEN settings must reproduce the
    // flat answer exactly through a different candidate plan
    val mined2 = Bitext.minePairs2(x, y, k = 4, tau = 1.0,
        nFine = 6, nCoarse = 2, wCoarse = 2, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mined2 == mined.toSet, s"two-level $mined2 vs flat ${mined.toSet}")
  }
}
