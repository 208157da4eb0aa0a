package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Corpus-health fits and the classifier calibration audit on inputs with
  * KNOWN structure — the driver oracle pins cross-engine parity on the
  * synthetic corpus; these pin the math itself.
  */
class CorpusHealthSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("zipfFit recovers the exponent of an exactly Zipfian spectrum") {
    // token w_r appears round(1000 / r^0.8) times, r = 1..30: OLS on the
    // ln-ln points must land near -0.8 with near-perfect R^2 (rounding of
    // the counts perturbs it slightly).
    val rows = (1 to 30).flatMap { r =>
      val c = math.round(1000.0 / math.pow(r, 0.8)).toInt
      Seq.fill(c)(s"tok$r")
    }
    // one doc per token occurrence — doc structure is irrelevant to the fit
    val df = docs(rows.zipWithIndex.map { case (w, i) => (i.toLong, w) })
    val fit = TextAnalysis.zipfFit(df, k = 30).collect().head
    assert(fit.getLong(0) == 30L)
    assert(math.abs(fit.getDouble(1) - (-0.8)) < 0.01, s"slope ${fit.getDouble(1)}")
    assert(fit.getDouble(3) > 0.999, s"r2 ${fit.getDouble(3)}")
  }

  test("heapsFit recovers beta=1 growth and guards the flat-vocab corpus") {
    // Every doc contributes the same token count and all-new vocabulary:
    // V(n) = n exactly, so beta = 1 and R^2 = 1.
    val grow = docs((0L until 64L).map(i =>
      (i, (0 until 5).map(j => s"w${i}_$j").mkString(" "))))
    val f1 = TextAnalysis.heapsFit(grow, groups = 8).collect().head
    assert(math.abs(f1.getDouble(1) - 1.0) < 1e-6, s"beta ${f1.getDouble(1)}")
    assert(math.abs(f1.getDouble(3) - 1.0) < 1e-6, s"r2 ${f1.getDouble(3)}")

    // Degenerate corpus: one token everywhere — V is constant, the
    // zero-variance guard must yield r2 = 0 instead of NaN.
    val flat = docs((0L until 32L).map(i => (i, "same same same")))
    val f2 = TextAnalysis.heapsFit(flat, groups = 8).collect().head
    assert(f2.getDouble(1) == 0.0 && f2.getDouble(3) == 0.0, f2.toString)
  }

  test("classifierAuc equals the brute-force pairwise Mann-Whitney statistic") {
    import org.apache.spark.sql.functions.col
    val df = docs((0L until 300L).map(i =>
      (i, if (i % 2 == 0) "alpha beta gamma delta" else "epsilon zeta eta theta")))
    val Array(row) = TextAnalysis.classifierAuc(df).collect()
    val (nPos, nNeg, auc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    // brute force over (pos, neg) score pairs: win 1, tie 0.5
    val scored = TextAnalysis.qualityClassifier(df)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bucket = df.select(col("doc_id"),
        Sampling.hashBucket(col("doc_id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pos = bucket.collect { case (id, b) if b < 20 => scored(id) }.toSeq
    val neg = bucket.collect { case (id, b) if b >= 50 => scored(id) }.toSeq
    assert(nPos == pos.size && nNeg == neg.size)
    val u = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = BigDecimal(u / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(auc - expected) < 2e-6, s"auc $auc vs brute $expected")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("calibrationAudit: bins partition the labeled docs and ECE is the weighted gap") {
    val df = docs((0L until 400L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma" else "delta epsilon zeta")))
    val out = TextAnalysis.calibrationAudit(df).collect()
    assert(out.nonEmpty)
    val n = out.map(_.getLong(1)).sum
    // every labeled doc (hash bucket < 20 or >= 50) lands in exactly one bin
    val labeled = df.where(
      graft.operators.Sampling.hashBucket(org.apache.spark.sql.functions.col("doc_id")) < 20 ||
      graft.operators.Sampling.hashBucket(org.apache.spark.sql.functions.col("doc_id")) >= 50)
      .count()
    assert(n == labeled, s"binned $n vs labeled $labeled")
    // ECE equals sum(n_i * gap_i) / sum(n_i) over the reported rows, and is
    // replicated identically on every row
    val ece = out.map(r => r.getLong(1) * r.getDouble(4)).sum / n
    out.foreach(r => assert(math.abs(r.getDouble(5) - ece) < 5e-7, r.toString))
    // bins are within range and confidences sit inside their bin edges
    out.foreach { r =>
      val bin = r.getLong(0); val conf = r.getDouble(2)
      assert(bin >= 0 && bin < 10)
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9, r.toString)
    }
  }

  test("gopherRules: rule verdicts on constructed edge documents") {
    val good = "the quick brown fox jumps over the lazy dog and then trots away to rest " +
      "under a shady tree while birds sing softly in the warm afternoon air today"
    val rows = Seq(
      1L -> good,                                     // passes every rule
      2L -> ("- the bulleted doc " + good),           // bullet opener
      3L -> (good + " trailing off..."),              // ellipsis closer
      4L -> ("# ## ### " * 10 + good),                // symbol flood
      5L -> "too short to pass",                      // word count
      6L -> "")                                       // empty
    val out = TextAnalysis.gopherRules(docs(rows.map(r => (r._1, r._2))))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))).toMap
    assert(out(1L)._8, s"good doc failed: ${out(1L)}")
    assert(out(2L)._6 && !out(2L)._8)                  // bullet_start, fails
    assert(out(3L)._7 && !out(3L)._8)                  // ellipsis_end, fails
    assert(out(4L)._3 > 0.1 && !out(4L)._8)            // symbol_ratio kills it
    assert(out(5L)._1 < 20 && !out(5L)._8)
    assert(out(6L) == ((0L, 0.0, 0.0, 0.0, 0L, false, false, false)))
    // mean word length is the exact character average
    val t = good.split(" ")
    assert(math.abs(out(1L)._2 - t.map(_.length).sum.toDouble / t.length) < 1e-6)
  }

  test("qualityCalibrated: each language drops ~q of itself; a global threshold would erase the low-scoring language") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two synthetic languages with disjoint score regimes: 'hi' docs are
    // stop-word-rich long prose (high quality score), 'lo' docs are short
    // and stop-word-free (the scoring heuristic is biased against them)
    // within-language spread: per-doc punctuation (hi) / length (lo) vary
    // the 6-dp score so each language has a real distribution to cut
    val hi = (0L until 50L).map(i =>
      (i, ("the of and is a to " * 20) + ("." * (i % 10).toInt) + "word" + i, "hi", "s"))
    val lo = (100L until 150L).map(i =>
      (i, (3 to (3 + (i % 7).toInt)).map(j => s"zz$i$j").mkString(" "), "lo", "s"))
    val docs = (hi ++ lo).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.qualityCalibrated(docs, q = 0.2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.length == 100)
    // every language keeps roughly (1-q) of itself — the calibration claim
    for (lang <- Seq("hi", "lo")) {
      val ofLang = out.filter(_._2 == lang)
      val dropped = ofLang.count(!_._5)
      // >= floor(q*n) may over-drop only through grid ties at the cutoff
      assert(dropped >= 1 && dropped <= ofLang.length / 2,
        s"$lang dropped $dropped of ${ofLang.length}")
      // cutoff is the discrete q-quantile: #(quality < cutoff) < ceil(q*n)
      // <= #(quality <= cutoff), recomputed driver-side
      val qs = ofLang.map(_._3).sorted
      val need = math.ceil(ofLang.length * 0.2).toInt
      val cutoff = ofLang.head._4
      assert(qs.count(_ < cutoff) < need && qs.count(_ <= cutoff) >= need, s"$lang cutoff $cutoff")
    }
    // the motivating failure: a global threshold at the hi-language's
    // cutoff erases the lo language entirely; calibration keeps most of it
    val hiCut = out.find(_._2 == "hi").get._4
    assert(out.filter(_._2 == "lo").forall(_._3 < hiCut),
      "fixture must put every lo doc under the hi cutoff")
    assert(out.count(r => r._2 == "lo" && r._5) > 25)
    // scale guard: the corpus window is keyed by (lang, grid value) — the
    // only per-language ordered pass runs over histogram rows, and the
    // cutoff table comes back as a broadcast
    val p = TextAnalysis.qualityCalibrated(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"cutoffs not broadcast:\n$p")
  }
}
