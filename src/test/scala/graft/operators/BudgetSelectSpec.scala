package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.core.Tables

/** The token-budget selection contracts: exact histogram mergeability
  * (the property the incremental/indexed rungs rest on), the two-level
  * boundary prefix ≡ the naive single-window rule, region semantics,
  * the auto rung's budget arithmetic, and indexed ≡ inline. */
class BudgetSelectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.toVector).toSeq

  test("scoreHistogram merge is EXACT: merge(hist(A), hist(B)) == hist(A ∪ B) for any split; associative") {
    val docs = Tables.documents(spark, dir)
    val whole = rows(BudgetSelect.scoreHistogram(docs))
    val b = Sampling.hashBucket(col("doc_id"))
    Seq(
      (docs.where(b < 50), docs.where(b >= 50)),
      (docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1)),
      (docs.where(col("doc_id") < 37), docs.where(col("doc_id") >= 37))
    ).foreach { case (a, bb) =>
      assert(rows(BudgetSelect.mergeHistograms(
        BudgetSelect.scoreHistogram(a), BudgetSelect.scoreHistogram(bb))) == whole)
    }
    val (p1, p2, p3) = (docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1), docs.where(col("doc_id") % 3 === 2))
    assert(rows(BudgetSelect.mergeHistograms(
      BudgetSelect.mergeHistograms(
        BudgetSelect.scoreHistogram(p1), BudgetSelect.scoreHistogram(p2)),
      BudgetSelect.scoreHistogram(p3))) == whole)
  }

  test("selectByBudget ≡ the naive (micro DESC, doc_id) running-prefix rule at every regime") {
    val docs = Tables.documents(spark, dir)
    // engine-independent reference: one global window over the scored
    // frame — the semantics the two-level implementation must equal
    val sc = BudgetSelect.scored(docs)
    val w = Window.orderBy(col("micro").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = sc.withColumn("run", sum(col("n_tokens")).over(w))
    val total = sc.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    // budgets spanning: nothing, a sliver, mid-corpus, off-grid odd
    // value, nearly all, everything, beyond
    for (budget <- Seq(0L, 17L, total / 10, total / 3 + 7L, total - 1L,
        total, total + 1000L)) {
      val expect = naive.where(col("run") <= budget)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val got = BudgetSelect.selectByBudget(docs, budget)
        .where(col("kept")).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"kept set drifted at budget=$budget")
    }
  }

  test("regions: above keeps wholesale, below drops wholesale, boundary is a (micro DESC, doc_id) prefix") {
    val docs = Tables.documents(spark, dir)
    val total = BudgetSelect.scored(docs).agg(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    val d = BudgetSelect.selectByBudget(docs, total / 3).persist()
    try {
      assert(d.where(col("region") === "above" && !col("kept")).count() == 0)
      assert(d.where(col("region") === "below" && col("kept")).count() == 0)
      // exactly one boundary bin, strictly between above's min and below's max
      val bBins = d.where(col("region") === "boundary")
        .select(col("bin")).distinct().collect().map(_.getLong(0))
      assert(bBins.length == 1)
      d.where(col("region") === "above").agg(min(col("bin"))).collect()
        .headOption.filterNot(_.isNullAt(0)).foreach(r => assert(r.getLong(0) > bBins(0)))
      // the kept boundary docs are a PREFIX in (micro desc, doc_id) order:
      // no kept doc may rank after a dropped one
      val bd = d.where(col("region") === "boundary")
        .join(BudgetSelect.scored(docs).select(col("doc_id"), col("micro")), Seq("doc_id"))
        .select(col("micro"), col("doc_id"), col("kept"))
        .collect().sortBy(r => (-r.getLong(0), r.getLong(1))).map(_.getBoolean(2))
      assert(!bd.dropWhile(identity).contains(true),
        "boundary keeps must form a contiguous prefix")
      // budget respected exactly: kept tokens ≤ budget, and adding the
      // first dropped boundary doc would overflow
      val keptTok = d.where(col("kept")).agg(sum(col("n_tokens")))
        .collect()(0).getLong(0)
      assert(keptTok <= total / 3)
      val firstDropped = d.where(col("region") === "boundary" && !col("kept"))
        .join(BudgetSelect.scored(docs).select(col("doc_id"), col("micro")), Seq("doc_id"))
        .collect().sortBy(r => (-r.getAs[Long]("micro"), r.getAs[Long]("doc_id")))
        .headOption
      firstDropped.foreach { r =>
        assert(keptTok + r.getAs[Long]("n_tokens") > total / 3,
          "the first dropped boundary doc must genuinely overflow the budget")
      }
    } finally d.unpersist(false)
  }

  test("selectTopPct: 100 keeps all, 0 keeps none, pct budget = total·pct÷100 in Long arithmetic") {
    val docs = Tables.documents(spark, dir)
    val all = BudgetSelect.selectTopPct(docs, 100)
    assert(all.where(!col("kept")).count() == 0, "pct=100 keeps the corpus")
    assert(BudgetSelect.selectTopPct(docs, 0).where(col("kept")).count() == 0)
    val total = BudgetSelect.scored(docs).agg(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    assert(rows(BudgetSelect.selectTopPct(docs, 40)) ==
      rows(BudgetSelect.selectByBudget(docs, total * 40L / 100L)),
      "the auto rung is exactly the absolute rung at the derived budget")
  }

  test("selectByBudgetFromHistogram with own histogram ≡ selectByBudget (batch identity)") {
    val docs = Tables.documents(spark, dir)
    val total = BudgetSelect.scored(docs).agg(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    assert(rows(BudgetSelect.selectByBudgetFromHistogram(docs,
        BudgetSelect.scoreHistogram(docs), total / 3)) ==
      rows(BudgetSelect.selectByBudget(docs, total / 3)))
  }

  test("selectIncremental ≡ the batch frame's above region when state holds the rest of the corpus") {
    val docs = Tables.documents(spark, dir)
    val total = BudgetSelect.scored(docs).agg(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    val budget = total / 3
    val b = Sampling.hashBucket(col("doc_id"))
    val (rest, incoming) = (docs.where(b < 80), docs.where(b >= 80))
    val inc = BudgetSelect.selectIncremental(incoming,
        BudgetSelect.scoreHistogram(rest), budget)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val batch = BudgetSelect.selectByBudget(docs, budget)
      .join(incoming.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .collect().map(r => r.getLong(0) -> (r.getString(4) == "above")).toMap
    assert(inc == batch,
      "incremental admission must equal the batch rule's above region " +
        "(the declared bin-granular semantics)")
  }

  test("budgetAudit: per-region totals reconcile with the decision frame; fill ratio honest") {
    val docs = Tables.documents(spark, dir)
    val total = BudgetSelect.scored(docs).agg(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    val budget = total / 3
    val a = BudgetSelect.budgetAudit(docs, budget).collect()
      .map(r => r.getString(0) -> r).toMap
    val d = BudgetSelect.selectByBudget(docs, budget).persist()
    try {
      for ((region, row) <- a) {
        assert(row.getAs[Long]("n_docs") ==
          d.where(col("region") === region).count())
        assert(row.getAs[Long]("kept_tokens") ==
          d.where(col("region") === region && col("kept"))
            .agg(coalesce(sum(col("n_tokens")), lit(0L))).collect()(0).getLong(0))
      }
      val achieved = a.values.head.getAs[Long]("achieved_tokens")
      assert(achieved == d.where(col("kept")).agg(sum(col("n_tokens")))
        .collect()(0).getLong(0))
      assert(achieved <= budget)
      assert(a.values.head.getAs[Double]("fill_ratio") ==
        BigDecimal(achieved.toDouble / budget.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally d.unpersist(false)
  }

  test("selectByBudgetIndexed ≡ inline; FailIfMissing honored; histogram index is bins-sized") {
    val docs = Tables.documents(spark, dir)
    val total = BudgetSelect.scored(docs).agg(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    val reg = CatalogOps.indexRegistry(spark, dir)
    val name = BudgetSelect.scoreHistogramIndexName
    if (reg.isIndexRegistered(name)) reg.dropIndex(name)
    intercept[graft.core.GraftException] {
      BudgetSelect.selectByBudgetIndexed(spark, dir, total / 3,
        policy = graft.core.IndexPolicy.FailIfMissing).collect()
    }
    val inline = rows(BudgetSelect.selectByBudget(docs, total / 3))
    assert(rows(BudgetSelect.selectByBudgetIndexed(spark, dir, total / 3)) == inline)
    val built = CatalogOps.indexRegistry(spark, dir).getIndex(name)
    assert(rows(BudgetSelect.selectByBudgetIndexed(spark, dir, total / 3,
      policy = graft.core.IndexPolicy.FailIfMissing)) == inline)
    // the stored evidence is occupied-bins rows — ≤1001 a priori
    val n = spark.read.parquet(s"${built.path}/hist").count()
    assert(n <= 1001L && n > 0L)
    // re-budgeting against the same stored histogram stays consistent
    assert(rows(BudgetSelect.selectByBudgetIndexed(spark, dir, total / 10,
        policy = graft.core.IndexPolicy.FailIfMissing)) ==
      rows(BudgetSelect.selectByBudget(docs, total / 10)))
  }

  test("edge regimes: budget 0, budget ≥ corpus, empty corpus, single doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox of the many and the few", "en", "s1"),
      (2L, "word " * 30 + "the of and", "en", "s1"),
      (3L, "x", "en", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    assert(BudgetSelect.selectByBudget(docs, 0L).where(col("kept")).count() == 0)
    val d = BudgetSelect.selectByBudget(docs, 1000000L)
    assert(d.where(!col("kept")).count() == 0)
    assert(d.where(col("region") =!= "above").count() == 0,
      "budget beyond the corpus: everything lands above (t = -1)")
    val empty = docs.where(col("doc_id") < 0)
    assert(BudgetSelect.selectByBudget(empty, 100L).count() == 0)
    assert(BudgetSelect.scoreHistogram(empty).count() == 0)
    val one = docs.where(col("doc_id") === 2L)
    val dOne = BudgetSelect.selectByBudget(one, 5L)
    assert(dOne.count() == 1 && dOne.where(col("kept")).count() == 0,
      "a single doc over the budget is a boundary drop")
  }
}
