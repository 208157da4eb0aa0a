package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SOURCE-level curation — the host-level discipline of the published
  * web-corpus pipelines (C4's blocklist, Gopher's per-domain rules,
  * RefinedWeb/FineWeb's host-level quality priors): judge the SOURCE on
  * accumulated evidence, then keep or block its documents wholesale. The
  * per-document gates ([[CorpusFilter.decisions]]) answer "is this doc
  * good"; this family answers the question that comes FIRST at crawl
  * scale — "is this host worth reading at all".
  *
  * Why it is a first-class 100 TB component and not a groupBy footnote:
  * (1) SCAN AVOIDANCE — a blocked source prunes its documents before any
  * text-level operator runs; with source-partitioned or source-bucketed
  * storage the prune is partition-level, so the 100 TB pipeline never
  * reads the bytes it was going to reject. (2) MERGEABILITY — every
  * statistic here is a sum of a per-document quantity (per-doc gates
  * only, no cross-doc arm), so `stats(A ∪ B) = mergeSourceStats(stats(A),
  * stats(B))` holds EXACTLY, which is what makes the incremental /
  * indexed / streaming rungs byte-honest rather than approximate: a new
  * crawl snapshot updates per-source evidence without re-reading history.
  * Exact-duplicate share is deliberately NOT in the mergeable stats — a
  * duplicate is a cross-document fact (dups straddling two snapshots
  * break sum-merging); corpus-measured dup shares live in
  * [[CorpusFilter.report]] and the cross-snapshot dup GATE is
  * [[Dedup.exactIncrementalIndexed]].
  *
  * Scale shape: one audit-join of the narrow per-doc gate columns on
  * doc_id (the [[CorpusFilter.decisions]] shape), one aggregation keyed
  * by source (partial aggregation map-side — the shuffle carries
  * sources × partitions rows, not documents), and verdict joins whose
  * source side is sources-sized (broadcast by construction).
  */
object SourceCurate {

  private val StatCols = Seq("n_docs", "n_tokens", "q_micro_sum",
    "n_low_quality", "n_repetitive", "n_pii")

  /** Mergeable per-source sufficient statistics — one row per source:
    * `n_docs`, `n_tokens`, `q_micro_sum` (sum of 6-dp-rounded quality in
    * integer micro-units — order-free across partitionings and engines,
    * the [[CorpusFilter.report]] discipline), `n_low_quality` (docs with
    * quality < `minQuality`), `n_repetitive`, `n_pii`. Every column is a
    * sum of a per-document quantity, so two stats tables over disjoint
    * corpora merge EXACTLY ([[mergeSourceStats]]). */
  def sourceStats(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    // pinned repartition — the positionalShingles small-single-split
    // discipline: a streaming micro-batch (or a single-file scan) arrives
    // as ONE partition, and the per-doc gates below are the cost center;
    // without the spread they run single-threaded (measured 90 s vs ~6 s
    // per 50k-doc batch at 32 cores). The three gate arms derive from the
    // SAME repartitioned child, so the exchange is reused, not tripled.
    val d = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val q = TextAnalysis.quality(d)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val r = TextAnalysis.repetition(d)
      .select(col("doc_id"), col("repetitive"))
    val p = Pii.scan(d).select(col("doc_id"), col("has_pii"))
    d.select(col("doc_id"), col("source"))
      .join(q, Seq("doc_id")).join(r, Seq("doc_id")).join(p, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        sum(round(col("quality") * lit(1000000.0)).cast("bigint"))
          .as("q_micro_sum"),
        sum(when(col("quality") < minQuality, 1L).otherwise(0L))
          .as("n_low_quality"),
        sum(when(col("repetitive"), 1L).otherwise(0L)).as("n_repetitive"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii"))
      .orderBy(col("source"))
  }

  /** Exact merge of two [[sourceStats]] tables over DISJOINT document
    * sets: per-source column sums. `merge(stats(A), stats(B)) =
    * stats(A ∪ B)` — the property every incremental rung here rests on
    * (SourceCurateSpec pins it; the `source_stats_merged` oracle proves
    * it against an engine-independent ground truth). */
  def mergeSourceStats(a: DataFrame, b: DataFrame): DataFrame = {
    val aggs = StatCols.map(c => sum(col(c)).cast("bigint").as(c))
    a.unionByName(b).groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("source"))
  }

  /** The per-source verdict over a stats table — the host gate: derived
    * shares (`avg_quality` from micro-units, `low_quality_share`,
    * `repetitive_share`, `pii_share`, 6 dp) and threshold verdicts.
    * `measured` = `n_docs ≥ minDocs`: a source below the evidence floor
    * is NOT judged (`keep = true`) — the declared cold-start rule; the
    * alternative (block the unmeasured) would quarantine every new host
    * on its first document, and the published pipelines do the opposite
    * (hosts are innocent until measured, then pruned wholesale).
    * `keep = ¬measured ∨ (quality_ok ∧ repetition_ok ∧ pii_ok)`. */
  def sourceGateFromStats(stats: DataFrame,
                          minAvgQuality: Double = 0.2,
                          maxRepetitiveShare: Double = 0.5,
                          maxPiiShare: Double = 0.5,
                          minDocs: Long = 5L): DataFrame =
    stats.select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("q_micro_sum").cast("double") / lit(1000000.0)
          / col("n_docs"), 6).as("avg_quality"),
        round(col("n_low_quality").cast("double") / col("n_docs"), 6)
          .as("low_quality_share"),
        round(col("n_repetitive").cast("double") / col("n_docs"), 6)
          .as("repetitive_share"),
        round(col("n_pii").cast("double") / col("n_docs"), 6).as("pii_share"))
      .withColumn("quality_ok", col("avg_quality") >= minAvgQuality)
      .withColumn("repetition_ok", col("repetitive_share") <= maxRepetitiveShare)
      .withColumn("pii_ok", col("pii_share") <= maxPiiShare)
      .withColumn("measured", col("n_docs") >= minDocs)
      .withColumn("keep", !col("measured") ||
        (col("quality_ok") && col("repetition_ok") && col("pii_ok")))
      .orderBy(col("source"))

  /** The DATA-DRIVEN host gate — the family's auto rung: block the
    * bottom `blockBottomPct`% of MEASURED sources by `avg_quality`
    * (relative pruning, the RefinedWeb posture) instead of an absolute
    * threshold that rots as the corpus drifts. Exact rank rule with
    * deterministic ties — measured sources order by `(avg_quality,
    * source)` and the bottom `floor(n_measured · pct / 100)` block;
    * unmeasured sources (below `minDocs`) pass, the [[sourceGateFromStats]]
    * cold-start rule. Output one row per source with its `q_rank` among
    * measured sources (NULL for unmeasured) and `keep`.
    *
    * Scale shape: the ranking window is GLOBAL but over the
    * sources-sized verdict frame (thousands of hosts, not documents) —
    * the same bounded-driver-state argument as every gate here; the
    * corpus itself is touched only by [[sourceStats]]' one aggregation. */
  def sourceGateAuto(docs: DataFrame, minQuality: Double = 0.3,
                     blockBottomPct: Int = 10, minDocs: Long = 5L): DataFrame = {
    val s = sourceGateFromStats(sourceStats(docs, minQuality),
        minDocs = minDocs)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("avg_quality"), col("measured"))
    val w = Window.orderBy(col("avg_quality"), col("source"))
    val ranked = s.where(col("measured"))
      .withColumn("q_rank", row_number().over(w).cast("bigint"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy()).cast("bigint"))
      .withColumn("keep",
        col("q_rank") > floor(col("__n") * blockBottomPct / lit(100)).cast("bigint"))
      .drop("__n")
    ranked.unionByName(
        s.where(!col("measured"))
          .withColumn("q_rank", lit(null).cast("bigint"))
          .withColumn("keep", lit(true)))
      .orderBy(col("source"))
  }

  /** [[sourceGateFromStats]] over inline-computed stats — the batch form. */
  def sourceGate(docs: DataFrame, minQuality: Double = 0.3,
                 minAvgQuality: Double = 0.2,
                 maxRepetitiveShare: Double = 0.5,
                 maxPiiShare: Double = 0.5,
                 minDocs: Long = 5L): DataFrame =
    sourceGateFromStats(sourceStats(docs, minQuality),
      minAvgQuality, maxRepetitiveShare, maxPiiShare, minDocs)

  /** The per-DOCUMENT consequence of the source gate: one row per doc
    * with its source's verdict as `source_ok` — the frame a pipeline
    * semi-joins its corpus against (blocked sources pruned wholesale,
    * before any per-doc text work). The verdict side is sources-sized,
    * so the join broadcasts by construction. */
  def sourceFilter(docs: DataFrame, minQuality: Double = 0.3,
                   minAvgQuality: Double = 0.2,
                   maxRepetitiveShare: Double = 0.5,
                   maxPiiShare: Double = 0.5,
                   minDocs: Long = 5L): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(sourceGate(docs, minQuality, minAvgQuality, maxRepetitiveShare,
          maxPiiShare, minDocs)
        .select(col("source"), col("keep").as("source_ok")), Seq("source"))
      .select(col("doc_id"), col("source"), col("source_ok"))
      .orderBy(col("doc_id"))

  /** Registry name of the catalog-managed per-source stats index. */
  private[graft] def sourceStatsIndexName(minQuality: Double): String =
    s"documents-source-stats-q$minQuality"

  /** The catalog-pinned per-source stats table: the warehouse documents
    * scanned ONCE at build, per-source evidence stored (sources-sized —
    * the smallest index in the registry); every later gate or filter
    * probes the stored rows. Same registry citizenship as every indexed
    * twin (definition params recorded, staleness detected, policy
    * decides rebuild-vs-fail). */
  private[graft] def sourceStatsIndex(spark: SparkSession, dir: String,
                                      minQuality: Double,
                                      policy: graft.core.IndexPolicy): graft.core.IndexMeta =
    CatalogOps.indexRegistry(spark, dir).resolveIndex(
      name = sourceStatsIndexName(minQuality), kind = "source-stats",
      sourcePath = s"$dir/documents.parquet",
      params = Map("minQuality" -> minQuality.toString),
      policy = policy) { out =>
      sourceStats(graft.core.Tables.documents(spark, dir), minQuality)
        .write.mode("overwrite").parquet(s"$out/stats")
    }

  /** [[sourceGate]] served from the stored stats index — per-snapshot
    * cost is a sources-sized scan; the corpus is never re-read. Verdicts
    * byte-identical to the inline gate over the same corpus
    * (SourceCurateSpec pins it; the oracle re-derives from raw docs). */
  def sourceGateIndexed(spark: SparkSession, dir: String,
                        minQuality: Double = 0.3,
                        minAvgQuality: Double = 0.2,
                        maxRepetitiveShare: Double = 0.5,
                        maxPiiShare: Double = 0.5,
                        minDocs: Long = 5L,
                        policy: graft.core.IndexPolicy = graft.core.IndexPolicy.BuildIfMissing): DataFrame =
    sourceGateFromStats(
      spark.read.parquet(
        s"${sourceStatsIndex(spark, dir, minQuality, policy).path}/stats"),
      minAvgQuality, maxRepetitiveShare, maxPiiShare, minDocs)

  /** Materialize a corpus PARTITIONED BY SOURCE — the storage layout that
    * turns the host gate into partition-level scan avoidance: a blocked
    * source's files are pruned at PLANNING time by [[prunedScan]], so the
    * 100 TB pipeline never opens the bytes it was going to reject (the
    * family's headline scale claim, made checkable — PlanShapeSpec pins
    * the PartitionFilters). One directory per source; within a source the
    * writer keeps the incoming partitioning. */
  def writeBySource(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").partitionBy("source").parquet(path)

  /** Scan a [[writeBySource]] layout restricted to the gate's kept
    * sources: the `IN` predicate on the partition column resolves to
    * partition pruning — blocked sources' files never enter the scan.
    * `keptSources` is sources-sized (the gate's output), so the literal
    * list is bounded the same way the gate's broadcast side is. */
  def prunedScan(spark: SparkSession, path: String,
                 keptSources: Seq[String]): DataFrame =
    spark.read.parquet(path).where(col("source").isin(keptSources: _*))

  /** The incremental per-doc filter — the running-evidence form
    * [[graft.streaming.Streaming.streamSourceGateAdmit]] runs per batch:
    * `incoming` judged against the gate over `statsState` MERGED with the
    * batch's own stats (evidence up to and including this batch). Pure
    * given (state, batch) — the streaming replay contract. */
  def sourceFilterIncremental(incoming: DataFrame, statsState: DataFrame,
                              minQuality: Double = 0.3,
                              minAvgQuality: Double = 0.2,
                              maxRepetitiveShare: Double = 0.5,
                              maxPiiShare: Double = 0.5,
                              minDocs: Long = 5L): DataFrame =
    incoming.select(col("doc_id"), col("source"))
      .join(sourceGateFromStats(
          mergeSourceStats(statsState, sourceStats(incoming, minQuality)),
          minAvgQuality, maxRepetitiveShare, maxPiiShare, minDocs)
        .select(col("source"), col("keep").as("source_ok")), Seq("source"))
      .select(col("doc_id"), col("source"), col("source_ok"))
      .orderBy(col("doc_id"))
}
