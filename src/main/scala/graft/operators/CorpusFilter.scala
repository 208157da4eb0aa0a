package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The assembled pre-training corpus filter — the C4/Gopher-style
  * decision pipeline every LLM dataset ships through, composed from the
  * engine's own operators: quality scoring ([[TextAnalysis.quality]]),
  * repetition cuts ([[TextAnalysis.repetition]]), PII gating
  * ([[Pii.scan]]), and exact-dedup keeper election ([[Dedup.exact]]).
  * One row per document with each gate's verdict and the final AND — the
  * auditable form: a curation pipeline must be able to answer WHY a
  * document was dropped, not just drop it.
  *
  * Scale shape: every arm is the underlying operator's plan (narrow
  * scans, one keyed aggregation for repetition, one fingerprint window
  * for dedup); the four verdicts equi-join on doc_id. Filters compose by
  * conjunction, so at scale the cheap narrow gates (quality, PII) run
  * first as pushed filters and the join-bearing gates see only
  * survivors; here every verdict is kept for the audit.
  */
object CorpusFilter {

  def decisions(docs: DataFrame, minQuality: Double = 0.3): DataFrame =
    decisionsWithMeasures(docs, minQuality)
      .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
        col("pii_ok"), col("dedup_ok"),
        (col("quality_ok") && col("repetition_ok") &&
          col("pii_ok") && col("dedup_ok")).as("kept"))
      .orderBy(col("doc_id"))

  /** [[decisions]] with the raw per-document MEASURES kept beside the
    * verdicts — `n_tokens`, `quality`, `repetitive`, `has_pii` — the reuse
    * surface for source-level aggregation
    * ([[SourceCurate.sourceStatsFromMeasures]]): the composed curate arms
    * run these per-doc scans exactly once and derive both the per-doc gate
    * columns AND the per-source evidence from the same frame. Column
    * pruning reduces this to [[decisions]]' own plan when the measures go
    * unconsumed. No `kept`, no ordering — an internal building block. */
  def decisionsWithMeasures(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        (col("quality") >= minQuality).as("quality_ok"))
    val r = TextAnalysis.repetition(docs)
      .select(col("doc_id"), col("repetitive"),
        (!col("repetitive")).as("repetition_ok"))
    val p = Pii.scan(docs)
      .select(col("doc_id"), col("has_pii"), (!col("has_pii")).as("pii_ok"))
    val d = Dedup.exact(docs)
      .select(col("doc_id"), col("keep").as("dedup_ok"))
    q.join(r, Seq("doc_id")).join(p, Seq("doc_id")).join(d, Seq("doc_id"))
  }

  /** The STORED per-document gate evidence for delta re-curation
    * ([[decisionsDelta]]): every column a PURE function of the document's
    * own text — the measures, the three per-doc gate verdicts, and both
    * content keys (`content_hash` = md5, the [[SnapshotDiff]] identity;
    * `fp` = sha-256, [[Dedup.exact]]'s fingerprint) — so a row may be
    * carried VERBATIM for any doc whose content is unchanged between
    * snapshots. Deliberately EXCLUDES the corpus-level columns
    * (`dedup_ok`, `kept`): a keeper verdict depends on the other docs in
    * the snapshot, so it is re-derived per snapshot from the narrow
    * fingerprint column by [[decisionsFromEvidence]] — no text needed. */
  def gateEvidence(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        (col("quality") >= minQuality).as("quality_ok"))
    val r = TextAnalysis.repetition(docs)
      .select(col("doc_id"), col("repetitive"),
        (!col("repetitive")).as("repetition_ok"))
    val p = Pii.scan(docs)
      .select(col("doc_id"), col("has_pii"), (!col("has_pii")).as("pii_ok"))
    val h = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"),
      sha2(col("text"), 256).as("fp"))
    q.join(r, Seq("doc_id")).join(p, Seq("doc_id")).join(h, Seq("doc_id"))
  }

  /** [[decisions]]' audit frame over an evidence table: the corpus-level
    * exact-dedup keeper (min-id per sha-256 fingerprint —
    * [[Dedup.exact]]'s rule verbatim) re-derived from the NARROW `fp`
    * column — the step that keeps [[decisionsDelta]] exact without
    * touching text. */
  def decisionsFromEvidence(evidence: DataFrame): DataFrame = {
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    evidence
      .withColumn("dedup_ok", col("doc_id") === min(col("doc_id")).over(byFp))
      .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
        col("pii_ok"), col("dedup_ok"),
        (col("quality_ok") && col("repetition_ok") &&
          col("pii_ok") && col("dedup_ok")).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** DELTA RE-CURATION — [[decisions]] over a NEW snapshot at O(|delta|)
    * per-doc analysis cost: rows of `newDocs` whose (id, content) both
    * match a stored [[gateEvidence]] row carry that row verbatim (the
    * gates are pure text functions, so content equality implies equality
    * of every evidence column — byte-exact, not approximate); only
    * added/changed docs pay the tokenizer/bigram/regex scans. The one
    * full pass the new snapshot cannot avoid is the md5 identity hash —
    * the cheap floor that decides what changed ([[SnapshotDiff]]'s
    * economics; one digest per doc vs the gates' multi-pass token work).
    * `dedup_ok` is then re-derived over the COMPLETE new evidence from
    * the narrow fp column, so a changed doc leaving (or joining) a
    * duplicate group flips its group's keeper correctly. Result ≡
    * `decisions(newDocs)` byte-for-byte (CorpusFilterSpec pins it). */
  def decisionsDelta(oldEvidence: DataFrame, newDocs: DataFrame,
                     minQuality: Double = 0.3): DataFrame = {
    val nh = newDocs.withColumn("__h", md5(col("text").cast("binary")))
    val carried = nh.select(col("doc_id"), col("__h").as("content_hash"))
      .join(oldEvidence, Seq("doc_id", "content_hash"))
    val delta = nh.join(
        oldEvidence.select(col("doc_id"), col("content_hash").as("__h")),
        Seq("doc_id", "__h"), "left_anti")
      .drop("__h")
    decisionsFromEvidence(
      carried.unionByName(gateEvidence(delta, minQuality)))
  }

  /** Per-language corpus report — the dataset card a pipeline publishes
    * with a training run: document/token volume, exact-duplicate share,
    * PII incidence, mean heuristic quality and mean LM cross-entropy, per
    * language. Pure composition: every column is an already-audited
    * operator's per-document output ([[graft.operators.Dedup.exact]],
    * [[graft.operators.Pii.scan]], [[TextAnalysis.quality]],
    * [[TextAnalysis.lmCrossEntropy]]) joined on doc_id — the same
    * id-keyed audit-join shape as [[decisions]] — and collapsed by one
    * language-keyed aggregation. Scale cost is the sum of the arms; the
    * final shuffle carries languages × partitions rows. */
  def report(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
    val dup = Dedup.exact(docs).select(col("doc_id"), col("keep"))
    val pii = Pii.scan(docs).select(col("doc_id"), col("has_pii"))
    val lm = TextAnalysis.lmCrossEntropy(docs).select(col("doc_id"), col("xent"))
    q.join(dup, Seq("doc_id")).join(pii, Seq("doc_id")).join(lm, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        // averages of 6-dp-ROUNDED per-doc values go through integer
        // micro-units: a float sum of the rounded doubles is summation-
        // ORDER-dependent in its last ulp, and when the true mean sits on
        // a 5e-7 boundary the 6-dp round flips between engines (observed
        // at sf0.001: 0.300938 vs 0.300937). Summing exact integers is
        // order-free; the two divisions then run on identical inputs.
        // The 0/1 share averages are already exact (integer-valued terms).
        round(sum(round(col("quality") * lit(1000000.0)).cast("bigint")).cast("double")
          / lit(1000000.0) / count(lit(1)), 6).as("avg_quality"),
        round(avg(when(col("keep"), 0.0).otherwise(1.0)), 6).as("exact_dup_share"),
        round(avg(when(col("has_pii"), 1.0).otherwise(0.0)), 6).as("pii_share"),
        round(sum(round(col("xent") * lit(1000000.0)).cast("bigint")).cast("double")
          / lit(1000000.0) / count(lit(1)), 6).as("avg_xent"))
      .orderBy(col("lang"))
  }
}
