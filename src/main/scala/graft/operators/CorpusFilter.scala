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

  def decisions(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .select(col("doc_id"), (col("quality") >= minQuality).as("quality_ok"))
    val r = TextAnalysis.repetition(docs)
      .select(col("doc_id"), (!col("repetitive")).as("repetition_ok"))
    val p = Pii.scan(docs)
      .select(col("doc_id"), (!col("has_pii")).as("pii_ok"))
    val d = Dedup.exact(docs)
      .select(col("doc_id"), col("keep").as("dedup_ok"))

    q.join(r, Seq("doc_id")).join(p, Seq("doc_id")).join(d, Seq("doc_id"))
      .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
        col("pii_ok"), col("dedup_ok"),
        (col("quality_ok") && col("repetition_ok") &&
          col("pii_ok") && col("dedup_ok")).as("kept"))
      .orderBy(col("doc_id"))
  }
}
