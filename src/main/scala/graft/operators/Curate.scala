package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The assembled end-to-end curation pipeline — what a user actually runs
  * over a raw crawl before training: per document, every gate's verdict,
  * the final keep decision, the leak-bucketed split, and the token-budget
  * export shard, in ONE auditable frame.
  *
  * Composition only — each arm is its own oracle-checked operator:
  * heuristic gates ([[CorpusFilter.decisions]]: quality ∧ repetition ∧
  * PII ∧ exact-dedup keeper), corpus-wide near-dedup keeper election
  * ([[Dedup.ngramNear]] + [[Dedup.resolveKeepers]]), benchmark
  * decontamination for the train split ([[Decontaminate.contamination]];
  * val/bench docs are vacuously clean — they never train), the
  * deterministic id-hash split, and [[Sampling.tokenShards]] over the
  * KEPT TRAIN docs. Rejected docs carry their per-gate attribution and a
  * NULL split/shard — the quarantine reading
  * [[graft.streaming.Streaming.streamQualityAdmit]] streams, here as one
  * batch frame.
  *
  * Scale shape: the sum of the arms' documented shapes (each is
  * plan-guarded in its own spec) joined on doc_id — the audit-join
  * pattern of [[CorpusFilter.decisions]]; the shard assignment adds the
  * two-level prefix scan over kept-train rows only. Nothing new shuffles.
  */
object Curate {

  def pipeline(docs: DataFrame, minQuality: Double = 0.3,
               tokensPerShard: Long = 10000L,
               trainPct: Int = 80, benchFromPct: Int = 90,
               // signature-only near arm (minhashNearApprox) instead of
               // the exact char-n-gram mine — the arm the STREAMING sink
               // can maintain incrementally; graft.streaming.Streaming
               // .streamCurate is proven ≡ pipeline(approxNear = true)
               approxNear: Boolean = false): DataFrame = {
    val bucket = Sampling.hashBucket(col("doc_id"))
    val gates = CorpusFilter.decisions(docs, minQuality).drop("kept")
    val nearPairs = if (approxNear) Dedup.minhashNearApprox(docs) else Dedup.ngramNear(docs)
    val near = Dedup.resolveKeepers(docs, nearPairs)
      .select(col("doc_id"), col("keep").as("near_ok"))
    // contamination() reports TRAIN-slice docs only; val/bench docs are
    // vacuously clean (they are never trained on), restored via the left
    // join's null → true
    val deco = Decontaminate.contamination(docs,
        trainPct = trainPct, benchFromPct = benchFromPct)
      .select(col("doc_id"), (!col("contaminated")).as("__dc"))
    val flags = docs.select(col("doc_id"), bucket.as("__b"))
      .join(gates, Seq("doc_id"))
      .join(near, Seq("doc_id"))
      .join(deco, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
        col("pii_ok"), col("dedup_ok"), col("near_ok"),
        coalesce(col("__dc"), lit(true)).as("decontam_ok"),
        col("__b"))
      .withColumn("kept",
        col("quality_ok") && col("repetition_ok") && col("pii_ok") &&
          col("dedup_ok") && col("near_ok") && col("decontam_ok"))
    // MATERIALIZATION BOUNDARY before the fan-out: the flags frame has
    // two consumers (the shard scan over kept-train rows, and the final
    // output), and without a boundary Catalyst re-evaluates every gate
    // arm — including the near-dup mine — for each (measured 150 s vs
    // ~100 s of summed arms at 250k docs). A lazy localCheckpoint
    // materializes the corpus-sized-but-NARROW verdict rows once on
    // first action; conditional-prefix-scan formulations that avoid the
    // fan-out still consume the frame twice (offsets aggregation + final
    // join), so the boundary is the fix, not a rewrite.
    val matFlags = flags.localCheckpoint(false)
    // running token sums over kept-train docs only; the conditional-zero
    // contribution equals tokenShards over the kept-train SUBSET, which
    // is what the oracle computes
    val shards = Sampling.tokenShards(
      docs.join(matFlags.where(col("kept") && col("__b") < trainPct)
          .select(col("doc_id")), Seq("doc_id"), "left_semi"),
      tokensPerShard)
      .select(col("doc_id"), col("shard"))
    matFlags.join(shards, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
        col("pii_ok"), col("dedup_ok"), col("near_ok"), col("decontam_ok"),
        col("kept"),
        when(!col("kept"), lit(null).cast("string"))
          .when(col("__b") < trainPct, lit("train"))
          .when(col("__b") < benchFromPct, lit("val"))
          .otherwise(lit("bench")).as("split"),
        when(col("kept") && col("__b") < trainPct, col("shard"))
          .otherwise(lit(null).cast("bigint")).as("shard"))
      .orderBy(col("doc_id"))
  }

  /** Materialize a [[pipeline]] run: kept TRAIN docs as token-budget
    * shards ([[graft.io.Export.writeShards]] — files + manifest), every
    * rejected doc with its per-gate attribution to `path/quarantine`
    * (the forensics table curators re-tune thresholds from), and the
    * per-language dataset card ([[CorpusFilter.report]] over the kept
    * corpus) to `path/card`. Returns the decision frame so callers can
    * chain without recomputing. */
  def export(spark: SparkSession, docs: DataFrame, path: String,
             minQuality: Double = 0.3, tokensPerShard: Long = 10000L,
             trainPct: Int = 80, benchFromPct: Int = 90): DataFrame = {
    val decisions = pipeline(docs, minQuality, tokensPerShard, trainPct, benchFromPct)
    val trainDocs = docs.join(
      decisions.where(col("kept") && col("split") === "train").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    graft.io.Export.writeShards(spark, trainDocs, s"$path/train", tokensPerShard)
    decisions.where(!col("kept"))
      .write.mode("overwrite").parquet(s"$path/quarantine")
    CorpusFilter.report(docs.join(
        decisions.where(col("kept")).select(col("doc_id")), Seq("doc_id"), "left_semi"))
      .write.mode("overwrite").parquet(s"$path/card")
    decisions
  }
}
