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
               approxNear: Boolean = false,
               // run-rule decontamination arm ([[Dedup.decontaminateRuns]]
               // at the GPT-3 13-gram collision quantity) instead of the
               // default shingle-SET overlap: a doc can be clean by
               // vocabulary overlap yet verbatim-contain an eval passage
               // — the published protocols threshold the RUN, and this
               // flag makes the assembled frame do the same
               runDecontam: Boolean = false,
               // warehouse dir whose CATALOG-PINNED eval posting index
               // ([[Dedup.evalPosIndex]]) the run arm probes instead of
               // re-shingling the eval slice inline every pipeline run —
               // benchmarks are fixed artifacts, shingled once (the r16
               // deployment argument, now wired into the assembled frame).
               // Contract: `docs` must be `dir`'s documents table (the
               // index is built from its bucket ≥ benchFromPct slice);
               // verdicts are byte-identical to the inline arm. Ignored
               // unless runDecontam
               evalIndexDir: Option[String] = None,
               evalIndexPolicy: graft.core.IndexPolicy = graft.core.IndexPolicy.BuildIfMissing,
               // HOST-level arm ([[SourceCurate]]): judge each document's
               // SOURCE on corpus evidence and conjoin the verdict as one
               // more gate column (`source_ok`) — the C4/Gopher/RefinedWeb
               // discipline composed into the assembled frame. A
               // source-dropped doc never consumes shard budget, exactly
               // like every other gate
               sourceGate: Boolean = false,
               minAvgQuality: Double = 0.2,
               // TOKEN-BUDGET arm ([[BudgetSelect]]): after every gate,
               // select the highest-quality KEPT TRAIN docs whose tokens
               // fit the budget (the FineWeb/DCLM cut composed as the
               // pipeline's final selection stage). `budget_ok` = the
               // selection verdict for kept-train docs, vacuously TRUE
               // for kept val/bench docs (they never consume training
               // budget — the decontam_ok convention), FALSE for
               // gate-dropped docs (never candidates); a budget-dropped
               // doc never consumes shard budget, exactly like every
               // other gate
               budgetTokens: Option[Long] = None): DataFrame = {
    val flags = if (!sourceGate)
      textFlags(docs, minQuality, trainPct, benchFromPct,
        approxNear, runDecontam, evalIndexDir, evalIndexPolicy)
    else {
      // ONE per-doc gate pass for both consumers (r17 advice: the
      // sourceFilter form re-ran quality/repetition/PII over the full
      // corpus — a second full gate pass, measured as curate_sourced's
      // ~1.67× cpu floor over curate): the measures frame carries the
      // gate verdicts AND the raw per-doc quantities, the host evidence
      // aggregates the SAME rows ([[SourceCurate.sourceStatsFromMeasures]],
      // byte-identical to the scan form), and the boundary materializes
      // the corpus-sized-but-narrow rows once for the two lineages.
      val measures = CorpusFilter.decisionsWithMeasures(docs, minQuality)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .localCheckpoint(sys.env.contains("SPARK_GRAFT_EAGER_CHECKPOINT"))
      val verdict = SourceCurate.sourceGateFromStats(
          SourceCurate.sourceStatsFromMeasures(measures, minQuality),
          minAvgQuality)
        .select(col("source"), col("keep").as("source_ok"))
      textFlags(docs, minQuality, trainPct, benchFromPct,
          approxNear, runDecontam, evalIndexDir, evalIndexPolicy,
          gatesOpt = Some(measures.select(col("doc_id"), col("quality_ok"),
            col("repetition_ok"), col("pii_ok"), col("dedup_ok"))))
        .join(measures.select(col("doc_id"), col("source")), Seq("doc_id"))
        // left + coalesce: NULL-source docs take the cold-start keep
        // (the [[SourceCurate.sourceFilter]] rule)
        .join(verdict, Seq("source"), "left")
        .withColumn("source_ok", coalesce(col("source_ok"), lit(true)))
        .drop("source")
    }
    decide(docs, flags,
      if (sourceGate) TextGates :+ "source_ok" else TextGates,
      tokensPerShard, trainPct, benchFromPct, budgetTokens)
  }

  /** The text gate columns of [[pipeline]]'s decision frame, in output
    * order. */
  private val TextGates = Seq("quality_ok", "repetition_ok", "pii_ok",
    "dedup_ok", "near_ok", "decontam_ok")

  /** The per-doc TEXT gate verdicts (no `kept` yet): heuristic gates,
    * near-dedup keeper, decontamination — one row per doc with the gate
    * booleans and the split bucket `__b`. */
  private def textFlags(docs: DataFrame, minQuality: Double,
                        trainPct: Int, benchFromPct: Int,
                        approxNear: Boolean,
                        runDecontam: Boolean = false,
                        evalIndexDir: Option[String] = None,
                        evalIndexPolicy: graft.core.IndexPolicy = graft.core.IndexPolicy.BuildIfMissing,
                        // pre-computed per-doc gate verdicts (doc_id +
                        // the four CorpusFilter booleans) — the host-arm
                        // reuse: [[pipeline]](sourceGate) passes its
                        // materialized measures frame so the gates run once
                        gatesOpt: Option[DataFrame] = None): DataFrame = {
    val bucket = Sampling.hashBucket(col("doc_id"))
    val gates = gatesOpt.getOrElse(
      CorpusFilter.decisions(docs, minQuality).drop("kept"))
    // exact-verify arm: the collapse-first treatment form — verdict-
    // identical to resolveKeepers over the naive ngramNear mine (the
    // Dedup.ngramDedup scaladoc's proof; the unchanged curate oracles
    // re-check it every round) but saturation-proof on a replica crawl,
    // where the naive mine's candidate volume is Σ|class|²·bands. The
    // approx arm stays the signature-only resolveKeepers form — it is
    // the per-batch function the streaming sink maintains state for.
    val near = (if (approxNear)
        Dedup.resolveKeepers(docs, Dedup.minhashNearApprox(docs))
      else Dedup.ngramDedup(docs))
      .select(col("doc_id"), col("keep").as("near_ok"))
    // both decontamination arms report TRAIN-slice docs only; val/bench
    // docs are vacuously clean (they are never trained on), restored via
    // the left join's null → true
    val deco = (if (runDecontam) evalIndexDir match {
        // the stored-eval-index arm: the benchmark slice's postings are a
        // build-time fact ([[Dedup.evalPosIndex]]); per pipeline run only
        // the train side shingles and streams through the hash join
        case Some(d) => Dedup.decontaminateRunsIndexed(docs.sparkSession, d,
          docs, trainPct = trainPct, evalFromPct = benchFromPct,
          policy = evalIndexPolicy)
        case None => Dedup.decontaminateRuns(docs,
          trainPct = trainPct, benchFromPct = benchFromPct)
      } else Decontaminate.contamination(docs,
          trainPct = trainPct, benchFromPct = benchFromPct))
      .select(col("doc_id"), (!col("contaminated")).as("__dc"))
    docs.select(col("doc_id"), bucket.as("__b"))
      .join(gates, Seq("doc_id"))
      .join(near, Seq("doc_id"))
      .join(deco, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
        col("pii_ok"), col("dedup_ok"), col("near_ok"),
        coalesce(col("__dc"), lit(true)).as("decontam_ok"),
        col("__b"))
  }

  /** The shared decision tail: `kept` = the conjunction of `gateCols`,
    * token-budget shards over kept-train docs, the leak-bucketed split —
    * one auditable frame whose gate columns are whatever the caller's
    * flags carry ([[pipeline]]'s six text gates; [[pipelineMultimodal]]
    * appends `media_ok`). */
  private def decide(docs: DataFrame, flags: DataFrame, gateCols0: Seq[String],
                     tokensPerShard: Long, trainPct: Int,
                     benchFromPct: Int,
                     budgetTokens: Option[Long] = None): DataFrame = {
    val flagged0 = flags.withColumn("kept", gateCols0.map(col).reduce(_ && _))
    // the budget arm: [[BudgetSelect.selectByBudget]] over the gate-kept
    // TRAIN docs (scored once, threshold from the bins-sized histogram,
    // boundary-only ordering — the family's documented shape), its
    // verdict conjoined as one more gate column. Runs BETWEEN the gate
    // conjunction and the shard scan so a budget-dropped doc never
    // consumes shard budget.
    val (flagged, gateCols) = budgetTokens.fold((flagged0, gateCols0)) { b =>
      val pre = flagged0.localCheckpoint(
        sys.env.contains("SPARK_GRAFT_EAGER_CHECKPOINT"))
      val sel = BudgetSelect.selectByBudget(
          docs.join(pre.where(col("kept") && col("__b") < trainPct)
            .select(col("doc_id")), Seq("doc_id"), "left_semi"), b)
        .select(col("doc_id"), col("kept").as("__bk"))
      (pre.join(sel, Seq("doc_id"), "left")
        .withColumn("budget_ok",
          when(!col("kept"), lit(false))
            .otherwise(coalesce(col("__bk"), lit(true))))
        .drop("__bk")
        .withColumn("kept", col("kept") && col("budget_ok")),
        gateCols0 :+ "budget_ok")
    }
    // MATERIALIZATION BOUNDARY before the fan-out: the flags frame has
    // two consumers (the shard scan over kept-train rows, and the final
    // output), and without a boundary Catalyst re-evaluates every gate
    // arm — including the near-dup mine — for each (measured 150 s vs
    // ~100 s of summed arms at 250k docs). A lazy localCheckpoint
    // materializes the corpus-sized-but-NARROW verdict rows once on
    // first action; conditional-prefix-scan formulations that avoid the
    // fan-out still consume the frame twice (offsets aggregation + final
    // join), so the boundary is the fix, not a rewrite.
    // SPARK_GRAFT_EAGER_CHECKPOINT (diagnostic knob, r17 stall hunt —
    // the SPARK_GRAFT_BENCH_CLEARCACHE precedent): a LAZY checkpoint
    // leaves a race window in which concurrent consumers can each
    // recompute the full gates lineage before the checkpoint takes; the
    // eager form closes that window. VERDICT (r17 A/B + r18 task-count
    // instrument): the race is NOT the suite's stall mechanism — eager
    // still stalled 2/6, and stalled windows run the byte-identical task
    // set (PLANS r18). Knob kept as a documented diagnostic.
    val matFlags = flagged.localCheckpoint(
      sys.env.contains("SPARK_GRAFT_EAGER_CHECKPOINT"))
    // running token sums over kept-train docs only; the conditional-zero
    // contribution equals tokenShards over the kept-train SUBSET, which
    // is what the oracle computes
    val shards = Sampling.tokenShards(
      docs.join(matFlags.where(col("kept") && col("__b") < trainPct)
          .select(col("doc_id")), Seq("doc_id"), "left_semi"),
      tokensPerShard)
      .select(col("doc_id"), col("shard"))
    matFlags.join(shards, Seq("doc_id"), "left")
      .select(col("doc_id") +: gateCols.map(col) :+
        col("kept") :+
        when(!col("kept"), lit(null).cast("string"))
          .when(col("__b") < trainPct, lit("train"))
          .when(col("__b") < benchFromPct, lit("val"))
          .otherwise(lit("bench")).as("split") :+
        when(col("kept") && col("__b") < trainPct, col("shard"))
          .otherwise(lit(null).cast("bigint")).as("shard"): _*)
      .orderBy(col("doc_id"))
  }

  /** [[pipeline]] with the MEDIA duplicate gate joined into the same audit
    * frame — the round-13 residual closed: the per-modality dedup
    * treatment forms existed as standalone operators and streaming gates,
    * but the one assembled frame a user actually runs was text-only.
    * Pure composition of oracle-checked arms: `blobs` (doc_id, blob) rows
    * dispatch on the blob HEADER — RIFF/WAVE → [[Dedup.audioDedup]],
    * plausible-ftyp ISO-BMFF → [[Dedup.videoDedup]], EVERYTHING ELSE →
    * [[Dedup.imageDedup]] (whose container-level fake arm is the engine's
    * declared path for non-media binaries, so every blob gets exactly one
    * family) — and each family's keeper verdict lands as `media_ok`.
    * Docs with no blob row (or whose family yields no verdict: a
    * sample-less MP4, a WAV the envelope cannot window) are vacuously
    * media-clean, the [[textFlags]] decontamination convention. `kept` =
    * text gates ∧ media_ok, and the split/shard assignment runs over the
    * COMPOSED verdict (a media-dropped doc never consumes shard budget —
    * joining the media gate after the fact would mis-number every later
    * shard).
    *
    * Scale shape: the sum of the arms' documented shapes; the dispatch is
    * one header sniff per blob (bounded bytes, a mapPartitions-free UDF on
    * the magic prefix), each family scans only its own modality's rows
    * (filter pushdown below each arm's decode), and the composition joins
    * signature-sized verdict rows on doc_id — pixels/samples never meet
    * the text side. */
  def pipelineMultimodal(spark: SparkSession, docs: DataFrame, blobs: DataFrame,
                         idCol: String = "doc_id", blobCol: String = "blob",
                         minQuality: Double = 0.3,
                         tokensPerShard: Long = 10000L,
                         trainPct: Int = 80, benchFromPct: Int = 90,
                         approxNear: Boolean = false,
                         crossModal: Boolean = false): DataFrame = {
    // the dispatch boundary, measured THREE ways at 250k mixed blobs
    // before this shape won (PLANS r15): unpinned, the crossModal frame's
    // two extra decode passes re-ran the blob scan + header sniff through
    // every consumer (584.7 s vs the plain frame's 202.9 s — the
    // signature-level arm costing like a media chain); a localCheckpoint
    // for BOTH frames fixed crossModal (342.9 s) but the lineage cut made
    // the plain frame's three arms read row-form RDD blocks (202.9 →
    // 330.6 s); a persist kept the plain frame healthy (228.0 s) but its
    // changed size stats re-planned the crossModal arms 1.8 GB of extra
    // shuffle (518.5 s). So the boundary is CONDITIONAL: the plain frame
    // keeps its parquet-scan plans untouched, and only the crossModal
    // frame — whose extra passes make recompute the dominant cost — pays
    // the checkpoint cut (the streaming twin's per-batch discipline).
    // Re-measured r16 (the r15 verdict's what's-wrong #2, which read the
    // driver record's 570-vs-303 cpu as scale-dependence): an always-pin
    // A/B at sf0.1 moved the plain frame 10.32 → 8.66 → 11.01 s medians
    // across three sessions — inside the documented session band, so the
    // pin is NOT a measured win at any scale while the 250k unpin win
    // (+128 s avoided) is; the driver-record asymmetry itself was the
    // bimodal suite-context regime (PLANS r16). The r15 shape stands.
    val typed0 = blobs
      .select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("blob"))
      .withColumn("__mod", Multimodal.modalityUdf(col("blob")))
    val typed = if (crossModal) typed0.localCheckpoint(false) else typed0
    def arm(m: String)(f: DataFrame => DataFrame): DataFrame =
      f(typed.where(col("__mod") === m).select(col("doc_id"), col("blob")))
        .select(col("doc_id"), col("keep").as("__media"))
    val media0 = arm("image")(d => Dedup.imageDedup(spark, d))
      .unionByName(arm("audio")(d => Dedup.audioDedup(spark, d)))
      .unionByName(arm("video")(d => Dedup.videoDedup(spark, d)))
    // the CROSS-MODAL laundering arm: a video whose extracted samples
    // near-match ANY corpus still is redundant with the image family (the
    // content survives through that image's own keeper election), so its
    // media verdict conjoins with NOT-matched. Signature-only probe
    // (distinct frame hashes x distinct image hashes), pixels never meet.
    val media =
      if (!crossModal) media0
      else {
        val xm = Dedup.videoStillMatchesAgainst(
          Multimodal.videoFrameHashes(spark,
            typed.where(col("__mod") === "video").select(col("doc_id"), col("blob"))),
          Multimodal.imagePHash(spark,
            typed.where(col("__mod") === "image").select(col("doc_id"), col("blob")))
            .select(col("phash")))
        media0.join(xm.withColumn("__xm", lit(true)), Seq("doc_id"), "left")
          .select(col("doc_id"),
            (col("__media") && col("__xm").isNull).as("__media"))
      }
    val flags = textFlags(docs, minQuality, trainPct, benchFromPct, approxNear)
      .join(media, Seq("doc_id"), "left")
      .withColumn("media_ok", coalesce(col("__media"), lit(true)))
      .drop("__media")
    decide(docs, flags, TextGates :+ "media_ok",
      tokensPerShard, trainPct, benchFromPct)
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
