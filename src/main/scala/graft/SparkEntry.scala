package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.{Ann, AsofJoin, Bitext, Bpe, BudgetSelect, CatalogOps, Centrality, CorpusFilter, Curate, Decontaminate, Dedup, Diagnostics, EmbeddingStats, Funnel, Ingest, Mining, Multimodal, Pii, RangeJoin, Relational, Salting, Sampling, Search, Sessionize, Similarity, SnapshotDiff, SourceCurate, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry
  * (Spark DataFrame) and, when SQL-expressible, an `oracleSql` entry (ANSI
  * SQL run by DuckDB over the same parquet tables). Column names and row
  * ordering are aligned between the two; floating-point outputs are rounded
  * (6 dp scores, 2-4 dp aggregates) and rankings computed on the rounded
  * values so both engines agree deterministically.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Similarity.topKSingle(spark, "/root/testdata/sf0.001", queryVecId = 0L, k = 10)

  /** Near-dup pairs memoized per scale dir: `dedup_resolve` and
    * `dedup_groups` CONSUME a mined pairs table (in a real pipeline the
    * mining runs once and both decisions derive from it) —
    * `localCheckpoint` materializes the few hundred pair rows and
    * truncates the mining lineage, so downstream queries measure their
    * own work, while `dedup_ngram` itself still measures the full mine. */
  private val ngramPairsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def ngramPairs(s: SparkSession, dir: String): DataFrame =
    ngramPairsCache.getOrElseUpdate(dir,
      Dedup.ngramNear(Tables.documents(s, dir)).localCheckpoint())

  /** Materialize the shared (memoized) inputs above. The bench calls this
    * during its warmup phase so `dedup_resolve`/`dedup_groups` measure
    * their own work rather than whichever of them happens to run first
    * absorbing the whole mine — `dedup_ngram` itself still measures the
    * full mine, so its cost stays visible in the total. */
  def prepareShared(s: SparkSession, dir: String): Unit = ngramPairs(s, dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_single"   -> ((s, dir) => Similarity.topKSingle(s, dir, 0L, 10)),
    "topk_filtered" -> ((s, dir) => Similarity.topKFiltered(s, dir, 0L, 10, 3)),
    "point_lookup"  -> ((s, dir) => Similarity.pointLookup(s, dir, 42L)),
    "sim_join_topk" -> ((s, dir) => Similarity.batchSimilarityJoin(s, dir, 8, 5)),
    "page_rank" -> ((s, dir) => Centrality.similarityPageRank(Tables.embeddings(s, dir))),
    "page_rank_ann" -> ((s, dir) => Centrality.similarityPageRankAnn(Tables.embeddings(s, dir))),
    "page_rank_ann2" -> ((s, dir) => Centrality.similarityPageRankAnn2(Tables.embeddings(s, dir))),
    // the rung-picker auto twins: below the literal threshold auto IS the
    // flat entry point (same oracle verbatim); `flatCellMax = 0` forces the
    // two-level rung with the derived params (nCoarse = wCoarse = ⌈√16⌉ = 4
    // — coarse full-open), oracle = the existing two-level generator at
    // those params
    "page_rank_ann_auto" -> ((s, dir) =>
      Centrality.similarityPageRankAnnAuto(Tables.embeddings(s, dir))),
    "page_rank_ann_auto2" -> ((s, dir) =>
      Centrality.similarityPageRankAnnAuto(Tables.embeddings(s, dir), flatCellMax = 0)),
    "topk_via_catalog" -> ((s, dir) => CatalogOps.topkViaCatalog(s, dir, 0L, 10)),
    "chunk_docs" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length}
      Ingest.chunk(graft.core.Tables.documents(s, dir), "doc_id", "text", 128)
        .select(col("id"), col("chunk"), length(col("chunk")).cast("bigint").as("chunk_len"))
    }),
    "ingest_topk" -> ((s, dir) => Ingest.ingestTopk(s, dir, "spark data query", 10, 128)),
    "chunk_doc_topk" -> ((s, dir) => Search.chunkDocRetrieval(s, dir, "spark data query", 10, 128)),
    "dedup_exact"   -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    "dedup_minhash" -> ((s, dir) => Dedup.minhashNear(Tables.documents(s, dir))),
    // signature-only verify (agreeing-seed estimate) — the shape that
    // never ships shingle sets; same banding as dedup_minhash
    "dedup_minhash_approx" -> ((s, dir) => Dedup.minhashNearApprox(Tables.documents(s, dir))),
    // span-level TREATMENT: duplicated 5-word spans removed from the text
    "span_trim" -> ((s, dir) => Dedup.trimSpans(Tables.documents(s, dir))),
    // token-budget shard layout (export step) — two-level scan vs the
    // oracle's plain global running sum
    "shard_assign" -> ((s, dir) =>
      Sampling.tokenShards(Tables.documents(s, dir), tokensPerShard = 10000L)),
    // executable mixture: per-doc deterministic repetition counts
    "mixture_draw" -> ((s, dir) => Sampling.mixtureDraw(Tables.documents(s, dir))),
    // mixture planning served from the catalog-pinned source-stats index
    // (one stored table feeds the host gate AND the mixture planner) —
    // weights byte-identical to the inline source_mix
    "source_mix_indexed" -> ((s, dir) => Sampling.sourceMixtureIndexed(s, dir)),
    // running-evidence draw: the bucket>=50 slice drawn under state
    // accumulated from the rest — merged evidence equals the whole
    // corpus, so the oracle is the whole-corpus mixture restricted to
    // the incoming slice (the incremental identity, engine-checked)
    "mixture_draw_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val b = Sampling.hashBucket(org.apache.spark.sql.functions.col("doc_id"))
      Sampling.mixtureDrawIncremental(d.where(b >= 50),
        Sampling.sourceTokenStats(d.where(b < 50)))
    }),
    // achieved-vs-planned tokens per source over the materialized draw
    "mixture_audit" -> ((s, dir) => Sampling.mixtureAudit(Tables.documents(s, dir))),
    // recrawl snapshot diff: old = id-buckets <90 of the stored corpus,
    // new = buckets >=10 with [40,50) content-rewritten — one full-outer
    // join of two narrow (id, md5) projections classifies every doc as
    // added/removed/changed/unchanged
    "snapshot_diff" -> ((s, dir) => {
      val (o, n) = snapshotPair(s, dir)
      SnapshotDiff.corpusDiff(o, n)
    }),
    // the diff with the OLD side served from the catalog-pinned
    // content-hash index (stored snapshot = the dir's documents table;
    // its text is never re-read) — index identity is the claim
    "snapshot_diff_indexed" -> ((s, dir) =>
      SnapshotDiff.corpusDiffIndexed(s, dir, snapshotPair(s, dir)._2)),
    // the consequence frame: the delta a curate pass re-gates (added ∪
    // changed only — per-snapshot per-doc cost is O(|delta|))
    "snapshot_delta" -> ((s, dir) => {
      val (o, n) = snapshotPair(s, dir)
      SnapshotDiff.changedDocs(SnapshotDiff.contentHashes(o), n)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("status"))
    }),
    // per-source turnover audit: added/removed/changed/unchanged counts
    // + churn share — the canary row for a host that silently rewrote
    // itself between crawls
    "snapshot_diff_stats" -> ((s, dir) => {
      val (o, n) = snapshotPair(s, dir)
      SnapshotDiff.diffStats(o, n)
    }),
    // delta re-curation: the new snapshot's FULL decisions frame with
    // per-doc text analysis paid only over the delta (stored gate
    // evidence carried for unchanged content; the corpus-level dedup
    // keeper re-derived from narrow fingerprints) — byte-identical to
    // re-gating the whole snapshot, which is what the oracle computes
    "gate_delta" -> ((s, dir) => {
      val (o, n) = snapshotPair(s, dir)
      CorpusFilter.decisionsDelta(CorpusFilter.gateEvidence(o), n)
    }),
    // interpretable hard-rule quality audit (Gopher rule family)
    "gopher_rules" -> ((s, dir) => TextAnalysis.gopherRules(Tables.documents(s, dir))),
    // the assembled end-to-end curation pipeline — gates + near-dedup +
    // decontamination + split + shard in one auditable frame
    "curate" -> ((s, dir) => Curate.pipeline(Tables.documents(s, dir))),
    // the assembled frame with the RUN-RULE decontamination arm (the
    // GPT-3 13-gram collision quantity instead of shingle-set overlap) —
    // the oracle swaps only the decontam CTE chain, everything else
    // byte-identical to `curate`. The run arm probes the CATALOG-PINNED
    // eval posting index (benchmarks are fixed artifacts, shingled once —
    // the r17 wiring); the oracle doesn't care where postings come from
    "curate_runs" -> ((s, dir) =>
      Curate.pipeline(Tables.documents(s, dir), runDecontam = true,
        evalIndexDir = Some(dir))),
    // the assembled frame with the HOST-level arm conjoined (r17): docs
    // from blocked sources rejected wholesale with attribution; the
    // oracle adds only the sstats chain + one gate column
    "curate_sourced" -> ((s, dir) =>
      Curate.pipeline(Tables.documents(s, dir), sourceGate = true,
        minAvgQuality = 0.29)),
    // the assembled frame with the TOKEN-BUDGET arm conjoined (r18): the
    // FineWeb/DCLM selection cut over the gate-kept train docs — 8000
    // tokens bites (kept-train holds more), so budget_ok splits genuinely
    "curate_budget" -> ((s, dir) =>
      Curate.pipeline(Tables.documents(s, dir), budgetTokens = Some(8000L))),
    "curate_multimodal" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, expr, lit, when}
      // the pair device: docs 2k and 2k+1 share a 512-byte md5-hex blob in
      // the same modality ((doc_id div 2) % 3 → image/audio/video), so
      // every complete pair's odd member is a media duplicate — offenders
      // live in all three families; doc_id % 97 == 0 rows get NO blob
      // (the vacuously-clean arm)
      val wavH = lit(graft.operators.Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL))
      val mp4H = lit(graft.operators.Multimodal.mp4VideoFramesHeader())
      val payload = expr("repeat(md5(cast(doc_id div 2 as string)), 16)").cast("binary")
      val m = expr("(doc_id div 2) % 3")
      val blobs = Tables.documents(s, dir).where(expr("doc_id % 97 != 0"))
        .select(col("doc_id"),
          when(m === 0, payload)
            .when(m === 1, concat(wavH, payload))
            .otherwise(concat(mp4H, payload)).as("blob"))
      Curate.pipelineMultimodal(s, Tables.documents(s, dir), blobs)
    }),
    "curate_multimodal_xm" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, expr, lit, when}
      // the cross-modal laundering device: the pair corpus plus EXTRA
      // 32-byte stills (ids offset by 1,000,000 — blob-only rows, never
      // docs) whose bytes equal the md5 block every frame of a selected
      // video class repeats, so those videos near-match a corpus still at
      // Hamming 0 and the crossModal arm must drop them; all other
      // verdicts must stay exactly curate_multimodal's
      val wavH = lit(graft.operators.Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL))
      val mp4H = lit(graft.operators.Multimodal.mp4VideoFramesHeader())
      val payload = expr("repeat(md5(cast(doc_id div 2 as string)), 16)").cast("binary")
      val m = expr("(doc_id div 2) % 3")
      val base = Tables.documents(s, dir).where(expr("doc_id % 97 != 0"))
      val blobs = base
        .select(col("doc_id"),
          when(m === 0, payload)
            .when(m === 1, concat(wavH, payload))
            .otherwise(concat(mp4H, payload)).as("blob"))
        .unionByName(base
          .where(expr("(doc_id div 2) % 3 = 2 AND doc_id % 2 = 0 AND (doc_id div 2) % 5 = 2"))
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            expr("cast(md5(cast(doc_id div 2 as string)) as binary)").as("blob")))
      Curate.pipelineMultimodal(s, Tables.documents(s, dir), blobs,
        crossModal = true)
    }),
    // the signature-only near arm — the batch frame streamCurate is proven
    // equivalent to (StreamingSpec), oracle-checked in its own right
    "curate_approx" -> ((s, dir) => Curate.pipeline(Tables.documents(s, dir), approxNear = true)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashNear(Tables.embeddings(s, dir))),
    "dedup_semantic" -> ((s, dir) => Dedup.semanticDedup(Tables.embeddings(s, dir))),
    "dedup_semantic_split" -> ((s, dir) =>
      Dedup.semanticDedupSplit(Tables.embeddings(s, dir), maxCell = 32)),
    "dedup_semantic_split2" -> ((s, dir) =>
      Dedup.semanticDedupSplit(Tables.embeddings(s, dir), maxCell = 32, subBands = 2)),
    "dedup_semantic2" -> ((s, dir) => Dedup.semanticDedup2(Tables.embeddings(s, dir))),
    // rung-picker auto twins (each side shares its rung's oracle verbatim;
    // the two-level side carries that rung's `split` diagnostic column)
    "dedup_semantic_auto" -> ((s, dir) =>
      Dedup.semanticDedupAuto(Tables.embeddings(s, dir))),
    "dedup_semantic_auto2" -> ((s, dir) =>
      Dedup.semanticDedupAuto(Tables.embeddings(s, dir), flatCellMax = 0)),
    "dedup_image_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, length, lit, octet_length, max => smax}
      // the incremental family's standard split over text-as-binary blobs:
      // reference = bucket < 50; incoming = the rest, plus re-ingested
      // copies of bucket < 10 (corpus hits at Hamming 0) and offset copies
      // of bucket >= 95 (in-batch repeats)
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      val off = base.agg(coalesce(smax(col("doc_id")), lit(0L))).head.getLong(0) + 1L
      val bucket = Sampling.hashBucket(col("doc_id"))
      val incoming = base.where(bucket >= 50)
        .unionByName(base.where(bucket < 10)
          .withColumn("doc_id", col("doc_id") + off))
        .unionByName(base.where(bucket >= 95)
          .withColumn("doc_id", col("doc_id") + 2L * off))
      Dedup.imageIncremental(s, incoming, base.where(bucket < 50))
    }),
    "dedup_image_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, length, lit, octet_length, max => smax}
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      val off = base.agg(coalesce(smax(col("doc_id")), lit(0L))).head.getLong(0) + 1L
      val bucket = Sampling.hashBucket(col("doc_id"))
      val incoming = base.where(bucket >= 50)
        .unionByName(base.where(bucket < 10)
          .withColumn("doc_id", col("doc_id") + off))
        .unionByName(base.where(bucket >= 95)
          .withColumn("doc_id", col("doc_id") + 2L * off))
      Dedup.imageIncrementalIndexed(s, dir, incoming)
    }),
    "audio_dedup_incremental" -> ((s, dir) =>
      Dedup.audioIncremental(s, audioIncrementalIncoming(s, dir),
        audioIncrementalReference(s, dir), maxBytes = 512)),
    "audio_dedup_incremental_indexed" -> ((s, dir) =>
      Dedup.audioIncrementalIndexed(s, dir, audioIncrementalIncoming(s, dir),
        maxBytes = 512)),
    "video_dedup_incremental" -> ((s, dir) =>
      Dedup.videoIncremental(s, videoIncrementalIncoming(s, dir),
        videoIncrementalReference(s, dir))),
    "video_dedup_incremental_indexed" -> ((s, dir) =>
      Dedup.videoIncrementalIndexed(s, dir, videoIncrementalIncoming(s, dir))),
    "dedup_semantic_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, lit, max => smax}
      // the incremental family's standard split: reference = bucket < 50;
      // incoming = the rest, plus re-ingested copies of bucket < 10
      // (corpus hits at cosine 1) and offset copies of bucket >= 95
      // (in-batch repeats)
      val e = Tables.embeddings(s, dir)
      val off = e.agg(coalesce(smax(col("vec_id")), lit(0L))).head.getLong(0) + 1L
      val bucket = Sampling.hashBucket(col("vec_id"))
      val ref = e.where(bucket < 50)
      val incoming = e.where(bucket >= 50)
        .unionByName(e.where(bucket < 10)
          .withColumn("vec_id", col("vec_id") + off))
        .unionByName(e.where(bucket >= 95)
          .withColumn("vec_id", col("vec_id") + 2L * off))
      Dedup.semanticIncremental(incoming, ref)
    }),
    "dedup_semantic_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, lit, max => smax}
      val e = Tables.embeddings(s, dir)
      val off = e.agg(coalesce(smax(col("vec_id")), lit(0L))).head.getLong(0) + 1L
      val bucket = Sampling.hashBucket(col("vec_id"))
      val incoming = e.where(bucket >= 50)
        .unionByName(e.where(bucket < 10)
          .withColumn("vec_id", col("vec_id") + off))
        .unionByName(e.where(bucket >= 95)
          .withColumn("vec_id", col("vec_id") + 2L * off))
      Dedup.semanticIncrementalIndexed(s, dir, incoming)
    }),
    "dedup_spans" -> ((s, dir) => Dedup.spanDedup(Tables.documents(s, dir))),
    "dedup_ngram"   -> ((s, dir) => Dedup.ngramNear(Tables.documents(s, dir))),
    "dedup_resolve" -> ((s, dir) => Dedup.resolveKeepers(Tables.documents(s, dir),
      ngramPairs(s, dir))),
    "dedup_groups"  -> ((s, dir) => Dedup.dedupGroups(Tables.documents(s, dir),
      ngramPairs(s, dir))),
    "dedup_groups_star" -> ((s, dir) => Dedup.dedupGroupsStar(Tables.documents(s, dir),
      ngramPairs(s, dir))),
    "dedup_groups_indexed" -> ((s, dir) => Dedup.dedupGroupsIndexed(s, dir)),
    "leak_safe_split" -> ((s, dir) => Sampling.leakSafeSplit(Tables.documents(s, dir),
      ngramPairs(s, dir))),
    "weighted_sample" -> ((s, dir) => Sampling.weightedSample(Tables.documents(s, dir))),
    // incremental dedup: reference corpus = hash-split half; the incoming
    // batch is the other half PLUS re-keyed clones of reference docs
    // (a crawler re-fetching known pages → seen_in_corpus) and re-keyed
    // clones of its own docs (an in-batch repeat → first_in_batch=false).
    // Clone offsets derive from max(doc_id)+1 — a fixed constant would
    // silently collide with genuine ids at a larger scale factor
    "dedup_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, lit, max => smax}
      val d = Tables.documents(s, dir)
      // coalesce inside the agg, mirroring the oracle's
      // coalesce(max(doc_id), 0): max over an empty table is NULL and a
      // bare getLong would NPE instead of yielding an empty report
      val off = d.agg(coalesce(smax(col("doc_id")), lit(0L))).head.getLong(0) + 1L
      val bucket = Sampling.hashBucket(col("doc_id"))
      val ref = d.where(bucket < 50)
      val incoming = d.where(bucket >= 50)
        .unionByName(d.where(bucket < 10)
          .withColumn("doc_id", col("doc_id") + off))
        .unionByName(d.where(bucket >= 95)
          .withColumn("doc_id", col("doc_id") + 2L * off))
      Dedup.exactIncremental(incoming, ref)
    }),
    // near-dup twin of dedup_incremental over the same hash split: the
    // corpus' natural near-dup pairs straddle the split, so the flags
    // carry signal without constructed clones
    "dedup_near_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, dir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      Dedup.ngramNearIncremental(d.where(bucket >= 50), d.where(bucket < 50))
    }),
    // same admissions as the two incremental queries, but the reference
    // side comes from the catalog-managed stored index (oracle identity
    // with the inline variants is the index-correctness proof)
    "dedup_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, lit, max => smax}
      val d = Tables.documents(s, dir)
      val off = d.agg(coalesce(smax(col("doc_id")), lit(0L))).head.getLong(0) + 1L
      val bucket = Sampling.hashBucket(col("doc_id"))
      val incoming = d.where(bucket >= 50)
        .unionByName(d.where(bucket < 10)
          .withColumn("doc_id", col("doc_id") + off))
        .unionByName(d.where(bucket >= 95)
          .withColumn("doc_id", col("doc_id") + 2L * off))
      Dedup.exactIncrementalIndexed(s, dir, incoming)
    }),
    "dedup_near_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, dir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      Dedup.ngramNearIncrementalIndexed(s, dir, d.where(bucket >= 50))
    }),
    // the word-shingle (minhash-family) twins of the two queries above,
    // same split and the same inline-vs-indexed oracle identity
    "dedup_minhash_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, dir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      Dedup.minhashNearIncremental(d.where(bucket >= 50), d.where(bucket < 50))
    }),
    // signature-only admission (agreeing-seed estimate) over the same
    // split — the variant whose verify and stored index never touch
    // shingle sets; inline vs indexed oracle identity as above
    "dedup_minhash_approx_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, dir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      Dedup.minhashNearIncrementalApprox(d.where(bucket >= 50), d.where(bucket < 50))
    }),
    "dedup_minhash_approx_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, dir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      Dedup.minhashNearIncrementalApproxIndexed(s, dir, d.where(bucket >= 50))
    }),
    "dedup_minhash_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.documents(s, dir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      Dedup.minhashNearIncrementalIndexed(s, dir, d.where(bucket >= 50))
    }),
    "source_overlap" -> ((s, dir) => Dedup.sourceOverlap(Tables.documents(s, dir))),
    "decontaminate" -> ((s, dir) => Decontaminate.contamination(Tables.documents(s, dir))),
    "decontaminate_semantic" -> ((s, dir) =>
      Decontaminate.semanticContamination(Tables.embeddings(s, dir))),
    "bigram_novelty" -> ((s, dir) => TextAnalysis.bigramNovelty(Tables.documents(s, dir))),
    "lm_score" -> ((s, dir) => TextAnalysis.lmCrossEntropy(Tables.documents(s, dir))),
    "lm_score_bigram" -> ((s, dir) => TextAnalysis.lmCrossEntropyBigram(Tables.documents(s, dir))),
    "dsir_weights" -> ((s, dir) => TextAnalysis.dsirWeights(Tables.documents(s, dir))),
    "quality_classifier" -> ((s, dir) => TextAnalysis.qualityClassifier(Tables.documents(s, dir))),
    "calibration_audit" -> ((s, dir) => TextAnalysis.calibrationAudit(Tables.documents(s, dir))),
    "classifier_auc" -> ((s, dir) => TextAnalysis.classifierAuc(Tables.documents(s, dir))),
    "zipf_fit"  -> ((s, dir) => TextAnalysis.zipfFit(Tables.documents(s, dir))),
    "heaps_fit" -> ((s, dir) => TextAnalysis.heapsFit(Tables.documents(s, dir))),
    "ppl_buckets" -> ((s, dir) => TextAnalysis.perplexityBuckets(Tables.documents(s, dir))),
    "doremi_weights" -> ((s, dir) => TextAnalysis.doremiWeights(Tables.documents(s, dir))),
    "corpus_filter" -> ((s, dir) => CorpusFilter.decisions(Tables.documents(s, dir))),
    "corpus_report" -> ((s, dir) => CorpusFilter.report(Tables.documents(s, dir))),
    // SOURCE-level curation (r17): mergeable per-source evidence, the
    // host gate over it, and the per-doc consequence — the C4/Gopher/
    // RefinedWeb host discipline (judge the source, prune wholesale)
    "source_stats" -> ((s, dir) => SourceCurate.sourceStats(Tables.documents(s, dir))),
    // minAvgQuality 0.29 splits the synthetic corpus's 20 sources into
    // genuine keep AND block verdicts (measured: avg quality spans
    // 0.240-0.334 per source)
    "source_gate" -> ((s, dir) =>
      SourceCurate.sourceGate(Tables.documents(s, dir), minAvgQuality = 0.29)),
    "source_filter" -> ((s, dir) =>
      SourceCurate.sourceFilter(Tables.documents(s, dir), minAvgQuality = 0.29)),
    // merge identity proven against an engine-independent ground truth:
    // Spark merges the two bucket-halves' stats; the oracle aggregates
    // the WHOLE corpus directly
    "source_stats_merged" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val b = Sampling.hashBucket(col("doc_id"))
      SourceCurate.mergeSourceStats(
        SourceCurate.sourceStats(docs.where(b < 50)),
        SourceCurate.sourceStats(docs.where(b >= 50)))
    }),
    // the gate served from the catalog-pinned per-source stats table
    // (sources-sized — the smallest index in the registry); the oracle
    // re-derives from raw documents
    "source_gate_indexed" -> ((s, dir) =>
      SourceCurate.sourceGateIndexed(s, dir, minAvgQuality = 0.29)),
    // the AUTO rung: relative pruning — the bottom 10% of measured
    // sources by avg quality block, exact rank rule, deterministic ties
    "source_gate_auto" -> ((s, dir) =>
      SourceCurate.sourceGateAuto(Tables.documents(s, dir))),
    // TOKEN-BUDGET quality selection (r18): keep the highest-scoring
    // docs whose tokens fit the budget — threshold from the mergeable
    // ≤1001-bin score histogram, boundary bin resolved by a two-level
    // exact prefix; never a global sort (the FineWeb/DCLM selection cut)
    "budget_hist" -> ((s, dir) =>
      BudgetSelect.scoreHistogram(Tables.documents(s, dir))),
    // merge identity proven against engine-independent ground truth:
    // Spark merges the two bucket-halves' histograms; the oracle
    // aggregates the WHOLE corpus directly
    "budget_hist_merged" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val b = Sampling.hashBucket(col("doc_id"))
      BudgetSelect.mergeHistograms(
        BudgetSelect.scoreHistogram(docs.where(b < 50)),
        BudgetSelect.scoreHistogram(docs.where(b >= 50)))
    }),
    // 9000 tokens ≈ a third of the sf0.01 corpus: the threshold lands
    // mid-distribution, so all three regions are non-trivially populated
    "budget_select" -> ((s, dir) =>
      BudgetSelect.selectByBudget(Tables.documents(s, dir), 9000L)),
    // the AUTO rung: budget as a fraction of the corpus's own tokens
    "budget_select_auto" -> ((s, dir) =>
      BudgetSelect.selectTopPct(Tables.documents(s, dir), 40)),
    // the threshold served from the catalog-pinned histogram (≤1001
    // rows — tied smallest index in the registry); the oracle re-derives
    // from raw documents
    "budget_select_indexed" -> ((s, dir) =>
      BudgetSelect.selectByBudgetIndexed(s, dir, 9000L)),
    // running-evidence admission: state = the sub-80 buckets' histogram,
    // incoming = the rest; merged evidence ≡ the whole corpus, so the
    // oracle derives the threshold from all documents and admits the
    // incoming docs strictly above it (the declared bin-granular rule)
    "budget_select_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val b = Sampling.hashBucket(col("doc_id"))
      BudgetSelect.selectIncremental(docs.where(b >= 80),
        BudgetSelect.scoreHistogram(docs.where(b < 80)), 9000L)
    }),
    "budget_audit" -> ((s, dir) =>
      BudgetSelect.budgetAudit(Tables.documents(s, dir), 9000L)),
    "text_stats"   -> ((s, dir) => TextAnalysis.stats(Tables.documents(s, dir))),
    "docs_sample"  -> ((s, dir) => Sampling
      .sampleByPercent(Tables.documents(s, dir), "doc_id", 10)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"))
      .orderBy("doc_id")),
    "split_audit"  -> ((s, dir) => Sampling.splitAudit(Tables.documents(s, dir))),
    "sample_delta" -> ((s, dir) => Sampling.sampleDelta(Tables.documents(s, dir))),
    "pack_batches" -> ((s, dir) => Sampling.packBatches(Tables.documents(s, dir))),
    "skew_audit"   -> ((s, dir) => Diagnostics.skewAudit(Tables.events(s, dir), "user_id", 20)),
    "salted_priority_revenue" -> ((s, dir) =>
      Salting.saltedPriorityRevenue(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    "token_topk"   -> ((s, dir) => TextAnalysis.tokenTopK(Tables.documents(s, dir), 20)),
    "token_cms"    -> ((s, dir) => TextAnalysis.tokenCms(Tables.documents(s, dir))),
    "token_hll"    -> ((s, dir) => TextAnalysis.tokenHll(Tables.documents(s, dir))),
    "bpe_merges"   -> ((s, dir) => Bpe.train(Tables.documents(s, dir))),
    "bpe_fertility" -> ((s, dir) => Bpe.fertility(Tables.documents(s, dir))),
    "bpe_segment" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = Bpe.train(docs, 8).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.segmentCounts(docs, merges)
    }),
    "token_drift"  -> ((s, dir) => TextAnalysis.tokenDrift(Tables.documents(s, dir), 20)),
    "text_quality" -> ((s, dir) => TextAnalysis.quality(Tables.documents(s, dir))),
    "quality_calibrated" -> ((s, dir) => TextAnalysis.qualityCalibrated(Tables.documents(s, dir))),
    "lang_id"      -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),
    "token_counts" -> ((s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir))),
    "doc_winnow"   -> ((s, dir) => TextAnalysis.winnowFingerprints(Tables.documents(s, dir))),
    "winnow_pairs" -> ((s, dir) => TextAnalysis.winnowPairs(Tables.documents(s, dir))),
    "text_normalize" -> ((s, dir) => TextAnalysis.normalize(Tables.documents(s, dir))),
    "text_repetition" -> ((s, dir) => TextAnalysis.repetition(Tables.documents(s, dir))),
    "bm25_topk" -> ((s, dir) => Search.bm25TopK(Tables.documents(s, dir), Bm25Terms, 15)),
    "hybrid_topk" -> ((s, dir) =>
      Search.hybridTopK(Tables.documents(s, dir), Bm25Terms, "spark data query", 15)),
    "pii_redact" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, lit, lpad, pmod}
      // the synthetic corpus carries no PII, so inject a deterministic
      // contact line built from table columns — both engines construct
      // the identical string, so the regex spans (and the redacted
      // fingerprint) become a real cross-engine check
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" from 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".7")).as("text"))
      Pii.scan(docs).orderBy(col("doc_id"))
    }),
    "ann_topk" -> ((s, dir) => Ann.annTopk(s, dir, 0L, 10)),
    "ann_topk_indexed" -> ((s, dir) => Ann.annTopkIndexed(s, dir, 0L, 10)),
    "ann_recall" -> ((s, dir) => Ann.annRecall(s, dir, 8, 10)),
    "hard_negatives" -> ((s, dir) => Mining.hardNegatives(Tables.embeddings(s, dir), 8)),
    "bitext_mine" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // two "languages" = the even/odd vec_id halves; full probe
      // (nProbe = nCells) makes the cell-blocked candidate set exact, so
      // the oracle is the brute-force margin definition with no quantizer
      val e = Tables.embeddings(s, dir)
      Bitext.minePairs(
        e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_vec")),
        e.where(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec")),
        k = 4, tau = 1.0, nCells = 8, nProbe = 8)
    }),
    "bitext_mine2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // the two-level candidate generator at FULL-OPEN settings
      // (wCoarse = nCoarse, nProbe = nFine): candidates are exact, so this
      // must reproduce bitext_mine's answer bit-for-bit through an
      // entirely different candidate plan (ccell/fcell equi-joins, coarse
      // literal only)
      val e = Tables.embeddings(s, dir)
      Bitext.minePairs2(
        e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_vec")),
        e.where(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec")),
        k = 4, tau = 1.0, nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8)
    }),
    // rung-picker auto twins: the caller's dial here is full-open
    // (nProbe = nCells), so BOTH rungs are exact and the brute-force
    // margin oracle serves auto on either side of the threshold —
    // auto2's derived params (nCoarse = wCoarse = ⌈√8⌉ = 3) are exactly
    // bitext_mine2's registered settings
    "bitext_mine_auto" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.embeddings(s, dir)
      Bitext.minePairsAuto(
        e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_vec")),
        e.where(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec")),
        k = 4, tau = 1.0, nCells = 8, nProbe = 8)
    }),
    "bitext_mine_auto2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.embeddings(s, dir)
      Bitext.minePairsAuto(
        e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_vec")),
        e.where(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec")),
        k = 4, tau = 1.0, nCells = 8, nProbe = 8, flatCellMax = 0)
    }),
    // incremental mining: NEW src batch (hash bucket >= 50 of the even
    // half) against the stored odd-half target corpus; quantizer anchored
    // to the corpus side, full probe ⇒ the brute-force margin oracle over
    // the sliced src side
    "bitext_mine_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val batch = Tables.embeddings(s, dir)
        .where(col("vec_id") % 2 === 0 &&
          graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
        .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
      Bitext.minePairsIncremental(batch, Bitext.tgtSide(s, dir),
        k = 4, tau = 1.0, nCells = 8, nProbe = 8)
    }),
    "bitext_mine_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val batch = Tables.embeddings(s, dir)
        .where(col("vec_id") % 2 === 0 &&
          graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
        .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
      Bitext.minePairsIncrementalIndexed(s, dir, batch,
        k = 4, tau = 1.0, nCells = 8, nProbe = 8)
    }),
    // the two-level incremental rung at FULL-OPEN settings (wCoarse =
    // nCoarse, nProbe = nFine): exact candidates, so both the inline and
    // the three-stored-layer indexed form share the incremental
    // brute-force oracle verbatim
    "bitext_mine_incremental2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val batch = Tables.embeddings(s, dir)
        .where(col("vec_id") % 2 === 0 &&
          graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
        .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
      Bitext.minePairsIncremental2(batch, Bitext.tgtSide(s, dir),
        k = 4, tau = 1.0, nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8)
    }),
    "bitext_mine_incremental_indexed2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val batch = Tables.embeddings(s, dir)
        .where(col("vec_id") % 2 === 0 &&
          graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
        .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
      Bitext.minePairsIncrementalIndexed2(s, dir, batch,
        k = 4, tau = 1.0, nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8)
    }),
    // the stored-index rung picker for the incremental mine: both sides
    // full-open ⇒ exact candidates ⇒ the incremental brute-force oracle
    // verbatim either way (the build picks the stored layout from nCells)
    "bitext_mine_incr_indexed_auto" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val batch = Tables.embeddings(s, dir)
        .where(col("vec_id") % 2 === 0 &&
          graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
        .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
      Bitext.minePairsIncrementalIndexedAuto(s, dir, batch,
        k = 4, tau = 1.0, nCells = 8, nProbe = 8)
    }),
    "bitext_mine_incr_indexed_auto2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val batch = Tables.embeddings(s, dir)
        .where(col("vec_id") % 2 === 0 &&
          graft.operators.Sampling.hashBucket(col("vec_id")) >= 50)
        .select(col("vec_id").as("src_id"), col("embedding").as("src_vec"))
      Bitext.minePairsIncrementalIndexedAuto(s, dir, batch,
        k = 4, tau = 1.0, nCells = 8, nProbe = 8, flatCellMax = 0)
    }),
    "bitext_hubness" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // the diagnostic that motivates the margin: top hub targets by
      // forward-kNN membership count, full probe ⇒ brute-force oracle
      val e = Tables.embeddings(s, dir)
      Bitext.hubness(
        e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_vec")),
        e.where(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec")),
        k = 4, nCells = 8, nProbe = 8, topN = 20)
    }),
    // the audit's two-level rung at full-open — exact, so it shares the
    // brute-force hub-count oracle verbatim
    "bitext_hubness2" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.embeddings(s, dir)
      Bitext.hubness2(
        e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_vec")),
        e.where(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_vec")),
        k = 4, nFine = 8, nCoarse = 3, wCoarse = 3, nProbe = 8, topN = 20)
    }),
    "ivf_topk" -> ((s, dir) => Ann.ivfTopk(s, dir, 0L, 10, 16, 4)),
    "ivf_recall" -> ((s, dir) => Ann.ivfRecall(s, dir, 8, 10, 16, 4)),
    "ann_range" -> ((s, dir) => Ann.annRange(s, dir, 0L, 0.2)),
    "ivf_topk_indexed" -> ((s, dir) => Ann.ivfTopkIndexed(s, dir, 0L, 10, 16, 4)),
    "ivf_train_step" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.embeddings(s, dir)
      val cents = e.where(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(col("embedding")).collect().map(_.getSeq[Double](0).toSeq).toSeq
      Ann.kmeansStep(e, cents)
    }),
    // full Lloyd training + trained-index probe: with tol = 0 the loop
    // exits only at a 9-dp fixpoint, so the fixed-depth unrolled oracle
    // (ivfTrainChainSql) is exact — see trainCentroids' scaladoc;
    // fixpoint/stability laws are additionally pinned in OperatorEdgeSpec
    "ivf_train_full" -> ((s, dir) => {
      val (cents, _) = Ann.trainCentroids(Tables.embeddings(s, dir), 16, maxIters = 10)
      Ann.centroidsToDF(s, cents).orderBy("cell", "pos")
    }),
    "ivf_topk_trained" -> ((s, dir) => Ann.ivfTopkTrained(s, dir, 0L, 10, 16, 4)),
    // one Lloyd step of PQ codebook training from the seeded codebook —
    // the ivf_train_step device for the subquantizers: the oracle
    // re-derives the per-subspace L2 argmin (first index on ties) and the
    // 9-dp mean update, so a mis-sliced subspace or a drifted tie rule
    // breaks every row
    "pq_train_step" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Ann.pqTrainStep(e, Ann.pqCodebook(e, m = 8, kCodes = 16, dim = 64))
    }),
    // full PQ training (3 Lloyd iterations): the ivf_train_full device —
    // the fixed-depth unrolled oracle is exact because the Scala loop only
    // exits early at a 9-dp fixpoint, where every further step is the
    // identity (same codes ⇒ same rounded means); the empty-code fallback
    // (a code that loses all members keeps its previous centroid) is the
    // chained coalesce in SQL
    "pq_train_full" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val (cb, _) = Ann.trainPqCodebook(Tables.embeddings(s, dir),
        m = 8, kCodes = 16, dim = 64, maxIters = 3)
      Ann.pqCodebookToDF(s, cb).orderBy(col("s"), col("code"), col("p"))
    }),
    "ivf_topk2" -> ((s, dir) => Ann.ivfTopk2(s, dir, 0L, 10, 16, 4, 2, 4)),
    "ivf_topk2_indexed" -> ((s, dir) => Ann.ivfTopk2Indexed(s, dir, 0L, 10, 16, 4, 2, 4)),
    // rung-picker auto twins: flat side = ivf_topk's oracle verbatim;
    // forced two-level side = the ivfTopk2Sql generator at the derived
    // params (nFine = 16, nCoarse = wCoarse = ⌈√16⌉ = 4 — coarse full-open)
    "ivf_topk_auto" -> ((s, dir) => Ann.ivfTopkAuto(s, dir, 0L, 10, 16, 4)),
    "ivf_topk_auto2" -> ((s, dir) =>
      Ann.ivfTopkAuto(s, dir, 0L, 10, 16, 4, flatCellMax = 0)),
    // the STORED-index rung picker: flat side = ivf_topk_indexed's oracle
    // (same stored flat layout); forced side = the two-level layout at the
    // derived params — the build picks the layout, the probe follows it
    "ivf_topk_auto_indexed" -> ((s, dir) =>
      Ann.ivfTopkIndexedAuto(s, dir, 0L, 10, 16, 4)),
    "ivf_topk_auto_indexed2" -> ((s, dir) =>
      Ann.ivfTopkIndexedAuto(s, dir, 0L, 10, 16, 4, flatCellMax = 0)),
    "ivf_delta_topk" -> ((s, dir) => Ann.ivfDeltaTopk(s, dir, 0L, 10, 16, 4)),
    "ivf_retrain_on_recall" -> ((s, dir) => Ann.ivfRetrainOnRecall(s, dir)),
    "pq_err"  -> ((s, dir) => Ann.pqError(s, dir)),
    "pq_topk" -> ((s, dir) => Ann.pqTopk(s, dir, 0L, 10)),
    "pq_topk_indexed" -> ((s, dir) => Ann.pqTopkIndexed(s, dir, 0L, 10)),
    "ivfpq_topk" -> ((s, dir) => Ann.ivfPqTopk(s, dir, 0L, 10)),
    "ivfpq_recall" -> ((s, dir) => Ann.ivfPqRecall(s, dir, 8, 10, 16, 4)),
    "embed_label_stats" -> ((s, dir) => EmbeddingStats.perLabelCohesion(Tables.embeddings(s, dir))),
    "knn_label_audit" -> ((s, dir) => EmbeddingStats.knnLabelAudit(Tables.embeddings(s, dir))),
    "retrieval_eval" -> ((s, dir) => EmbeddingStats.retrievalEval(Tables.embeddings(s, dir))),
    "dim_recall" -> ((s, dir) => EmbeddingStats.dimRecall(Tables.embeddings(s, dir))),
    "embed_drift" -> ((s, dir) => EmbeddingStats.embedDrift(Tables.embeddings(s, dir))),
    "embed_covariance" -> ((s, dir) => EmbeddingStats.covariance(Tables.embeddings(s, dir))),
    "embed_spectrum" -> ((s, dir) => EmbeddingStats.spectrum(Tables.embeddings(s, dir))),
    "quality_sample" -> ((s, dir) => Sampling.qualitySample(Tables.documents(s, dir))),
    "topic_balance" -> ((s, dir) => Sampling.topicBalance(Tables.documents(s, dir))),
    "source_mix" -> ((s, dir) => Sampling.sourceMixture(Tables.documents(s, dir))),
    "pack_sequences" -> ((s, dir) => Sampling.packSequences(Tables.documents(s, dir))),
    "cell_sample" -> ((s, dir) => Sampling.cellBalancedSample(Tables.embeddings(s, dir))),
    "user_sequences" -> ((s, dir) => Sessionize.userSequences(Tables.events(s, dir))),
    "embed_norm_quantiles" -> ((s, dir) => EmbeddingStats.normQuantiles(Tables.embeddings(s, dir))),
    "embed_quantize_err" -> ((s, dir) => EmbeddingStats.quantizationError(Tables.embeddings(s, dir))),
    "multimodal_meta" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      Multimodal.decodeMeta(s,
        Tables.documents(s, dir).select(col("doc_id"), col("text").cast("binary").as("blob")))
        .orderBy(col("doc_id"))
    }),
    "dedup_image_near" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length, octet_length}
      // the oracle pins the fake (byte-grid) arm on ASCII-pure docs — the
      // multimodal_meta device; the ImageIO arm is fixture-pinned in
      // MultimodalSpec
      Dedup.imageNear(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"), col("text").cast("binary").as("blob")))
    }),
    "dedup_image" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length, octet_length}
      Dedup.imageDedup(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"), col("text").cast("binary").as("blob")))
    }),
    "dedup_image_auto" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length, octet_length}
      // agreeBands = 0 → AUTO t from the distinct-hash count
      // (Dedup.autoAgreeBands). Any clamped t is lossless, so this shares
      // dedup_image's oracle — and because the auto pick CHANGES with
      // corpus size (sf0.001 → t=1, sf0.01 → t=2), the cross-scale runs
      // exercise different candidate paths against the same brute-force
      // pair set, pinning t-independence end-to-end.
      Dedup.imageDedup(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"), col("text").cast("binary").as("blob")),
        agreeBands = 0)
    }),
    "dedup_video" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // cross-MODALITY dedup: each doc appears as a raw blob (the fake
      // byte-grid arm) AND as an MP4-wrapped video whose first sample is
      // the same bytes (the real container walk, offset ids). grayGrid
      // hashes the SAMPLE, so every video twin lands in its still's exact-
      // hash group and the components are the dedup_image components with
      // both arms as members — one mis-parsed stbl offset and every video
      // row escapes its cluster
      val header = Multimodal.mp4VideoHeader()
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")))
      Dedup.imageDedup(s,
        base.select(col("doc_id"), col("text").cast("binary").as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))))
    }),
    "audio_near" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // same synthetic-WAV device as multimodal_audio: the envelope and
      // the signature chain both run on the REAL operator path. Bucket
      // slice: text-derived envelopes cluster hard (few loudness levels),
      // so the PAIR OUTPUT on the full table is ~6% dense — quadratic by
      // its own size on both engines (the imageNear pair-output lesson);
      // the slice keeps the oracle meaningful at linear cost
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      Dedup.audioNear(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")) &&
            graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
          .select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob")),
        maxBytes = 512)
    }),
    "audio_shift_near" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // the shift-robustness proof IS the corpus: every sliced doc appears
      // twice — as-is, and delayed by 12 zero SAMPLES (24 zero bytes; 12
      // is 3 hops but NOT a multiple of the 16-sample window, exactly the
      // misalignment that defeats the aligned envelope of audio_near) —
      // and the operator must re-pair each doc with its own delayed twin
      // through landmark keys + offset voting. Same slice/byte budget as
      // audio_near.
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      val zeros = Array.fill[Byte](24)(0)
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.audioLandmarkNear(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), lit(zeros), col("text").cast("binary")).as("blob"))),
        maxBytes = 512)
    }),
    "audio_auto_near" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // the shift-twin corpus saturates the pair key (measured mean
      // bucket 18.4 > 16), so the auto mine must take the TRIPLE branch
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      val zeros = Array.fill[Byte](24)(0)
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.audioLandmarkNearAuto(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), lit(zeros), col("text").cast("binary")).as("blob"))),
        maxBytes = 512)
    }),
    "audio_key_audit" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // the keyPeaks decision rule measured on the audio_shift_near corpus:
      // audit the pair-form landmark key distribution BEFORE mining
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      val zeros = Array.fill[Byte](24)(0)
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.landmarkKeyAudit(Multimodal.audioLandmarks(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), lit(zeros), col("text").cast("binary")).as("blob"))),
        maxBytes = 512))
    }),
    "audio_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // the TREATMENT form over the same shift-twin corpus: every doc must
      // land in one component with its delayed twin (keep = the original),
      // via envelope collapse + landmark mine among reps + components
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      val zeros = Array.fill[Byte](24)(0)
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.audioDedup(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), lit(zeros), col("text").cast("binary")).as("blob"))),
        maxBytes = 512)
    }),
    "audio_dedup_auto" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // the treatment form's branching device: the shift-twin corpus
      // saturates the REPS' pair key space (the reps are nearly all docs —
      // a delayed twin has a different envelope), so the self-dialed mine
      // must take the triple branch and STILL re-pair every doc with its
      // delayed twin; the oracle re-derives the audit and gates both vote
      // chains on it inside the audio_dedup component walk
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      val zeros = Array.fill[Byte](24)(0)
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.audioDedupAuto(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), lit(zeros), col("text").cast("binary")).as("blob"))),
        maxBytes = 512)
    }),
    "multimodal_audio" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // real PCM content decode over a synthetic-but-real WAV corpus: each
      // ASCII-pure document's bytes become the 16-bit sample payload behind
      // a canonical header (the header OVER-declares its data size — the
      // parser's clamp-to-present-bytes arm is on the oracle path), capped
      // at 512 payload bytes to pin the byte-budget arm too
      val header = Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
      Multimodal.audioStats(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob")),
        maxBytes = 512)
        .orderBy(col("doc_id"))
    }),
    "multimodal_video" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // video CONTENT decode via the canonical over-declaring container
      // (the pcmWavHeader device, video edition): each ASCII-pure doc's
      // bytes are the single video sample behind a CONSTANT ISO-BMFF
      // prefix — the operator must walk moov/trak/mdia/minf/stbl, read
      // stsz/stco, clamp the over-declared sample to the present bytes,
      // and hash the SAMPLE; the oracle re-derives the dHash from the raw
      // text, so a single mis-parsed offset breaks every row
      val header = Multimodal.mp4VideoHeader()
      Multimodal.imagePHash(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob")))
        .orderBy(col("doc_id"))
    }),
    "multimodal_video_frames" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // multi-frame content decode: the frames header declares uniform
      // 32-byte samples in one chunk, so sample i of each wrapped doc IS
      // text[i*32, (i+1)*32) and the oracle re-derives every frame hash
      // from substr slices — one mis-walked stsz/stco offset or a broken
      // within-chunk running sum breaks every row past frame 0
      val header = Multimodal.mp4VideoFramesHeader()
      Multimodal.videoFrameHashes(s,
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob")))
        .orderBy(col("doc_id"), col("frame_no"))
    }),
    "dedup_video_frames" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, md5, octet_length}
      // the re-cut robustness proof IS the corpus (the audio_shift_near
      // device for video): every sliced doc appears as an n-frame video
      // AND as the same video re-introed with one junk frame (its md5 hex
      // — 32 bytes, unique per doc) prepended. The twin's FIRST sample
      // differs by construction, so first-sample clustering (dedup_video)
      // provably misses every twin pair; the frame vote must recover each
      // at offset -1 with votes = the shared frame count
      val header = Multimodal.mp4VideoFramesHeader()
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.videoNear(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), md5(col("text")).cast("binary"),
              col("text").cast("binary")).as("blob"))))
    }),
    "dedup_video_frames_near" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, md5, octet_length}
      // the banded-Hamming widening over the same re-intro corpus: frames
      // pair at popcount <= 3 instead of exact equality, so the vote chain
      // admits near-matching frames too — the oracle brute-forces the
      // Hamming vote (band-subset keys are lossless at maxHamming <=
      // bands - t, so the banded plan must return exactly these rows)
      val header = Multimodal.mp4VideoFramesHeader()
      // bucket < 5 (vs the exact form's 20): the banded join pays
      // C(bands,t) key rows per frame and its verify is popcount-wide, so
      // the oracle-checked slice is kept at the quarter corpus — measured
      // 53 s at the sf0.1 20-bucket slice vs ~4 s here, same semantics
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 5)
      Dedup.videoNearHamming(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), md5(col("text")).cast("binary"),
              col("text").cast("binary")).as("blob"))))
    }),
    "video_still_match" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, expr, length, lit, octet_length}
      // the CROSS-MODAL device: videos are the sliced-doc corpus (sample i
      // = text[i*32,(i+1)*32)); images are frame-1 slices of the bucket<10
      // docs, odd ids with byte 6 swapped to '~' (a bounded gradient tweak
      // — flips <= 2 dHash bits, so the NEAR arm is live, not just exact
      // equality). The oracle re-derives BOTH hash passes and brute-forces
      // the cross-side Hamming verify — banding is lossless at
      // maxHamming <= bands - t, so the banded mine must return exactly
      // the brute-forced verdict rows
      val header = Multimodal.mp4VideoFramesHeader()
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 64 &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      val videos = base.select(col("doc_id"),
        concat(lit(header), col("text").cast("binary")).as("blob"))
      val images = base
        .where(graft.operators.Sampling.hashBucket(col("doc_id")) < 10)
        .select(col("doc_id"), expr(
          """cast(CASE WHEN doc_id % 2 = 1
            |     THEN concat(substring(substring(text, 33, 32), 1, 5), '~',
            |                 substring(substring(text, 33, 32), 7))
            |     ELSE substring(text, 33, 32) END as binary)""".stripMargin)
          .as("blob"))
      Dedup.videoStillMatches(s, videos, images, maxHamming = 6)
    }),
    "video_still_match_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, expr, length, lit, octet_length}
      // the catalog-indexed cross-modal probe: stills come from the
      // REGISTRY-PINNED distinct-phash index of the bucket<50 documents
      // slice (imageIncrementalIndexed's table — one index, two
      // consumers); videos carry 64-byte frames so frame 0's byte grid
      // equals its source doc's still grid exactly (the EXACT arm), with
      // odd ids byte-6-tweaked (≤ 2 dHash bits — the NEAR arm) and
      // bucket≥90 docs outside the index (the keep arm). The oracle
      // re-derives the index content, both hash passes, and the
      // brute-forced cross-side Hamming verify
      val header = Multimodal.mp4VideoFramesHeader(frameBytes = 64)
      val b = graft.operators.Sampling.hashBucket(col("doc_id"))
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 64)
      val tweaked = expr(
        """CASE WHEN doc_id % 2 = 1
          |     THEN concat(substring(text, 1, 5), '~', substring(text, 7))
          |     ELSE text END""".stripMargin)
      val videos = base.where(b < 10)
          .select(col("doc_id"), concat(lit(header), tweaked.cast("binary")).as("blob"))
        .unionByName(base.where(b >= 90)
          .select(col("doc_id"), concat(lit(header), col("text").cast("binary")).as("blob")))
      Dedup.videoStillMatchesIndexed(s, dir, videos, maxHamming = 6)
    }),
    "video_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, md5, octet_length}
      // the treatment form's three-arm corpus: each sliced doc as an
      // n-frame video (A), its re-introed near twin (B, one md5-hex junk
      // frame prepended), and a byte-identical re-mux stand-in (C — same
      // frame-hash sequence as A, so it must COLLAPSE with A before the
      // mine); components must be {A, B, C} with A as the keeper
      val header = Multimodal.mp4VideoFramesHeader()
      val base = Tables.documents(s, dir)
        .where(octet_length(col("text")) === length(col("text")) &&
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
      Dedup.videoDedup(s,
        base.select(col("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))
          .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
            concat(lit(header), md5(col("text")).cast("binary"),
              col("text").cast("binary")).as("blob")))
          .unionByName(base.select((col("doc_id") + lit(200000L)).as("doc_id"),
            concat(lit(header), col("text").cast("binary")).as("blob"))))
    }),
    "image_key_audit" -> ((s, dir) =>
      // the phash key-space audit over the saturating replica corpus:
      // 20 duplicate classes of ~25 docs each, so est_candidates/n_images
      // ≈ 25 > 16 — the quadratic-pair-output regime, measured as one row
      Dedup.phashKeyAudit(Multimodal.imagePHash(s,
        imageSaturatedCorpus(s, dir)))),
    "image_near_auto" -> ((s, dir) =>
      // the self-dialing escape: the audit's fan-out rule gates the full
      // pair chain vs the rep mine — this corpus saturates, so the
      // REP-PAIR arm is the live one; the oracle re-derives the rule and
      // gates both chains on it (the video_near_auto device, image edition)
      Dedup.imageNearAuto(s, imageSaturatedCorpus(s, dir))),
    "minhash_key_audit" -> ((s, dir) =>
      // the band-key-space audit over the saturating replica-crawl text
      // corpus: 20 exact-duplicate classes sharing every band key, so
      // est_candidates/n_docs ≈ bands·class-size ≫ 16 — the quadratic-
      // candidate regime, measured as one row
      Dedup.minhashKeyAudit(textSaturatedCorpus(s, dir))),
    "minhash_near_auto" -> ((s, dir) =>
      // the self-dialing escape for the word-level text family: the
      // audit's fan-out rule gates the full banded chain vs the sha-256
      // exact-collapse REP mine — this corpus saturates, so the rep arm
      // is the live one; the oracle re-derives the rule and gates both
      // chains on it (the image_near_auto device, text edition)
      Dedup.minhashNearAuto(textSaturatedCorpus(s, dir))),
    "ngram_key_audit" -> ((s, dir) =>
      // same audit over the char-8-gram family's 4-band keys
      Dedup.ngramKeyAudit(textSaturatedCorpus(s, dir))),
    "ngram_near_auto" -> ((s, dir) =>
      // the char-shingle edition of minhash_near_auto (shared branch
      // helper in Dedup.textNearAutoFrom; tau 0.5, 4 bands of r=3)
      Dedup.ngramNearAuto(textSaturatedCorpus(s, dir))),
    "minhash_dedup" -> ((s, dir) =>
      // the collapse-first TREATMENT form on the replica corpus: exact
      // groups collapse to min-id reps, the banded mine pairs reps only,
      // member verdicts restore through the fingerprint groups — the
      // oracle re-derives collapse + rep mine + restore and must agree
      // doc-for-doc (keepers = each class's A-variant rep)
      Dedup.minhashDedup(textSaturatedCorpus(s, dir))),
    "ngram_dedup" -> ((s, dir) =>
      // the char-shingle treatment twin (4 bands, tau 0.5)
      Dedup.ngramDedup(textSaturatedCorpus(s, dir))),
    "verbatim_overlap" -> ((s, dir) =>
      // pair-level exact-substring detection over the quote device: each
      // bucket<10 doc carries an appended 8-word CLASS QUOTE (doc_id % 3),
      // so same-class quoted pairs share a verbatim 8-token run — the
      // oracle re-derives positional shingles + the diagonal island merge
      Dedup.verbatimOverlap(quoteOverlapCorpus(s, dir), minRunTokens = 8)),
    "shared_runs" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit}
      // the composable form: run lengths RESTRICTED to supplied candidate
      // pairs (doc_id, doc_id+3 — same quote class mod 3, so some pairs
      // carry the 8-token run and cross-bucket ones report the ZERO row,
      // exercising the left-join fill)
      val corpus = quoteOverlapCorpus(s, dir)
      Dedup.sharedRunsFor(corpus,
        corpus.select(col("doc_id").as("a_id"),
          (col("doc_id") + lit(3L)).as("b_id")))
    }),
    "overlap_key_audit" -> ((s, dir) =>
      // the positional-shingle saturation probe over the replica-crawl
      // corpus: byte-identical docs share every shingle at every
      // position, so est_candidates/n_positions ≫ 16 — measured as one row
      Dedup.overlapKeyAudit(textSaturatedCorpus(s, dir))),
    "verbatim_overlap_auto" -> ((s, dir) =>
      // the self-dialing replica escape for the positional family: the
      // audit's fan-out rule gates the full co-occurrence chain vs the
      // sha-256 rep mine — this corpus saturates, so the rep arm is live;
      // class variants share their 6-token prefix run (island of 2
      // five-word shingles)
      Dedup.verbatimOverlapAuto(textSaturatedCorpus(s, dir), minRunTokens = 6)),
    "verbatim_overlap_dfcap" -> ((s, dir) =>
      // the BOILERPLATE escape over the template-header device: the
      // shared header's hot postings (occ ~100 > 64) are cut — no pair
      // forms on header-only overlap — while each class's 8-token quote
      // (occ ~17) survives verbatim; the oracle re-derives the occurrence
      // cut, the capped co-occurrence join, and the island merge
      Dedup.verbatimOverlapDfCap(boilerplateCorpus(s, dir),
        minRunTokens = 8, maxDf = 64)),
    "verbatim_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // the against-seen-corpus rung over the quote corpus: incoming =
      // bucket [5,15) — its QUOTED half ([5,10)) shares its class's
      // 8-token quote with the reference's quoted slice (bucket<5) and is
      // dropped, its UNQUOTED half ([10,15)) admits unless a natural run
      // reaches 8 — BOTH verdict arms live by construction
      val qc = quoteOverlapCorpus(s, dir)
      val b = graft.operators.Sampling.hashBucket(col("doc_id"))
      Dedup.verbatimIncremental(qc.where(b >= 5 && b < 15),
        qc.where(b < 5 || b >= 15), minRunTokens = 8)
    }),
    "decontaminate_runs" -> ((s, dir) =>
      // run-length decontamination over the two-sided quote device:
      // quotes sit on bucket<10 (lands in the train slice) AND bucket>=90
      // (the eval slice), so quoted train docs CONTAIN an eval passage of
      // exactly 8 tokens — contaminated by the run rule at minRun 8
      Dedup.decontaminateRuns(decontamRunsCorpus(s, dir), minRunTokens = 8)),
    "decontaminate_runs_capped" -> ((s, dir) =>
      // the eval-template false-positive regime and its cap: bucket
      // [20,30) docs share only the benchmark's FORMAT and flag uncapped;
      // with maxEvalDf = 20 the template's hot eval postings are cut and
      // only content quotes (and natural replicas) flag — the oracle
      // re-derives the eval-side occurrence cut
      Dedup.decontaminateRuns(templateDecontamCorpus(s, dir),
        minRunTokens = 8, maxEvalDf = 20)),
    "decontaminate_trim_indexed" -> ((s, dir) =>
      // the TREATMENT against the stored eval index over the raw corpus:
      // natural replicas straddling the bucket split trim their shared
      // runs (full replicas to ""), everything else passes through —
      // inline-vs-indexed identity is the index-correctness proof
      Dedup.decontaminateTrimIndexed(s, dir, Tables.documents(s, dir))),
    "decontaminate_runs_indexed" -> ((s, dir) =>
      // the eval suite as a REGISTRY-PINNED posting index (benchmarks are
      // fixed artifacts — shingled once, probed by every corpus
      // snapshot): raw documents, where natural replicas straddling the
      // train/eval buckets carry the >= 13-token runs that make both
      // verdict arms live; the oracle re-derives postings, the cross-side
      // island merge, and the per-train aggregate
      Dedup.decontaminateRunsIndexed(s, dir, Tables.documents(s, dir))),
    "eval_leak_report" -> ((s, dir) =>
      // the flip side, keyed by the BENCHMARK doc: which eval items are
      // compromised (how many train docs verbatim-contain them, longest
      // run) — same natural-replica corpus, sides swapped
      Dedup.evalLeakReport(Tables.documents(s, dir))),
    "eval_leak_report_indexed" -> ((s, dir) =>
      // the report's indexed rung: the benchmark's postings come from the
      // SAME stored table decontaminate_runs_indexed probes (one
      // evalPosIndex entry, three consumers) — per corpus snapshot only
      // the train side re-shingles
      Dedup.evalLeakReportIndexed(s, dir, Tables.documents(s, dir))),
    "verbatim_incremental_indexed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // the indexed twin probes the STORED positional postings of the
      // bucket<50 warehouse slice; the raw corpus's natural replicas
      // carry runs to 93 tokens, so both verdict arms are live at the
      // 20-token rule without any engineered quotes
      Dedup.verbatimIncrementalIndexed(s, dir,
        Tables.documents(s, dir)
          .where(graft.operators.Sampling.hashBucket(col("doc_id")) >= 50))
    }),
    "decontaminate_trim" -> ((s, dir) =>
      // the decontamination TREATMENT over the same two-sided quote
      // device: quoted train docs lose exactly their appended eval
      // passage (plus any natural >= 8-token shared run), everything
      // else passes through byte-identical — the span_trim reassembly,
      // eval-targeted
      Dedup.decontaminateTrim(decontamRunsCorpus(s, dir), minRunTokens = 8)),
    "simhash_key_audit" -> ((s, dir) =>
      // the sign-plane band-key audit over the saturating replica
      // embedding corpus (every vector replaced by its class rep's —
      // duplicate docs embedded twice, the replica mechanism in
      // embedding space)
      Dedup.simhashKeyAudit(embeddingSaturatedCorpus(s, dir))),
    "simhash_near_auto" -> ((s, dir) =>
      // the embedding-family escape: past the fan-out rule the mine
      // collapses FULL-bit-signature twins (lossless for banding — same
      // simhash ⇒ same key in every band) to min-id reps; the oracle
      // gates both cosine-verified chains on the re-derived rule
      Dedup.simhashNearAuto(embeddingSaturatedCorpus(s, dir))),
    "semantic_key_audit" -> ((s, dir) =>
      // the distinct-embedding group audit: Σ|group|² is the within-cell
      // pair volume the hot-cell split provably cannot cut (identical
      // vectors share every sub-bucket in every band)
      Dedup.embedKeyAudit(embeddingSaturatedCorpus(s, dir))),
    "dedup_semantic_auto_sat" -> ((s, dir) =>
      // the SemDeDup escape on the replica corpus: past the fan-out rule
      // the rung runs over min-id reps of each distinct embedding and
      // members inherit the rep verdicts (cell space = the rep slice's
      // DISTINCT seed window — the declared trade, re-derived in SQL)
      Dedup.semanticDedupAuto(embeddingSaturatedCorpus(s, dir))),
    "video_key_audit" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, length, lit, octet_length}
      // the fhash key-space audit over the saturating intro-card corpus
      // (frames alternate a constant 'z'*32 card with doc content slices):
      // the constant frame makes one corpus-hot bucket, so est_candidates
      // is quadratic-ish — the measured decision quantity, as an oracle row
      Dedup.videoKeyAudit(Multimodal.videoFrameHashes(s,
        videoSaturatedCorpus(s, dir)))
    }),
    "video_near_auto" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // the self-dialing mine: the audit's fan-out (est_candidates /
      // n_frames) gates which vote chain produces rows — this corpus
      // saturates (fan-out ≫ 16), so the BIGRAM chain is the live arm
      // (its first oracle exercise); the oracle re-derives the rule and
      // gates both chains on it
      Dedup.videoNearHammingAuto(s, videoSaturatedCorpus(s, dir))
    }),
    "video_dedup_auto" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      // the treatment form's branching device: the intro-card corpus
      // saturates the REPS' frame-hash space (re-cut twins are distinct
      // fingerprints, so collapse does not absorb the hot card), and the
      // self-dialed rep mine must take the bigram chain and STILL group
      // each twin with its base — the audio_dedup_auto shape, video
      // edition; the oracle gates both rep vote chains on the audit rule
      Dedup.videoDedupAuto(s, videoSaturatedCorpus(s, dir))
    }),
    "multimodal_frames" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length, md5, octet_length}
      // ASCII-pure docs only: the operator slices BYTES (its domain is real
      // binary), but DuckDB cannot slice BLOBs, so the oracle-checked view
      // is restricted to rows where bytes == chars in BOTH engines
      Multimodal.frameSample(
        Tables.documents(s, dir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id"), col("text").cast("binary").as("blob")),
        n = 4, frameBytes = 32)
        .select(col("doc_id"), col("frame_no").cast("bigint").as("frame_no"),
          md5(col("frame")).as("frame_fp"),
          length(col("frame")).cast("bigint").as("frame_len"))
        .orderBy(col("doc_id"), col("frame_no"))
    }),
    "events_windowed" -> ((s, dir) =>
      graft.streaming.Streaming.eventCounts(Tables.events(s, dir),
        watermark = None, approxDistinct = false)),
    "events_json" -> ((s, dir) =>
      graft.streaming.Streaming.propsStats(Tables.events(s, dir))),
    "pricing_summary"   -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "revenue_by_nation" -> ((s, dir) => Relational.revenueByNation(s, dir)),
    "part_type_revenue" -> ((s, dir) => Relational.partTypeRevenueByRegion(s, dir)),
    "top_types_per_region" -> ((s, dir) => Relational.topTypesPerRegion(s, dir, 3)),
    "top_customers"     -> ((s, dir) => Relational.topCustomers(s, dir, 20)),
    "orders_no_lineitem" -> ((s, dir) => Relational.ordersWithoutLineitems(s, dir)),
    "active_customers"  -> ((s, dir) => Relational.activeCustomers(s, dir)),
    "revenue_rollup"    -> ((s, dir) => Relational.revenueRollup(s, dir)),
    "events_pivot"      -> ((s, dir) => Relational.eventsPivot(Tables.events(s, dir))),
    "shipping_priority" -> ((s, dir) => Relational.shippingPriority(s, dir)),
    "asof_purchase_click" -> ((s, dir) => AsofJoin.eventsAsof(Tables.events(s, dir))),
    "sessions" -> ((s, dir) => Sessionize.sessions(Tables.events(s, dir))),
    "retention" -> ((s, dir) => Sessionize.retentionCohorts(Tables.events(s, dir))),
    "funnel"   -> ((s, dir) => Funnel.conversion(Tables.events(s, dir))),
    "range_join_clicks" -> ((s, dir) => RangeJoin.eventCountsInRange(Tables.events(s, dir))),
    "attribution" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val ev = Tables.events(s, dir)
      graft.streaming.Streaming.attributeClicks(
          ev.where(col("event_type") === "click"),
          ev.where(col("event_type") === "purchase"))
        .orderBy(col("purchase_id"), col("click_id"))
    }),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL. Shared fragment: exact cosine over DOUBLE[] with the
  // reference's pinned semantics (zero-norm → 0.0), rounded to 6 dp —
  // mirrors graft.functions.CosineSimilarity (same sequential accumulation
  // order, so the doubles are bit-identical before rounding).
  // ---------------------------------------------------------------------
  /** The SATURATING video corpus for the auto-escape pair
    * (`video_key_audit` / `video_near_auto`): each ASCII-pure doc becomes a
    * video whose frames ALTERNATE a constant 32-byte intro card ('z'×32 —
    * one corpus-hot fhash bucket, the letterboxed/black-lead-in analogue)
    * with the doc's own 32-byte text slices (selective), plus a re-introed
    * twin (one md5-hex junk frame prepended). Unigram frame keys saturate
    * (fan-out ≫ 16) while consecutive BIGRAMS stay doc-selective — the
    * exact regime [[graft.operators.Dedup.videoNearHammingAuto]] exists
    * to catch. */
  /** The two-snapshot construction shared by every `snapshot_*` query:
    * old = id-buckets <90 of the stored corpus, new = buckets >=10 with
    * [40,50) content-rewritten (` v2` appended) — so the diff's four
    * statuses are each non-empty by construction: added = [90,100),
    * removed = [0,10), changed = [40,50), unchanged = the rest. */
  private def snapshotPair(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val d = Tables.documents(s, dir)
    val b = graft.operators.Sampling.hashBucket(col("doc_id"))
    (d.where(b < 90),
      d.where(b >= 10).withColumn("text",
        when(b >= 40 && b < 50, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))))
  }

  private def videoSaturatedCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, expr, length, lit, md5, octet_length}
    val header = graft.operators.Multimodal.mp4VideoFramesHeader()
    val base = Tables.documents(s, dir)
      .where(octet_length(col("text")) === length(col("text")) &&
        length(col("text")) >= 32 &&
        graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
    val inter = expr(
      s"""array_join(transform(
         |  sequence(0, cast(least(8, (length(text)+31) div 32) as int) - 1),
         |  j -> concat('${"z" * 32}', substring(text, cast(j*32+1 as int), 32))), '')""".stripMargin)
    base.select(col("doc_id"),
        concat(lit(header), inter.cast("binary")).as("blob"))
      .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"),
        concat(lit(header), md5(col("text")).cast("binary"),
          inter.cast("binary")).as("blob")))
  }

  /** The SATURATING text corpus for the minhash/ngram audit pairs — the
    * replica-crawl regime: every doc's text maps to one of 10 duplicate
    * classes (doc_id % 10), six class-specific md5-chunk words, with the
    * odd decades appending one extra word (word-trigram Jaccard 0.8
    * between a class's two variants, 0 across classes). Exact-duplicate
    * groups of ~n/20 byte-identical texts share EVERY band key, so the
    * expected candidate fan-out per doc is ≈ bands·n/20 ≫ 16 — the
    * quadratic-candidate regime [[graft.operators.Dedup.minhashNearAuto]]
    * exists to catch. */
  private def textSaturatedCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    Tables.documents(s, dir).select(col("doc_id"), expr(
      """concat(concat_ws(' ',
        |    substring(md5(cast(doc_id % 10 as string)), 1, 5),
        |    substring(md5(cast(doc_id % 10 as string)), 6, 5),
        |    substring(md5(cast(doc_id % 10 as string)), 11, 5),
        |    substring(md5(cast(doc_id % 10 as string)), 16, 5),
        |    substring(md5(cast(doc_id % 10 as string)), 21, 5),
        |    substring(md5(cast(doc_id % 10 as string)), 26, 5)),
        |  CASE WHEN doc_id % 20 < 10 THEN '' ELSE ' zvariant' END)""".stripMargin).as("text"))
  }

  /** The verbatim-overlap device: bucket<20 docs, with each bucket<10 doc
    * carrying an appended 8-word CLASS QUOTE (8 four-hex-char words cut
    * from `md5(doc_id % 3)`) — known shared runs of exactly 8 tokens
    * within a quote class, zero engineered overlap across classes, and
    * the unquoted half contributing only natural text repeats (mirrored
    * exactly by the oracle's ground truth). */
  private def quoteOverlapCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, md5, substring, when}
    val b = graft.operators.Sampling.hashBucket(col("doc_id"))
    val quote = concat_ws(" ", (0 until 8).map(i =>
      substring(md5((col("doc_id") % 3).cast("string")), i * 4 + 1, 4)): _*)
    Tables.documents(s, dir).where(b < 20)
      .select(col("doc_id"),
        when(b < 10, concat(col("text"), lit(" "), quote))
          .otherwise(col("text")).as("text"))
  }

  /** The BOILERPLATE device for [[Dedup.verbatimOverlapDfCap]]: every
    * bucket<20 doc opens with the SAME 10-word template header (words cut
    * from `md5('hdr')` — the site-chrome mechanism: distinct documents,
    * shared shingles, which the sha-256 replica escape cannot collapse),
    * and the bucket<10 half additionally carries the 8-word class quote
    * of [[quoteOverlapCorpus]] — a genuine bounded-df verbatim run that
    * must SURVIVE the posting cut. At sf0.01 the header's pure shingles
    * occur ~100× (> maxDf 64 → cut), each quote class's ~17× (≤ 64 →
    * kept), so both arms of the declared semantics are live. */
  private def boilerplateCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, md5, substring, when}
    val b = graft.operators.Sampling.hashBucket(col("doc_id"))
    val header = concat_ws(" ", (0 until 10).map(i =>
      substring(md5(lit("hdr")), i * 3 + 1, 3)): _*)
    val quote = concat_ws(" ", (0 until 8).map(i =>
      substring(md5((col("doc_id") % 3).cast("string")), i * 4 + 1, 4)): _*)
    Tables.documents(s, dir).where(b < 20)
      .select(col("doc_id"),
        concat(header, lit(" "),
          when(b < 10, concat(col("text"), lit(" "), quote))
            .otherwise(col("text"))).as("text"))
  }

  /** The two-sided quote device for [[Dedup.decontaminateRuns]]: the
    * 8-word class quote (doc_id % 3) appended on bucket<10 (train-slice
    * members) AND bucket≥90 (the eval slice), over ALL documents — quoted
    * train docs verbatim-contain an eval passage. */
  private def decontamRunsCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, md5, substring, when}
    val b = graft.operators.Sampling.hashBucket(col("doc_id"))
    val quote = concat_ws(" ", (0 until 8).map(i =>
      substring(md5((col("doc_id") % 3).cast("string")), i * 4 + 1, 4)): _*)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(b < 10 || b >= 90, concat(col("text"), lit(" "), quote))
          .otherwise(col("text")).as("text"))
  }

  /** The BENCHMARK-TEMPLATE device for the capped run rule: eval docs
    * (bucket ≥ 90) carry a shared 10-word prompt TEMPLATE prefix plus
    * their class quote; bucket [20, 30) train docs carry the template
    * prefix only (crawl copies of the benchmark's FORMAT — the false
    * positive the cap exists for); bucket < 10 train docs quote eval
    * CONTENT (the true positive that must survive the cap). At sf0.01 the
    * template's pure shingles occur ~43× on the eval side (> maxEvalDf
    * 20 → cut) while each class quote's occur ~14× (≤ 20 → kept). */
  private def templateDecontamCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, md5, substring, when}
    val b = graft.operators.Sampling.hashBucket(col("doc_id"))
    val template = concat_ws(" ", (0 until 10).map(i =>
      substring(md5(lit("tpl")), i * 3 + 1, 3)): _*)
    val quote = concat_ws(" ", (0 until 8).map(i =>
      substring(md5((col("doc_id") % 3).cast("string")), i * 4 + 1, 4)): _*)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(b >= 90, concat(template, lit(" "), col("text"), lit(" "), quote))
          .when(b >= 20 && b < 30, concat(template, lit(" "), col("text")))
          .when(b < 10, concat(col("text"), lit(" "), quote))
          .otherwise(col("text")).as("text"))
  }

  /** The SATURATING embedding corpus for the simhash audit pair: every
    * vector replaced by its duplicate class representative's (vec_id %
    * 10) — byte-identical vectors share the full bit signature, so each
    * class shares EVERY band key — with the odd decades (vec_id % 20 ≥
    * 10) carrying a +1.0 nudge on component 0: a NEAR twin of its base
    * class (cosine ≈ 1, bit signature generally distinct — exact double
    * arithmetic, identical in both engines). */
  private def embeddingSaturatedCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val base = Tables.embeddings(s, dir)
    base.select(col("vec_id"), (col("vec_id") % 10).as("cls"),
        ((col("vec_id") % 20) >= 10).as("tweak"))
      .join(base.select(col("vec_id").as("cls"), col("embedding")), Seq("cls"))
      .select(col("vec_id"), expr(
        """CASE WHEN tweak
          |     THEN transform(embedding, (x, i) -> CASE WHEN i = 0 THEN x + 1.0D ELSE x END)
          |     ELSE embedding END""".stripMargin).as("embedding"))
  }

  /** The SATURATING image corpus for the phash audit pair: every doc's
    * blob is the md5 hex of its duplicate class (doc_id % 10), with
    * classes 10–19 carrying a one-byte tweak at position 4 (bounded
    * gradient change — each tweaked class is a NEAR twin of its base
    * class). ~25 docs per distinct grid ⇒ pair fan-out ≈ 25 ≫ 16: the
    * quadratic-pair-output regime [[graft.operators.Dedup.imageNearAuto]]
    * exists to catch. */
  private def imageSaturatedCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    Tables.documents(s, dir).select(col("doc_id"), expr(
      """cast(CASE WHEN doc_id % 20 < 10 THEN md5(cast(doc_id % 10 as string))
        |     ELSE concat(substring(md5(cast(doc_id % 10 as string)), 1, 3), '~',
        |                 substring(md5(cast(doc_id % 10 as string)), 5))
        |     END as binary)""".stripMargin).as("blob"))
  }

  /** The bucket<20 pure-ASCII universe the audio/video incremental splits
    * share (the audio oracles' cost slice), with its id-offset quantum. */
  private def mediaIncrementalBase(s: SparkSession, dir: String): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, length, lit, octet_length, max => smax}
    val base = Tables.documents(s, dir)
      .where(octet_length(col("text")) === length(col("text")) &&
        graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
    (base, base.agg(coalesce(smax(col("doc_id")), lit(0L))).head.getLong(0) + 1L)
  }

  /** Reference arm of the audio incremental split: bucket < 10 of the
    * universe, WAV-wrapped — exactly the slice
    * `audioIncrementalIndexed(refBucketMax = 10)` builds its state from,
    * so the indexed twin shares the inline oracle verbatim. */
  private def audioIncrementalReference(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val header = graft.operators.Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
    val (base, _) = mediaIncrementalBase(s, dir)
    base.where(graft.operators.Sampling.hashBucket(col("doc_id")) < 10)
      .select(col("doc_id"),
        concat(lit(header), col("text").cast("binary")).as("blob"))
  }

  /** Incoming arm of the audio incremental split: bucket >= 10 of the
    * universe, plus verbatim re-ingests of bucket < 2 (corpus hits via
    * the ENVELOPE arm), 12-sample-delayed copies of bucket < 2 (corpus
    * hits via the landmark VOTE arm only — the audio_shift_near
    * misalignment device), and verbatim copies of bucket >= 18 (in-batch
    * hits against their lower-id originals). */
  private def audioIncrementalIncoming(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val header = graft.operators.Multimodal.pcmWavHeader(8000, 1, 0x7FFFFFFFL)
    val zeros = Array.fill[Byte](24)(0)
    val (base, off) = mediaIncrementalBase(s, dir)
    val bucket = graft.operators.Sampling.hashBucket(col("doc_id"))
    def wav(d: DataFrame) = d.select(col("doc_id"),
      concat(lit(header), col("text").cast("binary")).as("blob"))
    wav(base.where(bucket >= 10))
      .unionByName(wav(base.where(bucket < 2)
        .withColumn("doc_id", col("doc_id") + lit(off))))
      .unionByName(base.where(bucket < 2)
        .withColumn("doc_id", col("doc_id") + lit(2L * off))
        .select(col("doc_id"),
          concat(lit(header), lit(zeros), col("text").cast("binary")).as("blob")))
      .unionByName(wav(base.where(bucket >= 18)
        .withColumn("doc_id", col("doc_id") + lit(3L * off))))
  }

  /** Reference arm of the video incremental split: bucket < 10 of the
    * universe as n-frame videos — the
    * `videoIncrementalIndexed(refBucketMax = 10)` state slice. */
  private def videoIncrementalReference(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val header = graft.operators.Multimodal.mp4VideoFramesHeader()
    val (base, _) = mediaIncrementalBase(s, dir)
    base.where(graft.operators.Sampling.hashBucket(col("doc_id")) < 10)
      .select(col("doc_id"),
        concat(lit(header), col("text").cast("binary")).as("blob"))
  }

  /** Incoming arm of the video incremental split: bucket >= 10, plus
    * verbatim re-ingests of bucket < 2 (corpus hits via the FINGERPRINT
    * arm and the vote arm both), re-INTROED copies of bucket < 2 (one
    * md5-hex junk frame prepended — a distinct fingerprint, so corpus
    * hits via the frame-VOTE arm only: the video_dedup re-cut device),
    * and verbatim copies of bucket >= 18 (in-batch hits). */
  private def videoIncrementalIncoming(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit, md5}
    val header = graft.operators.Multimodal.mp4VideoFramesHeader()
    val (base, off) = mediaIncrementalBase(s, dir)
    val bucket = graft.operators.Sampling.hashBucket(col("doc_id"))
    def mp4(d: DataFrame) = d.select(col("doc_id"),
      concat(lit(header), col("text").cast("binary")).as("blob"))
    mp4(base.where(bucket >= 10))
      .unionByName(mp4(base.where(bucket < 2)
        .withColumn("doc_id", col("doc_id") + lit(off))))
      .unionByName(base.where(bucket < 2)
        .withColumn("doc_id", col("doc_id") + lit(2L * off))
        .select(col("doc_id"),
          concat(lit(header), md5(col("text")).cast("binary"),
            col("text").cast("binary")).as("blob")))
      .unionByName(mp4(base.where(bucket >= 18)
        .withColumn("doc_id", col("doc_id") + lit(3L * off))))
  }

  /** Per-frame dHash derivation over a `vc(doc_id, text)` corpus CTE —
    * the multi-frame video oracle device: the frames container declares
    * uniform 32-byte samples in one chunk, so extracted sample i IS
    * `substr(text, i*32+1, 32)` (≤ 16 frames, final frame short) and each
    * frame's fake-arm dHash is the `multimodal_video` 8×7-gradient sum
    * over the frame's zero-padded first 64 bytes. `fh` is MATERIALIZED:
    * the dedup oracle self-joins it. */
  /** The DuckDB twin of [[videoSaturatedCorpus]]: builds the same
    * interleaved-payload `vc(doc_id, text)` both arms, ready for
    * [[videoFrameHashCtes]]. */
  /** The DuckDB twin of [[textSaturatedCorpus]] — the `tsc(doc_id, text)`
    * replica-crawl corpus CTE the minhash/ngram audit+auto oracles share. */
  /** CTEs `olds(doc_id, source, old_hash)` / `news(doc_id, source,
    * new_hash)` — the SQL twin of [[snapshotPair]]'s construction. */
  private def snapshotPairCtes: String =
    """olds AS (SELECT doc_id, source, md5(text) AS old_hash FROM documents
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 90),
      |news AS (SELECT doc_id, source,
      |    md5(CASE WHEN b >= 40 AND b < 50 THEN text || ' v2' ELSE text END) AS new_hash
      |  FROM (SELECT doc_id, source, text,
      |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
      |        FROM documents) t
      |  WHERE b >= 10)""".stripMargin

  private def textSaturatedCorpusCte: String =
    """tsc AS (SELECT doc_id,
      |    concat(concat_ws(' ',
      |      substr(md5(CAST(doc_id % 10 AS VARCHAR)), 1, 5),
      |      substr(md5(CAST(doc_id % 10 AS VARCHAR)), 6, 5),
      |      substr(md5(CAST(doc_id % 10 AS VARCHAR)), 11, 5),
      |      substr(md5(CAST(doc_id % 10 AS VARCHAR)), 16, 5),
      |      substr(md5(CAST(doc_id % 10 AS VARCHAR)), 21, 5),
      |      substr(md5(CAST(doc_id % 10 AS VARCHAR)), 26, 5)),
      |      CASE WHEN doc_id % 20 < 10 THEN '' ELSE ' zvariant' END) AS text
      |  FROM documents)""".stripMargin

  /** The dedup_minhash CTE chain over [[textSaturatedCorpusCte]] — word
    * trigrams hashed to 56-bit ints, 12 XOR-mask minhashes in 6 bands of
    * r=2 — ending at `bands` with `sh` kept for the verify. */
  private def textSaturatedBandCtes: String =
    s"""$textSaturatedCorpusCte,
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM tsc),
       |sh AS MATERIALIZED (SELECT doc_id,
       |         list_transform(
       |           list_distinct(list_transform(range(0, len(t) - 2),
       |             i -> array_to_string(t[i+1:i+3], ' '))),
       |           x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
       |       FROM toks WHERE len(t) >= 3),
       |mh AS (SELECT doc_id,
       |    list_transform(range(0, 12),
       |      sd -> list_min(list_transform(hs,
       |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
       |  FROM sh),
       |bands AS MATERIALIZED (SELECT doc_id, u.band, u.key FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, 6), b ->
       |    {'band': b, 'key': array_to_string(sig[b*2+1:b*2+2], '|')})) AS u FROM mh) q)""".stripMargin

  /** The dedup_ngram CTE chain over [[textSaturatedCorpusCte]] — char
    * 8-grams, 12 seeds in 4 bands of r=3 — same ending contract. */
  private def textSaturatedNgramBandCtes: String =
    s"""$textSaturatedCorpusCte,
       |sh AS MATERIALIZED (SELECT doc_id,
       |    list_transform(
       |      list_distinct(list_transform(range(0, length(text) - 7),
       |        i -> substr(text, CAST(i + 1 AS BIGINT), 8))),
       |      x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
       |  FROM tsc WHERE length(text) >= 8),
       |mh AS (SELECT doc_id,
       |    list_transform(range(0, 12),
       |      sd -> list_min(list_transform(hs,
       |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
       |  FROM sh),
       |bands AS MATERIALIZED (SELECT doc_id, u.band, u.key FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, 4), b ->
       |    {'band': b, 'key': array_to_string(sig[b*3+1:b*3+3], '|')})) AS u FROM mh) q)""".stripMargin

  /** The collapse-first treatment tail over `tsc`+`bands`+`sh` CTEs —
    * sha-256 collapse, rep-restricted banded mine, member restore. */
  private def textDedupSql(tau: Double): String =
    s"""fpt AS (SELECT doc_id, sha256(text) AS fp FROM tsc),
       |rp AS (SELECT fp, min(doc_id) AS rep FROM fpt GROUP BY fp),
       |bandsr AS (SELECT b.* FROM bands b JOIN rp ON b.doc_id = rp.rep),
       |cr AS (SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
       |       FROM bandsr a JOIN bandsr b2
       |         ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id),
       |vr AS (SELECT c.a_id, c.b_id,
       |         round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
       |               / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
       |       FROM cr c JOIN sh sa ON sa.doc_id = c.a_id
       |                 JOIN sh sb ON sb.doc_id = c.b_id),
       |losers AS (SELECT DISTINCT b_id FROM vr WHERE jaccard >= $tau)
       |SELECT f.doc_id, (f.doc_id = r.rep AND l.b_id IS NULL) AS keep
       |FROM fpt f JOIN rp r USING (fp)
       |LEFT JOIN losers l ON r.rep = l.b_id
       |ORDER BY f.doc_id""".stripMargin

  /** The DuckDB twin of [[quoteOverlapCorpus]] — `qc(doc_id, text)`. */
  private def quoteOverlapCorpusCte: String =
    """qc AS (SELECT doc_id,
      |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10
      |         THEN text || ' ' || array_to_string(list_transform(range(0, 8),
      |                i -> substr(md5(CAST(doc_id % 3 AS VARCHAR)), CAST(i*4+1 AS BIGINT), 4)), ' ')
      |         ELSE text END AS text
      |  FROM documents
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20)""".stripMargin

  /** The DuckDB twin of [[boilerplateCorpus]] — `bpc(doc_id, text)`. */
  private def boilerplateCorpusCte: String =
    """bpc AS (SELECT doc_id,
      |    array_to_string(list_transform(range(0, 10),
      |      i -> substr(md5('hdr'), CAST(i*3+1 AS BIGINT), 3)), ' ') || ' ' ||
      |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10
      |         THEN text || ' ' || array_to_string(list_transform(range(0, 8),
      |                i -> substr(md5(CAST(doc_id % 3 AS VARCHAR)), CAST(i*4+1 AS BIGINT), 4)), ' ')
      |         ELSE text END AS text
      |  FROM documents
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20)""".stripMargin

  /** Positional 5-word-shingle postings over a `(doc_id, text)` CTE named
    * `src` — `pos(doc_id, pos, h)`, h = the engine's 56-bit digest of the
    * single-space-joined slice (the trimSpans/verbatimOverlap identity). */
  private def positionalShingleCtes(src: String): String =
    s"""ptoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $src),
       |pos AS MATERIALIZED (SELECT doc_id, u.p AS pos, u.h AS h FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 4),
       |    i -> {'p': i,
       |          'h': CAST(('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 14))::UBIGINT AS BIGINT)})) AS u
       |  FROM ptoks WHERE len(t) >= 5) q)""".stripMargin

  /** The eval-owner leak report (inline and indexed arms share it — the
    * ground truth is engine-independent): cross-side islands keyed by the
    * EVAL doc, max over ALL pair runs (the decontaminate_runs mirror —
    * sub-threshold maxima report honestly), leaks counted at the 13 rule. */
  /** Temperature mixture weights/epochs per source (α=0.5, 10M budget) —
    * shared by the inline and indexed planner oracles. */
  private def sourceMixSql: String =
    """WITH per AS (
      |  SELECT source, count(*) AS docs,
      |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT sum(pow(tokens, 0.5)) AS denom FROM per)
      |SELECT per.source, per.docs, per.tokens,
      |  round(pow(per.tokens, 0.5) / tot.denom, 6) AS weight,
      |  round(pow(per.tokens, 0.5) / tot.denom * 10000000.0 / per.tokens, 6) AS epochs
      |FROM per, tot ORDER BY per.source""".stripMargin

  private def evalLeakReportSql: String =
    s"""WITH ${positionalShingleCtes("documents")},
       |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
       |              a.pos - b.pos AS diag
       |       FROM pos a JOIN pos b ON a.h = b.h
       |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90
       |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80),
       |runs AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
       |  SELECT inc_id, ref_id, diag,
       |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
       |  FROM co) z GROUP BY 1, 2, 3, 4),
       |pr AS (SELECT inc_id, ref_id, max(len) + 4 AS mr FROM runs GROUP BY 1, 2),
       |agg AS (SELECT inc_id,
       |               CAST(sum(CASE WHEN mr >= 13 THEN 1 ELSE 0 END) AS BIGINT) AS n_train_leaks,
       |               CAST(max(mr) AS BIGINT) AS mr
       |        FROM pr GROUP BY inc_id)
       |SELECT d.doc_id, coalesce(a.n_train_leaks, 0) AS n_train_leaks,
       |       coalesce(a.mr, 0) AS max_run_tokens,
       |       (coalesce(a.n_train_leaks, 0) > 0) AS compromised
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.inc_id
       |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90
       |ORDER BY d.doc_id""".stripMargin

  /** The diagonal island merge over a co-occurrence CTE `co(a_id, b_id,
    * pa, diag)` → `ragg(a_id, b_id, max_run_tokens, n_cooccurrences)`
    * (run tokens = island length + shingleSize − 1 at k=5). */
  private def runAggSql: String =
    """runs AS (SELECT a_id, b_id, diag, grp, count(*) AS len FROM (
      |  SELECT a_id, b_id, diag,
      |         pa - row_number() OVER (PARTITION BY a_id, b_id, diag ORDER BY pa) AS grp
      |  FROM co) z GROUP BY 1, 2, 3, 4),
      |ragg AS (SELECT a_id, b_id, CAST(max(len) + 4 AS BIGINT) AS max_run_tokens,
      |                CAST(sum(len) AS BIGINT) AS n_cooccurrences
      |         FROM runs GROUP BY 1, 2)""".stripMargin

  /** The DuckDB twin of [[embeddingSaturatedCorpus]] + the dedup_simhash
    * CTE chain over it — 24 sign-plane bits in 3 bands of 8 — ending at
    * `bands` with `bits` and `esc` kept for the collapse and the verify. */
  /** The DuckDB twin of [[embeddingSaturatedCorpus]] alone — the
    * `esc(vec_id, v)` replica embedding CTE shared by the simhash and
    * semantic audit+auto oracles. */
  private def embeddingSaturatedCte: String =
    """esc AS (SELECT a.vec_id,
      |    CASE WHEN a.vec_id % 20 >= 10
      |         THEN list_transform(range(0, 64), i ->
      |           CASE WHEN i = 0 THEN b.embedding[1]::DOUBLE + 1.0
      |                ELSE b.embedding[i+1]::DOUBLE END)
      |         ELSE b.embedding::DOUBLE[] END AS v
      |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id % 10)""".stripMargin

  private def simhashSaturatedBandCtes: String =
    s"""$embeddingSaturatedCte,
      |bits AS (SELECT vec_id, list_transform(range(0, 24), p ->
      |    CASE WHEN list_sum(list_transform(range(0, 64), i ->
      |      v[i+1] * (CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
      |                     BETWEEN '0' AND '7' THEN 1 ELSE -1 END)
      |    )) >= 0 THEN '1' ELSE '0' END) AS bs FROM esc),
      |bands AS MATERIALIZED (SELECT vec_id, u.band, u.key FROM (
      |   SELECT vec_id, unnest(list_transform(range(0, 3), b ->
      |     {'band': b, 'key': array_to_string(bs[b*8+1:b*8+8], '')})) AS u FROM bits) q)""".stripMargin

  /** The band-bucket audit row over a `bands` CTE — [[textSaturatedBandCtes]]'
    * tail, shared by both text key-audit oracles (`nb` = band count). */
  private def bandAuditSql(nb: Int): String =
    s"""b AS (SELECT band, key, count(*) AS bn FROM bands GROUP BY 1, 2)
       |SELECT CAST(sum(bn) / $nb AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(max(bn) AS BIGINT) AS max_bucket,
       |  round(sum(bn)::DOUBLE / count(*), 6) AS mean_bucket,
       |  CAST(sum(bn * bn) AS DOUBLE) AS est_candidates
       |FROM b""".stripMargin

  /** The audit-gated two-arm mine over `bands`+`sh`+`tsc` CTEs — the
    * image_near_auto device, text edition: the fan-out rule re-derived in
    * SQL gates the FULL banded chain vs the sha-256 exact-collapse REP
    * chain (`nb` = band count, `tau` = the family's Jaccard threshold). */
  private def textNearAutoSql(nb: Int, tau: Double): String =
    s"""b AS (SELECT band, key, count(*) AS bn FROM bands GROUP BY 1, 2),
       |dec AS (SELECT CAST(sum(bn * bn) AS DOUBLE)
       |               > 16.0 * greatest(CAST(sum(bn) / $nb AS BIGINT), 1) AS hot FROM b),
       |rep AS MATERIALIZED (SELECT min(doc_id) AS doc_id
       |       FROM (SELECT doc_id, sha256(text) AS fp FROM tsc) f GROUP BY fp),
       |cf AS (SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
       |       FROM bands a JOIN bands b2
       |         ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id),
       |vf AS (SELECT c.a_id, c.b_id,
       |         round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
       |               / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
       |       FROM cf c JOIN sh sa ON sa.doc_id = c.a_id
       |                 JOIN sh sb ON sb.doc_id = c.b_id),
       |bandsr AS (SELECT b3.* FROM bands b3 JOIN rep r ON b3.doc_id = r.doc_id),
       |cr AS (SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
       |       FROM bandsr a JOIN bandsr b2
       |         ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id),
       |vr AS (SELECT c.a_id, c.b_id,
       |         round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
       |               / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
       |       FROM cr c JOIN sh sa ON sa.doc_id = c.a_id
       |                 JOIN sh sb ON sb.doc_id = c.b_id)
       |SELECT a_id, b_id, jaccard FROM vf
       |WHERE jaccard >= $tau AND NOT (SELECT hot FROM dec)
       |UNION ALL
       |SELECT a_id, b_id, jaccard FROM vr
       |WHERE jaccard >= $tau AND (SELECT hot FROM dec)
       |ORDER BY a_id, b_id""".stripMargin

  /** The DuckDB twin of [[imageSaturatedCorpus]] ending at
    * `h(doc_id, ph)` — the fake-arm dHash over the class-md5 grid. */
  private def imageSaturatedHashCtes: String =
    """g0 AS (SELECT doc_id,
      |    CASE WHEN doc_id % 20 < 10 THEN md5(CAST(doc_id % 10 AS VARCHAR))
      |         ELSE substr(md5(CAST(doc_id % 10 AS VARCHAR)), 1, 3) || '~' ||
      |              substr(md5(CAST(doc_id % 10 AS VARCHAR)), 5)
      |         END AS t
      |  FROM documents),
      |g AS (SELECT doc_id, list_transform(range(0, 64), i ->
      |        CASE WHEN i < strlen(t)
      |             THEN ascii(substr(t, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
      |      FROM g0),
      |h AS MATERIALIZED (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), k ->
      |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
      |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
      |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
      |      FROM g)""".stripMargin

  private def videoSaturatedVcCtes: String =
    s"""d0 AS (SELECT doc_id, text FROM documents
       |  WHERE strlen(text) = length(text) AND strlen(text) >= 32
       |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20),
       |ii AS (SELECT doc_id, text, array_to_string(list_transform(
       |         range(0, least(8, (strlen(text)+31)//32)),
       |         j -> '${"z" * 32}' || substr(text, CAST(j*32+1 AS BIGINT), 32)), '') AS iv
       |       FROM d0),
       |vc AS (SELECT doc_id, iv AS text FROM ii
       |       UNION ALL
       |       SELECT doc_id + 100000 AS doc_id, md5(text) || iv AS text FROM ii)""".stripMargin

  private def videoFrameHashCtes: String =
    """fr AS (SELECT doc_id, CAST(u AS BIGINT) AS frame_no,
      |         substr(text, CAST(u*32+1 AS BIGINT), 32) AS fb
      |       FROM (SELECT doc_id, text,
      |               unnest(range(0, least(16, (strlen(text)+31)//32))) AS u
      |             FROM vc) z),
      |gg AS (SELECT doc_id, frame_no, list_transform(range(0, 64), i ->
      |         CASE WHEN i < strlen(fb)
      |              THEN ascii(substr(fb, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
      |       FROM fr),
      |fh AS MATERIALIZED (SELECT doc_id, frame_no,
      |         CAST(list_sum(list_transform(range(0, 56), k ->
      |           CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
      |                     > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
      |                THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
      |                ELSE 0 END)) AS BIGINT) AS fhash
      |       FROM gg)""".stripMargin

  /** Flat ANN-edge PageRank oracle — shared verbatim by `page_rank_ann`
    * and the rung-picker twin `page_rank_ann_auto`. */
  private def pageRankAnnSql: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS MATERIALIZED (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
       |qcell AS MATERIALIZED (SELECT src, ci FROM (
       |  SELECT src, ci,
       |    row_number() OVER (PARTITION BY src ORDER BY s DESC, ci ASC) AS r
       |  FROM (SELECT z.src, u.ci AS ci, u.s AS s FROM (
       |        SELECT e.vec_id AS src, unnest(list_transform(range(1, 17),
       |          ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "e.v")}, 6)})) AS u
       |        FROM cents, e) z) y) t
       |  WHERE r <= 4),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, v, list_position(sc, list_max(sc)) AS cell FROM (
       |    SELECT e.vec_id, e.v,
       |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |    FROM e, cents) t2),
       |ed AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT qc.src, a.vec_id AS dst,
       |    row_number() OVER (PARTITION BY qc.src
       |      ORDER BY ${cosSql("a.v", "q.v")} DESC, a.vec_id ASC) AS rnk
       |  FROM assigned a
       |  JOIN qcell qc ON a.cell = qc.ci
       |  JOIN e q ON q.vec_id = qc.src
       |  WHERE a.vec_id != qc.src) t WHERE rnk <= 5),
       |${pageRankTailSql(5)}""".stripMargin

  /** Two-level ANN-edge PageRank oracle, parameterized by the coarse
    * probe window — `page_rank_ann2` runs it at the registered wCoarse = 2;
    * the forced rung-picker twin `page_rank_ann_auto2` at the derived
    * full-open wCoarse = 4. */
  private def pageRankAnn2Sql(wCoarse: Int = 2): String =
    s"""WITH ${ivf2Ctes(16, 4)},
       |qc2 AS MATERIALIZED (SELECT src, ci FROM (
       |  SELECT src, ci,
       |    row_number() OVER (PARTITION BY src ORDER BY s DESC, ci ASC) AS r
       |  FROM (SELECT z.src, u.ci AS ci, u.s AS s FROM (
       |        SELECT e.vec_id AS src, unnest(list_transform(range(1, 5),
       |          ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "e.v")}, 6)})) AS u
       |        FROM cc, e) z) y) t
       |  WHERE r <= $wCoarse),
       |pb AS MATERIALIZED (SELECT src, fcell FROM (
       |  SELECT qc2.src, ft.fcell,
       |    row_number() OVER (PARTITION BY qc2.src
       |      ORDER BY round(${cosRawSql("ft.fv", "q.v")}, 6) DESC, ft.fcell ASC) AS r
       |  FROM qc2 JOIN ft ON ft.ccell = qc2.ci
       |  JOIN e q ON q.vec_id = qc2.src) t WHERE r <= 4),
       |ed AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT pb.src, af.vec_id AS dst,
       |    row_number() OVER (PARTITION BY pb.src
       |      ORDER BY ${cosSql("af.v", "q.v")} DESC, af.vec_id ASC) AS rnk
       |  FROM af JOIN pb ON af.fcell = pb.fcell
       |  JOIN e q ON q.vec_id = pb.src
       |  WHERE af.vec_id != pb.src) t WHERE rnk <= 5),
       |${pageRankTailSql(5)}""".stripMargin

  /** Flat SemDeDup oracle — shared verbatim by `dedup_semantic` and the
    * rung-picker twin `dedup_semantic_auto` (whose default threshold keeps
    * the flat rung at nCells = 16). */
  private def semanticDedupSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
       |assigned AS (
       |  SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
       |    SELECT e.vec_id, e.v,
       |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |    FROM e, cents) t),
       |dups AS (
       |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.v", "b.v")} >= 0.4
       |  GROUP BY b.vec_id)
       |SELECT s.vec_id, s.cell, (d.dup_of IS NULL) AS keep, d.dup_of
       |FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
       |ORDER BY s.vec_id""".stripMargin

  /** Two-level SemDeDup oracle (hierarchical quantizer CTEs + auto
    * hot-cell cap) — shared verbatim by `dedup_semantic2` and the forced
    * rung-picker twin `dedup_semantic_auto2` (flatCellMax = 0 derives
    * exactly the registered nFine = 16 / nCoarse = 4 call). */
  private def semanticDedup2Sql: String =
    s"""WITH ${ivf2Ctes()},
       |sz AS (SELECT fcell, count(*) AS cn FROM af GROUP BY fcell),
       |tot AS (SELECT count(*) AS n FROM af),
       |keyed AS (
       |  SELECT af.vec_id, af.v, CAST(af.fcell AS BIGINT) AS cell,
       |    sz.cn > greatest(64, (4 * (SELECT n FROM tot)) // 16) AS split,
       |    CASE WHEN sz.cn > greatest(64, (4 * (SELECT n FROM tot)) // 16)
       |         THEN array_to_string(list_transform(range(0, 8), p ->
       |      CASE WHEN list_sum(list_transform(range(0, 64), i ->
       |        af.v[i+1] * (CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
       |                          BETWEEN '0' AND '7' THEN 1 ELSE -1 END)
       |      )) >= 0 THEN '1' ELSE '0' END), '') ELSE '' END AS sub
       |  FROM af JOIN sz ON af.fcell = sz.fcell),
       |dups AS (
       |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
       |  FROM keyed a JOIN keyed b
       |    ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.v", "b.v")} >= 0.4
       |  GROUP BY b.vec_id)
       |SELECT k.vec_id, k.cell, k.split, (d.dup_of IS NULL) AS keep, d.dup_of
       |FROM keyed k LEFT JOIN dups d ON k.vec_id = d.vec_id
       |ORDER BY k.vec_id""".stripMargin

  private def bitextMineSql: String = bitextMineSqlOver("TRUE")

  /** Shared by `bitext_mine_incremental` and its indexed twin — the
    * inline SQL verbatim (the dedup_semantic_incremental_indexed
    * convention): src batch = hash bucket ≥ 50 of the even half. */
  private def bitextMineIncrementalSql: String = bitextMineSqlOver(
    "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50")

  /** Brute-force ratio-margin oracle over (src slice × tgt side) — the
    * src slice parameterized so the incremental family (mining a NEW
    * batch of sources against the stored target corpus) shares the exact
    * same margin/mutual-argmax derivation: at full probe the quantizer is
    * irrelevant (candidates = all pairs) whichever side seeds it. */
  private def bitextMineSqlOver(srcExtra: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |xs AS (SELECT vec_id AS src_id, v FROM e WHERE vec_id % 2 = 0 AND ($srcExtra)),
       |ys AS (SELECT vec_id AS tgt_id, v FROM e WHERE vec_id % 2 = 1),
       |p AS (SELECT src_id, tgt_id,
       |        CAST(round((${cosRawSql("x.v", "y.v")}) * 1e6, 0) AS BIGINT) AS c6
       |      FROM xs x, ys y),
       |fwd AS (SELECT src_id, sum(c6) AS sx, count(*) AS kx FROM (
       |    SELECT src_id, c6,
       |      row_number() OVER (PARTITION BY src_id ORDER BY c6 DESC, tgt_id ASC) AS r
       |    FROM p) t WHERE r <= 4 GROUP BY src_id),
       |bwd AS (SELECT tgt_id, sum(c6) AS sy, count(*) AS ky FROM (
       |    SELECT tgt_id, c6,
       |      row_number() OVER (PARTITION BY tgt_id ORDER BY c6 DESC, src_id ASC) AS r
       |    FROM p) t WHERE r <= 4 GROUP BY tgt_id),
       |m AS (SELECT p.src_id, p.tgt_id,
       |        round(2.0 * c6 * kx * ky / (sx * ky + sy * kx), 6) AS margin
       |      FROM p JOIN fwd USING (src_id) JOIN bwd USING (tgt_id)
       |      WHERE sx * ky + sy * kx > 0),
       |r AS (SELECT src_id, tgt_id, margin,
       |        row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS rs,
       |        row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id ASC) AS rt
       |      FROM m)
       |SELECT src_id, tgt_id, margin FROM r
       |WHERE rs = 1 AND rt = 1 AND margin >= 1.0
       |ORDER BY src_id""".stripMargin

  private def cosRawSql(v: String, qv: String): String =
    s"""CASE WHEN list_sum(list_transform($v, x -> x*x)) = 0
       |      OR list_sum(list_transform($qv, x -> x*x)) = 0 THEN 0.0
       | ELSE list_sum(list_transform(range(1, len($v)+1), i -> $v[i]*$qv[i]))
       |      / (sqrt(list_sum(list_transform($v, x -> x*x)))
       |         * sqrt(list_sum(list_transform($qv, x -> x*x))))
       | END""".stripMargin

  private def cosSql(v: String, qv: String): String =
    s"round(${cosRawSql(v, qv)}, 6)"

  /** Shared PageRank tail: expects CTEs `e(vec_id, …)` (the node set) and
    * `ed(src, dst)` (the edge table) to be in scope; appends out-degrees,
    * `iters` unrolled damped steps (12-dp per-step grid — the
    * Centrality.pageRank contract), and the final 6-dp rank select. */
  private def pageRankTailSql(iters: Int, damping: Double = 0.85): String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (SELECT e2.vec_id,
         |    round((1.0 - $damping) / (SELECT n FROM nn)
         |          + $damping * coalesce(m.m, 0.0), 12) AS r
         |  FROM e e2 LEFT JOIN (
         |    SELECT ed.dst, sum(p.r / od.odeg) AS m
         |    FROM ed JOIN od USING (src) JOIN $prev p ON p.vec_id = ed.src
         |    GROUP BY ed.dst) m ON m.dst = e2.vec_id)""".stripMargin
    val steps = (1 to iters).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""od AS (SELECT src, count(*) AS odeg FROM ed GROUP BY src),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM e),
       |r0 AS (SELECT vec_id, 1.0 / (SELECT n FROM nn) AS r FROM e),
       |$steps
       |SELECT vec_id, round(r, 6) AS rank FROM r$iters ORDER BY vec_id""".stripMargin
  }

  /** DuckDB reproduction of the `local/hash-<dim>` embedder for text `t`
    * (see Embedders.hashProjection: top 53 bits of little-endian MD5 head,
    * mapped to [-1,1); `md5_number_upper` is exactly that LE u64). The
    * oracle skips L2 normalization — cosine is scale-invariant. */
  private def embSql(t: String, dim: Int = 64): String =
    s"""list_transform(range(0, $dim),
       | i -> CAST(md5_number_upper(CAST(i AS VARCHAR) || '|' || $t) >> 11 AS DOUBLE)
       |      / 9007199254740992.0 * 2 - 1)""".stripMargin

  /** DuckDB chunking of `documents` matching Ingest.chunk(id scheme
    * `<docId>-<pos>`, fixed character chunks). */
  private def chunkSql(chunkSize: Int): String =
    s"""SELECT CAST(doc_id AS VARCHAR) || '-' || CAST(u.pos AS VARCHAR) AS id, u.chunk AS chunk
       |FROM (SELECT doc_id,
       |        unnest(list_transform(
       |          range(0, CAST(ceil(length(text) / ${chunkSize}.0) AS BIGINT)),
       |          i -> {'pos': i, 'chunk': substr(text, CAST(i * $chunkSize + 1 AS BIGINT), $chunkSize)})) AS u
       |      FROM documents WHERE length(text) > 0)""".stripMargin

  /** Banded char-n-gram MinHash near-dup pairs (mirrors Dedup.ngramNear:
    * n=8 char shingles hashed to 56-bit ints — `('0x'||substr(md5,1,14))
    * ::UBIGINT` ≡ Spark's `conv(substr(md5,1,14),16,10)` — then 12
    * XOR-mask minhashes (mask_sd = 56-bit head of md5(sd)) in 4 bands of
    * r=3, exact Jaccard over the hashed sets, >= 0.5). Ends with a
    * `pairs` CTE for reuse by the resolution query. */
  /** minhashNearApprox's pair set as CTEs ending in `pairs(a_id, b_id)` —
    * the near arm of curate_approx (same word-shingle/signature constants
    * as the dedup_minhash_approx oracle, ap-prefixed names so the chain
    * composes beside corpusFilterCtes). */
  private def approxPairsSql(shingle: Int = 3, seeds: Int = 12, bands: Int = 6,
                             tau: Double = 0.5,
                             sourceSql: String = "SELECT doc_id, text FROM documents"): String = {
    val r = seeds / bands
    s"""aptk AS (SELECT doc_id, string_split(text, ' ') AS t FROM ($sourceSql) apsrc),
       |apsh AS (SELECT doc_id,
       |         list_transform(
       |           list_distinct(list_transform(range(0, len(t) - ${shingle - 1}),
       |             i -> array_to_string(t[i+1:i+$shingle], ' '))),
       |           x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
       |       FROM aptk WHERE len(t) >= $shingle),
       |apmh AS MATERIALIZED (SELECT doc_id,
       |    list_transform(range(0, $seeds),
       |      sd -> list_min(list_transform(hs,
       |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
       |  FROM apsh),
       |apbands AS (SELECT doc_id, u.band, u.key FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, $bands), b ->
       |    {'band': b, 'key': array_to_string(sig[b*$r+1:b*$r+$r], '|')})) AS u FROM apmh) q),
       |apcand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM apbands a JOIN apbands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |pairs AS MATERIALIZED (SELECT c.a_id, c.b_id,
       |      round(len(list_filter(range(0, $seeds),
       |            i -> sa.sig[i+1] = sb.sig[i+1]))::DOUBLE / $seeds, 6) AS est_jaccard
       |      FROM apcand c
       |      JOIN apmh sa ON sa.doc_id = c.a_id
       |      JOIN apmh sb ON sb.doc_id = c.b_id
       |      WHERE round(len(list_filter(range(0, $seeds),
       |                i -> sa.sig[i+1] = sb.sig[i+1]))::DOUBLE / $seeds, 6) >= $tau)""".stripMargin
  }

  private def ngramPairsSql(n: Int = 8, seeds: Int = 12, bands: Int = 4,
                            tau: Double = 0.5): String = {
    val r = seeds / bands
    s"""sh AS (SELECT doc_id,
       |    list_transform(
       |      list_distinct(list_transform(range(0, length(text) - ${n - 1}),
       |        i -> substr(text, CAST(i + 1 AS BIGINT), $n))),
       |      x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
       |  FROM documents WHERE length(text) >= $n),
       |mh AS (SELECT doc_id,
       |    list_transform(range(0, $seeds),
       |      sd -> list_min(list_transform(hs,
       |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
       |  FROM sh),
       |bands AS (SELECT doc_id, u.band, u.key FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, $bands), b ->
       |    {'band': b, 'key': array_to_string(sig[b*$r+1:b*$r+$r], '|')})) AS u FROM mh) q),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |pairs AS (SELECT a_id, b_id, jaccard FROM (
       |  SELECT c.a_id, c.b_id,
       |    round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
       |          / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a_id
       |  JOIN sh sb ON sb.doc_id = c.b_id) v
       |  WHERE jaccard >= $tau)""".stripMargin
  }

  /** BM25 query terms for the `bm25_topk` entry — mid-frequency corpus
    * vocabulary so tf and df both vary across documents. */
  private val Bm25Terms = Seq("vector", "hash", "join")

  /** DuckDB BM25 CTE chain mirroring Search.bm25TopK (ends with a
    * `scored(doc_id, score)` CTE). Every floating-point constant is
    * interpolated from the SAME Scala doubles the operator uses, so both
    * engines score with bit-identical parameters. */
  private def bm25Ctes(terms: Seq[String],
                       k1: Double = 1.2, b: Double = 0.75): String = {
    val toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter($toks, x -> x = '$t'))::DOUBLE AS tf$i" }.mkString(",\n    ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)::DOUBLE AS df$i").mkString(",\n    ")
    val idfs = terms.indices.map(i =>
      s"round(ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)), 9) AS idf$i").mkString(",\n    ")
    val contribs = terms.indices.map(i =>
      s"idf$i * (tf$i * ${k1 + 1.0}) / (tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))")
      .mkString("\n        + ")
    s"""tf AS (SELECT doc_id, len($toks)::DOUBLE AS dl,
       |    $tfs
       |  FROM documents),
       |stats AS (SELECT count(*)::DOUBLE AS n, round(avg(dl), 9) AS avgdl,
       |    $dfs
       |  FROM tf),
       |idf AS (SELECT avgdl,
       |    $idfs
       |  FROM stats),
       |scored AS (SELECT doc_id,
       |    round($contribs, 6) AS score
       |  FROM tf, idf)""".stripMargin
  }

  private def bm25Sql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, score FROM scored WHERE score > 0
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Hyperplane-LSH probe + exact rerank CTEs — shared by the scan-time,
    * stored-index, and range-search ANN variants (identical candidate
    * semantics). */
  /** e → bits → keys CTE chain (no leading WITH): hyperplane signature and
    * band keys per stored vector — shared by the LSH probe variants and the
    * recall audit. */
  private def annKeysCtes: String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |bits AS (SELECT vec_id, label, v, list_transform(range(0, 16), p ->
       |    CASE WHEN list_sum(list_transform(range(0, 64), i ->
       |      v[i+1] * (CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
       |                     BETWEEN '0' AND '7' THEN 1 ELSE -1 END)
       |    )) >= 0 THEN '1' ELSE '0' END) AS bs FROM e),
       |keys AS (SELECT vec_id, label, v, list_transform(range(0, 4), b ->
       |    CAST(b AS VARCHAR) || ':' || array_to_string(bs[b*4+1:b*4+4], '')) AS ks FROM bits)""".stripMargin

  private def annProbeSql: String =
    s"""WITH $annKeysCtes,
       |q AS (SELECT v AS qv, ks AS qks FROM keys WHERE vec_id = 0),
       |scored AS (SELECT k2.vec_id, k2.label, ${cosSql("k2.v", "q.qv")} AS score
       |           FROM keys k2, q
       |           WHERE len(list_intersect(k2.ks, q.qks)) > 0)""".stripMargin

  /** Seeded-centroid IVF: assignment + multi-probe + exact rerank — shared
    * by the scan-time and cell-partitioned-index variants (identical
    * candidate semantics). */
  private def ivfTopkSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |qcell AS (
       |  SELECT ci FROM (
       |    SELECT u.ci AS ci, u.s AS s FROM (
       |      SELECT unnest(list_transform(range(1, 17),
       |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
       |      FROM cents, q) z) t
       |  ORDER BY s DESC, ci ASC LIMIT 4),
       |assigned AS (
       |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
       |    SELECT e.vec_id, e.label, e.v,
       |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |    FROM e, cents) t2)
       |SELECT a.vec_id, a.label, ${cosSql("a.v", "q.qv")} AS score
       |FROM assigned a, q
       |WHERE a.cell IN (SELECT ci FROM qcell)
       |ORDER BY score DESC, vec_id ASC
       |LIMIT 10""".stripMargin

  /** Two-level (hierarchical coarse quantizer) IVF CTEs — no leading WITH.
    * Mirrors Ann.fineCentroids / Ann.assignCells2: coarse layer = first
    * nCoarse stored vectors (raw-argmax assignment, the NearestCentroid
    * contract), fine layer = first nFine stored vectors as a TABLE with
    * ccell = each fine centroid's own coarse parent, corpus assignment =
    * coarse raw argmax then fine 6-dp-rounded rank-1 (fcell asc ties —
    * the max_by contract). Ends with `af(vec_id, label, v, fcell)`, plus
    * `e`, `cc(cl)`, `ft(fcell, fv, ccell)` in scope. */
  private def ivf2Ctes(nFine: Int = 16, nCoarse: Int = 4): String =
    s"""e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cc AS MATERIALIZED (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < $nCoarse),
       |ft AS MATERIALIZED (SELECT vec_id + 1 AS fcell, v AS fv,
       |    list_position(sc, list_max(sc)) AS ccell FROM (
       |      SELECT e.vec_id, e.v, list_transform(range(1, ${nCoarse + 1}),
       |        ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |      FROM e, cc WHERE e.vec_id < $nFine) tft),
       |acc AS MATERIALIZED (SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS ccell FROM (
       |      SELECT e.vec_id, e.label, e.v, list_transform(range(1, ${nCoarse + 1}),
       |        ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |      FROM e, cc) tacc),
       |af AS MATERIALIZED (SELECT vec_id, label, v, fcell FROM (
       |      SELECT acc.vec_id, acc.label, acc.v, ft.fcell,
       |        row_number() OVER (PARTITION BY acc.vec_id
       |          ORDER BY round(${cosRawSql("ft.fv", "acc.v")}, 6) DESC, ft.fcell ASC) AS rnk
       |      FROM acc JOIN ft ON ft.ccell = acc.ccell) taf WHERE rnk = 1)""".stripMargin

  /** Two-level IVF probe: driver-contract params (nFine=16, nCoarse=4,
    * wCoarse=2, nProbe=4, k=10, query vec 0) — shared by the scan-time and
    * stored-index variants (identical layers ⇒ identical candidates). */
  private def ivfTopk2Sql(nFine: Int = 16, nCoarse: Int = 4, wCoarse: Int = 2,
                          nProbe: Int = 4, k: Int = 10): String =
    s"""WITH ${ivf2Ctes(nFine, nCoarse)},
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |qc AS (SELECT ci FROM (
       |    SELECT u.ci AS ci, u.s AS s FROM (
       |      SELECT unnest(list_transform(range(1, ${nCoarse + 1}),
       |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
       |      FROM cc, q) z) t
       |  ORDER BY s DESC, ci ASC LIMIT $wCoarse),
       |qf AS (SELECT fcell FROM (
       |    SELECT ft.fcell, round(${cosRawSql("ft.fv", "q.qv")}, 6) AS s
       |    FROM ft, q WHERE ft.ccell IN (SELECT ci FROM qc)) t2
       |  ORDER BY s DESC, fcell ASC LIMIT $nProbe)
       |SELECT af.vec_id, af.label, ${cosSql("af.v", "q.qv")} AS score
       |FROM af, q WHERE af.fcell IN (SELECT fcell FROM qf)
       |ORDER BY score DESC, vec_id ASC LIMIT $k""".stripMargin

  /** Full Lloyd training as chained CTEs — exactly `iters` unrolled
    * k-means steps (each the `ivf_train_step` oracle: assignment by raw
    * argmax cosine, per-(cell,pos) mean rounded to 9 dp, empty cells keep
    * their previous centroid via the left-join coalesce). Fixed-depth
    * unrolling is EXACT, not approximate: `Ann.trainCentroids(tol = 0)`
    * exits early only at a 9-dp fixpoint, and a Lloyd step at a fixpoint
    * is the identity, so running all `iters` steps here lands on the same
    * centroids regardless of where the Scala loop stopped. Ends with a
    * `c<iters>(cell, pos, m)` CTE (and the shared `e`). */
  private def ivfTrainChainSql(iters: Int = 10, nCells: Int = 16, dim: Int = 64,
      sourceSql: String =
        "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings",
      tag: String = ""): String = {
    // Two DuckDB-performance musts, without which the 10-step chain runs
    // for MINUTES instead of <1 s:
    //  - AS MATERIALIZED on every per-step CTE: each step references its
    //    predecessor more than once, so plain (inlinable) CTEs explode the
    //    expression tree exponentially in `iters`;
    //  - hoisted norms + native list_dot_product for the assignment
    //    cosine: bit-identical to cosRawSql's lambda form (same sequential
    //    double accumulation, same sqrt/divide tree — cross-checked
    //    exhaustively over all (vector, centroid) pairs at sf0.01), at a
    //    fraction of the per-element interpreter overhead.
    // `tag` prefixes every CTE name so TWO chains (e.g. a stale base-slice
    // train and a fresh full-corpus retrain) can coexist in one WITH
    // clause; the default "" keeps the historical names (e, ev, c0..cN).
    // The leading `WITH ` is the CALLER's to write — a chain may not be
    // the first element of the clause.
    val b = new StringBuilder
    b ++= s"""${tag}e AS MATERIALIZED ($sourceSql),
             |${tag}ev AS MATERIALIZED (SELECT v, sqrt(list_sum(list_transform(v, x -> x*x))) AS vns FROM ${tag}e),
             |${tag}c0 AS MATERIALIZED (SELECT CAST(vec_id + 1 AS BIGINT) AS cell, CAST(u.pos AS BIGINT) AS pos, u.val AS m FROM (
             |  SELECT vec_id, unnest(list_transform(range(0, $dim), i -> {'pos': i, 'val': v[i+1]})) AS u
             |  FROM ${tag}e WHERE vec_id < $nCells) t)""".stripMargin
    for (k <- 0 until iters) {
      b ++= s""",
               |${tag}cl$k AS MATERIALIZED (SELECT list(cm ORDER BY cell) AS cl, list(sqrt(cn) ORDER BY cell) AS cns FROM (
               |  SELECT cell, cm, list_sum(list_transform(cm, x -> x*x)) AS cn FROM (
               |    SELECT cell, list(m ORDER BY pos) AS cm FROM ${tag}c$k GROUP BY cell) t0) t),
               |${tag}a$k AS MATERIALIZED (SELECT v, list_position(sc, list_max(sc)) AS cell FROM (
               |  SELECT ${tag}ev.v, list_transform(range(1, ${nCells + 1}), ci ->
               |    CASE WHEN cns[ci] = 0 OR ${tag}ev.vns = 0 THEN 0.0
               |         ELSE list_dot_product(cl[ci], ${tag}ev.v) / (cns[ci] * ${tag}ev.vns) END) AS sc
               |  FROM ${tag}ev, ${tag}cl$k) t2),
               |${tag}x$k AS (SELECT cell, u.pos AS pos, u.val AS val FROM (
               |  SELECT cell, unnest(list_transform(range(0, $dim), i -> {'pos': i, 'val': v[i+1]})) AS u
               |  FROM ${tag}a$k) t),
               |${tag}m$k AS MATERIALIZED (SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
               |    round(avg(val), 9) AS m
               |  FROM ${tag}x$k GROUP BY cell, pos),
               |${tag}c${k + 1} AS MATERIALIZED (SELECT c.cell, c.pos, coalesce(m.m, c.m) AS m
               |  FROM ${tag}c$k c LEFT JOIN ${tag}m$k m ON m.cell = c.cell AND m.pos = c.pos)""".stripMargin
    }
    b.toString
  }

  /** Shared PQ reconstruction CTEs (8 subspaces × 8 dims, 16 codes seeded
    * from vec_id < 16 — mirrors Ann.pqCodebook/PqReconstruct: sequential
    * squared-distance accumulation, first-position argmin). Ends with a
    * `rec(vec_id, label, v, r)` CTE. */
  private def pqRecSql(m: Int = 8, kCodes: Int = 16, dsub: Int = 8): String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cb AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < $kCodes),
       |scs AS (SELECT vec_id, label, v,
       |    list_transform(range(0, $m), s ->
       |      list_transform(range(1, ${kCodes + 1}), j ->
       |        list_sum(list_transform(range(1, ${dsub + 1}), i ->
       |          (v[s*$dsub+i] - cl[j][s*$dsub+i]) * (v[s*$dsub+i] - cl[j][s*$dsub+i]))))) AS scs
       |  FROM e, cb),
       |rec AS (SELECT vec_id, label, v,
       |    flatten(list_transform(range(0, $m), s ->
       |      cl[list_position(scs[s+1], list_min(scs[s+1]))][s*$dsub+1:s*$dsub+$dsub])) AS r
       |  FROM scs, cb)""".stripMargin

  private def pqTopkSql: String =
    s"""WITH ${pqRecSql()},
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT rec.vec_id, rec.label, ${cosSql("rec.r", "q.qv")} AS score
       |FROM rec, q
       |ORDER BY score DESC, vec_id ASC
       |LIMIT 10""".stripMargin

  /** Recall@k of the IVF probe vs the exact scan, per query — multi-query
    * generalization of [[ivfTopkSql]]'s assignment/probe CTEs (identical
    * cell semantics), with the [[annRecallSql]] rank-set-join tail. */
  /** dedup_image / dedup_image_auto oracle — exact-collapse + rep-pair
    * components: reps = min doc per distinct hash; the oracle brute-forces
    * rep pairs (banding is lossless at any clamped t, so the banded mine
    * finds exactly these), then the dedup_groups recursive walk over reps;
    * docs inherit their rep's root. */
  /** Shared oracle prefix for the audio landmark queries: the shift-twin
    * corpus (every sliced ASCII-pure doc as-is at its own id, plus a
    * 12-zero-sample-delayed copy at id + 100000, both under the 512-byte
    * payload budget), 16-bit LE samples re-derived from the text bytes,
    * HOPPED windows (hop 4, window 16), and quarter-octave levels from the
    * exact integer threshold table — ends at `lv(id, L)`. */
  private def audioShiftLvCtes: String = {
    val thresholds = graft.operators.Multimodal.QuarterOctaveThresholds
      .mkString("[", ",", "]")
    s"""WITH RECURSIVE d AS (SELECT doc_id, text FROM documents
       |  WHERE strlen(text) = length(text)
       |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20),
       |smA AS (SELECT doc_id AS id, least(strlen(text), 512) // 2 AS n,
       |  list_transform(range(0, least(strlen(text), 512) // 2), i ->
       |     ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) * 256
       |   + ascii(substr(text, CAST(2*i+1 AS BIGINT), 1))) AS s FROM d),
       |smB AS (SELECT doc_id + 100000 AS id, 12 + least(strlen(text), 488) // 2 AS n,
       |  list_concat(list_transform(range(0, 12), z -> 0),
       |    list_transform(range(0, least(strlen(text), 488) // 2), i ->
       |       ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) * 256
       |     + ascii(substr(text, CAST(2*i+1 AS BIGINT), 1)))) AS s FROM d),
       |sm AS (SELECT * FROM smA UNION ALL SELECT * FROM smB),
       |lv AS (SELECT id, list_transform(
       |    list_transform(range(0, CASE WHEN n >= 16 THEN (n - 16) // 4 + 1 ELSE 0 END),
       |      w -> list_sum(list_transform(range(w*4, w*4 + 16),
       |             j -> CAST(s[CAST(j+1 AS BIGINT)] AS BIGINT) * s[CAST(j+1 AS BIGINT)]))),
       |    ss -> len(list_filter($thresholds, t -> ss >= t))) AS L FROM sm)""".stripMargin
  }

  /** The landmark chain over a `(id, L)` source CTE: strict-rise /
    * non-strict-fall peaks, anchor→next-≤3-peaks-within-8 landmark pairs,
    * and the (la, lb, dt)-key join with per-offset voting — one
    * mis-derived window boundary or peak rule and every vote count
    * shifts. Ends at `vt(a_id, b_id, off, v)`. */
  /** Incremental SemDeDup over the standard incremental split: centroids
    * from the REFERENCE slice's vec_id < 16 (len(cl) cells — the slice
    * keeps only some of 0..15), corpus hits via the cell equi-join,
    * in-batch hits via the lower-id self-join. Shared verbatim by the
    * inline and indexed variants (identical admissions contract). */
  private def dedupSemanticIncrementalSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
       |  FROM embeddings),
       |off AS (SELECT coalesce(max(vec_id), 0) + 1 AS o FROM e),
       |rf AS (SELECT vec_id, v FROM e WHERE bucket < 50),
       |inc AS (SELECT vec_id, v FROM e WHERE bucket >= 50
       |  UNION ALL SELECT vec_id + (SELECT o FROM off), v FROM e WHERE bucket < 10
       |  UNION ALL SELECT vec_id + 2 * (SELECT o FROM off), v FROM e WHERE bucket >= 95),
       |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM rf WHERE vec_id < 16),
       |ra AS MATERIALIZED (SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
       |    SELECT rf.vec_id, rf.v,
       |      list_transform(range(1, len(cl) + 1), ci -> ${cosRawSql("cl[ci]", "rf.v")}) AS sc
       |    FROM rf, cents) t),
       |ia AS MATERIALIZED (SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
       |    SELECT inc.vec_id, inc.v,
       |      list_transform(range(1, len(cl) + 1), ci -> ${cosRawSql("cl[ci]", "inc.v")}) AS sc
       |    FROM inc, cents) t),
       |ch AS (SELECT DISTINCT ia.vec_id FROM ia JOIN ra ON ia.cell = ra.cell
       |       WHERE ${cosSql("ia.v", "ra.v")} >= 0.4),
       |bh AS (SELECT DISTINCT b.vec_id FROM ia a JOIN ia b
       |       ON a.cell = b.cell AND a.vec_id < b.vec_id
       |       WHERE ${cosSql("a.v", "b.v")} >= 0.4)
       |SELECT ia.vec_id, ia.cell,
       |  (ch.vec_id IS NOT NULL) AS seen_in_corpus,
       |  (bh.vec_id IS NOT NULL) AS matched_in_batch,
       |  (ch.vec_id IS NULL AND bh.vec_id IS NULL) AS keep
       |FROM ia LEFT JOIN ch ON ia.vec_id = ch.vec_id
       |        LEFT JOIN bh ON ia.vec_id = bh.vec_id
       |ORDER BY ia.vec_id""".stripMargin

  /** Incremental image admission over the standard incremental split:
    * reference = pure-ASCII docs bucket < 50 as text-byte blobs, incoming
    * = the rest plus re-keyed copies; fake-grid dHash both sides; corpus
    * hits vs the reference's DISTINCT hashes, in-batch hits via the
    * lower-id self-join. Shared verbatim by the inline and indexed
    * variants (identical admissions contract). */
  private def dedupImageIncrementalSql: String =
    """WITH d AS (SELECT doc_id, text,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
      |  FROM documents WHERE strlen(text) = length(text)),
      |off AS (SELECT coalesce(max(doc_id), 0) + 1 AS o FROM d),
      |rf AS (SELECT doc_id, text FROM d WHERE b < 50),
      |inc AS (SELECT doc_id, text FROM d WHERE b >= 50
      |  UNION ALL SELECT doc_id + (SELECT o FROM off), text FROM d WHERE b < 10
      |  UNION ALL SELECT doc_id + 2 * (SELECT o FROM off), text FROM d WHERE b >= 95),
      |rg AS (SELECT doc_id, list_transform(range(0, 64), i ->
      |        CASE WHEN i < strlen(text)
      |             THEN ascii(substr(text, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
      |      FROM rf),
      |rh AS MATERIALIZED (SELECT DISTINCT CAST(list_sum(list_transform(range(0, 56), k ->
      |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
      |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
      |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
      |      FROM rg),
      |ig AS (SELECT doc_id, list_transform(range(0, 64), i ->
      |        CASE WHEN i < strlen(text)
      |             THEN ascii(substr(text, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
      |      FROM inc),
      |ih AS MATERIALIZED (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), k ->
      |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
      |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
      |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
      |      FROM ig),
      |ch AS (SELECT DISTINCT ih.doc_id FROM ih
      |       JOIN rh ON bit_count(xor(ih.ph, rh.ph)) <= 6),
      |bh AS (SELECT DISTINCT b2.doc_id FROM ih a JOIN ih b2
      |       ON a.doc_id < b2.doc_id AND bit_count(xor(a.ph, b2.ph)) <= 6)
      |SELECT ih.doc_id, ih.ph AS phash,
      |  (ch.doc_id IS NOT NULL) AS seen_in_corpus,
      |  (bh.doc_id IS NOT NULL) AS matched_in_batch,
      |  (ch.doc_id IS NULL AND bh.doc_id IS NULL) AS keep
      |FROM ih LEFT JOIN ch ON ih.doc_id = ch.doc_id
      |        LEFT JOIN bh ON ih.doc_id = bh.doc_id
      |ORDER BY ih.doc_id""".stripMargin

  /** Incremental audio admission over the media incremental split
    * (bucket<20 pure-ASCII universe; reference = bucket < 10 WAV-wrapped;
    * incoming = bucket >= 10 plus verbatim re-ingests of bucket < 2
    * [envelope-arm corpus hits], 12-sample-DELAYED copies of bucket < 2
    * [landmark-vote-arm corpus hits — the audio_shift_near misalignment
    * device], and verbatim copies of bucket >= 18 [in-batch hits]). The
    * full landmark chain re-derived over the tagged union (reference ids
    * negative), both [[graft.operators.Dedup.audioMatchesAgainst]] arms +
    * both in-batch arms in SQL. Shared verbatim by the inline and indexed
    * variants (identical admissions contract). */
  private def audioDedupIncrementalSql: String = {
    val thresholds = graft.operators.Multimodal.QuarterOctaveThresholds
      .mkString("[", ",", "]")
    val plainN = "least(strlen(text), 512) // 2"
    val plainS =
      """list_transform(range(0, least(strlen(text), 512) // 2), i ->
        |     ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) * 256
        |   + ascii(substr(text, CAST(2*i+1 AS BIGINT), 1)))""".stripMargin
    val delayedS =
      """list_concat(list_transform(range(0, 12), z -> 0),
        |   list_transform(range(0, least(strlen(text), 488) // 2), i ->
        |       ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) * 256
        |     + ascii(substr(text, CAST(2*i+1 AS BIGINT), 1))))""".stripMargin
    s"""WITH d AS (SELECT doc_id, text, b FROM (
       |    SELECT doc_id, text,
       |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
       |    FROM documents WHERE strlen(text) = length(text)) t WHERE b < 20),
       |off AS (SELECT coalesce(max(doc_id), 0) + 1 AS o FROM d),
       |sm AS (SELECT -(doc_id + 1) AS id, $plainN AS n, $plainS AS s FROM d WHERE b < 10
       |  UNION ALL SELECT doc_id, $plainN, $plainS FROM d WHERE b >= 10
       |  UNION ALL SELECT doc_id + (SELECT o FROM off), $plainN, $plainS
       |    FROM d WHERE b < 2
       |  UNION ALL SELECT doc_id + 2*(SELECT o FROM off),
       |    12 + least(strlen(text), 488) // 2, $delayedS FROM d WHERE b < 2
       |  UNION ALL SELECT doc_id + 3*(SELECT o FROM off), $plainN, $plainS
       |    FROM d WHERE b >= 18),
       |lv AS (SELECT id, list_transform(
       |    list_transform(range(0, CASE WHEN n >= 16 THEN (n - 16) // 4 + 1 ELSE 0 END),
       |      w -> list_sum(list_transform(range(w*4, w*4 + 16),
       |             j -> CAST(s[CAST(j+1 AS BIGINT)] AS BIGINT) * s[CAST(j+1 AS BIGINT)]))),
       |    ss -> len(list_filter($thresholds, t -> ss >= t))) AS L FROM sm),
       |${audioLandmarkRowCtes("lv")},
       |cv AS (SELECT DISTINCT a.id FROM lmr a JOIN lmr b
       |       ON a.la = b.la AND a.lb = b.lb AND a.dt = b.dt
       |        AND a.id >= 0 AND b.id < 0
       |       GROUP BY a.id, b.id, a.ta - b.ta HAVING count(*) >= 5),
       |bv AS (SELECT DISTINCT b.id FROM lmr a JOIN lmr b
       |       ON a.la = b.la AND a.lb = b.lb AND a.dt = b.dt
       |        AND a.id >= 0 AND b.id >= 0 AND a.id < b.id
       |       GROUP BY a.id, b.id, a.ta - b.ta HAVING count(*) >= 5),
       |ev AS MATERIALIZED (SELECT id, array_to_string(L, ' ') AS env FROM lv),
       |ce AS (SELECT DISTINCT a.id FROM ev a
       |       JOIN (SELECT DISTINCT env FROM ev WHERE id < 0) r ON a.env = r.env
       |       WHERE a.id >= 0),
       |be AS (SELECT DISTINCT a.id FROM ev a JOIN ev b
       |       ON a.env = b.env AND b.id >= 0 AND a.id > b.id
       |       WHERE a.id >= 0),
       |ch AS (SELECT id FROM cv UNION SELECT id FROM ce),
       |bh AS (SELECT id FROM bv UNION SELECT id FROM be)
       |SELECT i.id AS doc_id, TRUE AS is_audio,
       |  (ch.id IS NOT NULL) AS seen_in_corpus,
       |  (bh.id IS NOT NULL) AS matched_in_batch,
       |  (ch.id IS NULL AND bh.id IS NULL) AS keep
       |FROM (SELECT id FROM lv WHERE id >= 0) i
       |LEFT JOIN ch ON i.id = ch.id
       |LEFT JOIN bh ON i.id = bh.id
       |ORDER BY doc_id""".stripMargin
  }

  /** Incremental video admission over the same split (reference = bucket
    * < 10 as n-frame videos; incoming = bucket >= 10 plus verbatim
    * re-ingests of bucket < 2 [fingerprint-arm corpus hits], re-INTROED
    * copies of bucket < 2 [one md5-hex junk frame prepended — a distinct
    * fingerprint, frame-VOTE-arm corpus hits: the video_dedup re-cut
    * device], and verbatim copies of bucket >= 18 [in-batch hits]). Both
    * [[graft.operators.Dedup.videoMatchesAgainst]] arms + both in-batch
    * arms in SQL; is_video from the frame walk (an empty payload yields
    * no frame and keeps — the pass-through). Shared verbatim by the
    * inline and indexed variants. */
  private def videoDedupIncrementalSql: String =
    s"""WITH d AS (SELECT doc_id, text, b FROM (
       |    SELECT doc_id, text,
       |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
       |    FROM documents WHERE strlen(text) = length(text)) t WHERE b < 20),
       |off AS (SELECT coalesce(max(doc_id), 0) + 1 AS o FROM d),
       |vc AS (SELECT -(doc_id + 1) AS doc_id, text FROM d WHERE b < 10
       |  UNION ALL SELECT doc_id, text FROM d WHERE b >= 10
       |  UNION ALL SELECT doc_id + (SELECT o FROM off), text FROM d WHERE b < 2
       |  UNION ALL SELECT doc_id + 2*(SELECT o FROM off), md5(text) || text
       |    FROM d WHERE b < 2
       |  UNION ALL SELECT doc_id + 3*(SELECT o FROM off), text FROM d WHERE b >= 18),
       |$videoFrameHashCtes,
       |fp AS MATERIALIZED (SELECT doc_id, string_agg(
       |         CAST(frame_no AS VARCHAR) || ':' || CAST(fhash AS VARCHAR),
       |         ' ' ORDER BY frame_no) AS fp
       |       FROM fh GROUP BY doc_id),
       |cv AS (SELECT DISTINCT a.doc_id AS id FROM fh a JOIN fh b
       |       ON a.fhash = b.fhash AND a.doc_id >= 0 AND b.doc_id < 0
       |       GROUP BY a.doc_id, b.doc_id, a.frame_no - b.frame_no
       |       HAVING count(*) >= 3),
       |bv AS (SELECT DISTINCT b.doc_id AS id FROM fh a JOIN fh b
       |       ON a.fhash = b.fhash AND a.doc_id >= 0 AND b.doc_id >= 0
       |        AND a.doc_id < b.doc_id
       |       GROUP BY a.doc_id, b.doc_id, a.frame_no - b.frame_no
       |       HAVING count(*) >= 3),
       |cf AS (SELECT DISTINCT a.doc_id AS id FROM fp a
       |       JOIN (SELECT DISTINCT fp FROM fp WHERE doc_id < 0) r ON a.fp = r.fp
       |       WHERE a.doc_id >= 0),
       |bf AS (SELECT DISTINCT a.doc_id AS id FROM fp a JOIN fp b
       |       ON a.fp = b.fp AND b.doc_id >= 0 AND a.doc_id > b.doc_id
       |       WHERE a.doc_id >= 0),
       |ch AS (SELECT id FROM cv UNION SELECT id FROM cf),
       |bh AS (SELECT id FROM bv UNION SELECT id FROM bf),
       |iv AS (SELECT DISTINCT doc_id FROM fh WHERE doc_id >= 0),
       |inc AS (SELECT doc_id FROM vc WHERE doc_id >= 0)
       |SELECT inc.doc_id, (iv.doc_id IS NOT NULL) AS is_video,
       |  (ch.id IS NOT NULL) AS seen_in_corpus,
       |  (bh.id IS NOT NULL) AS matched_in_batch,
       |  (ch.id IS NULL AND bh.id IS NULL) AS keep
       |FROM inc LEFT JOIN iv ON inc.doc_id = iv.doc_id
       |LEFT JOIN ch ON inc.doc_id = ch.id
       |LEFT JOIN bh ON inc.doc_id = bh.id
       |ORDER BY inc.doc_id""".stripMargin

  /** Near-dup components over the n-gram pair graph: min id per connected
    * component via a recursive walk — the oracle both `dedup_groups`
    * (HashToMin) and `dedup_groups_star` (star contraction) must hit. */
  private def dedupGroupsOracleSql: String =
    s"""WITH RECURSIVE ${ngramPairsSql()},
       |e AS (SELECT a_id AS a, b_id AS b FROM pairs
       |      UNION SELECT b_id, a_id FROM pairs),
       |walk(a, b) AS (SELECT a, b FROM e
       |               UNION SELECT walk.a, e.b FROM walk JOIN e ON walk.b = e.a),
       |roots AS (SELECT a AS id, least(a, min(b)) AS root FROM walk GROUP BY a)
       |SELECT d.doc_id, coalesce(r.root, d.doc_id) AS group_id
       |FROM documents d LEFT JOIN roots r ON d.doc_id = r.id
       |ORDER BY d.doc_id""".stripMargin

  /** The landmark ROWS alone (peaks → anchor-pair rows), ending at
    * `lmr(id, la, lb, dt, ta)` — shared by the vote chain and the
    * key-saturation audit. */
  private def audioLandmarkRowCtes(src: String): String =
    s"""pk AS (SELECT id, list_filter(
       |    list_transform(range(1, len(L) - 1), t -> {'t': t, 'l': L[t+1]}),
       |    p -> p.l > L[p.t] AND p.l >= L[p.t+2]) AS pk FROM $src),
       |lm AS (SELECT id, flatten(list_transform(range(0, len(pk)), i ->
       |    list_filter(list_transform(range(i+1, least(i+1+3, len(pk))), j ->
       |      {'la': pk[CAST(i+1 AS BIGINT)].l, 'lb': pk[CAST(j+1 AS BIGINT)].l,
       |       'dt': pk[CAST(j+1 AS BIGINT)].t - pk[CAST(i+1 AS BIGINT)].t,
       |       'ta': pk[CAST(i+1 AS BIGINT)].t}),
       |      x -> x.dt <= 8))) AS lms FROM pk),
       |lmr AS (SELECT id, u.la AS la, u.lb AS lb, u.dt AS dt, u.ta AS ta
       |        FROM (SELECT id, unnest(lms) AS u FROM lm) q)""".stripMargin

  private def audioLandmarkVoteCtes(src: String): String =
    s"""${audioLandmarkRowCtes(src)},
       |vt AS (SELECT a.id AS a_id, b.id AS b_id, a.ta - b.ta AS off, count(*) AS v
       |       FROM lmr a JOIN lmr b
       |         ON a.la = b.la AND a.lb = b.lb AND a.dt = b.dt AND a.id < b.id
       |       GROUP BY 1, 2, 3)""".stripMargin

  /** TRIPLE landmark rows + vote chain (keyPeaks = 3): anchor i, follower
    * j within the anchor's fanout window and maxDt, then a SECOND
    * follower k still within the ANCHOR's fanout window with
    * dt2 = t_k − t_j ≤ maxDt — the exact Scala loop bounds
    * (`Multimodal.audioLandmarks`). Expects `pk` from
    * [[audioLandmarkRowCtes]] to be in scope; ends at
    * `vt3(a_id, b_id, off, v)` keyed on the full 5-tuple. */
  private def audioLandmarkTripleCtes: String =
    s"""lm3 AS (SELECT id, flatten(list_transform(range(0, len(pk)), i ->
       |    flatten(list_transform(range(i+1, least(i+1+3, len(pk))), j ->
       |      list_filter(list_transform(range(j+1, least(i+1+3, len(pk))), k ->
       |        {'la': pk[CAST(i+1 AS BIGINT)].l, 'lb': pk[CAST(j+1 AS BIGINT)].l,
       |         'lc': pk[CAST(k+1 AS BIGINT)].l,
       |         'dt': pk[CAST(j+1 AS BIGINT)].t - pk[CAST(i+1 AS BIGINT)].t,
       |         'dt2': pk[CAST(k+1 AS BIGINT)].t - pk[CAST(j+1 AS BIGINT)].t,
       |         'ta': pk[CAST(i+1 AS BIGINT)].t}),
       |        x -> x.dt <= 8 AND x.dt2 <= 8))))) AS lms FROM pk),
       |lmr3 AS (SELECT id, u.la AS la, u.lb AS lb, u.lc AS lc, u.dt AS dt,
       |                u.dt2 AS dt2, u.ta AS ta
       |         FROM (SELECT id, unnest(lms) AS u FROM lm3) q),
       |vt3 AS (SELECT a.id AS a_id, b.id AS b_id, a.ta - b.ta AS off, count(*) AS v
       |        FROM lmr3 a JOIN lmr3 b
       |          ON a.la = b.la AND a.lb = b.lb AND a.lc = b.lc
       |         AND a.dt = b.dt AND a.dt2 = b.dt2 AND a.id < b.id
       |        GROUP BY 1, 2, 3)""".stripMargin

  /** The decontamination CTEs of the `curate` frame (train-slice 5-gram
    * hits against the bench slice) — shared verbatim by `curate` and
    * `curate_multimodal`. Needs `buck` ([[corpusFilterCtes]]) in scope. */
  /** The curate_multimodal oracle, parameterized by the CROSS-MODAL arm:
    * when `xm`, extra 32-byte stills (ids offset by 1,000,000, blob = the
    * md5 block every frame of a selected video class equals) join the
    * image family, `xmv` re-derives the cross-side Hamming probe over the
    * frame and image hash CTEs, and the media verdict conjoins with
    * NOT-matched — the SQL twin of
    * [[graft.operators.Curate.pipelineMultimodal]]`(crossModal = true)`. */
  private def curateMultimodalSql(xm: Boolean): String = {
    val thresholds = graft.operators.Multimodal.QuarterOctaveThresholds
      .mkString("[", ",", "]")
    val pyxCte = if (!xm) "" else """
        |pyx AS (SELECT doc_id + 1000000 AS doc_id,
        |        md5(CAST(doc_id // 2 AS VARCHAR)) AS p
        |        FROM documents WHERE doc_id % 97 != 0 AND (doc_id // 2) % 3 = 2
        |          AND doc_id % 2 = 0 AND (doc_id // 2) % 5 = 2),""".stripMargin.stripPrefix("\n")
    val payImgUnion = if (!xm) ""
      else "UNION ALL SELECT doc_id, p FROM pyx"
    val xmvCte = if (!xm) "" else """
        |xmv AS (SELECT DISTINCT f.doc_id FROM fh f
        |        JOIN ih h ON bit_count(xor(f.fhash, h.ph)) <= 3),""".stripMargin.stripPrefix("\n")
    val xmConj = if (!xm) "" else " AND x.doc_id IS NULL"
    val xmJoin = if (!xm) "" else " LEFT JOIN xmv x ON x.doc_id = mmap.doc_id"
    s"""WITH RECURSIVE $corpusFilterCtes,
        |${ngramPairsSql()},
        |$curateDecontamCtes,
        |$curateFlagsCte,
        |pay AS (SELECT doc_id, repeat(md5(CAST(doc_id // 2 AS VARCHAR)), 16) AS p,
        |        (doc_id // 2) % 3 AS m FROM documents WHERE doc_id % 97 != 0),$pyxCte
        |ig AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |        CASE WHEN i < strlen(p) THEN ascii(substr(p, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
        |      FROM (SELECT doc_id, p FROM pay WHERE m = 0 $payImgUnion) pz),
        |ih AS MATERIALIZED (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), k ->
        |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
        |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
        |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
        |      FROM ig),
        |ir AS MATERIALIZED (SELECT ph, min(doc_id) AS rep FROM ih GROUP BY ph),
        |ipr AS (SELECT a.rep AS pa, b.rep AS pb FROM ir a JOIN ir b
        |        ON a.rep < b.rep AND bit_count(xor(a.ph, b.ph)) <= 6),
        |imap AS (SELECT ih.doc_id, ir.rep FROM ih JOIN ir ON ir.ph = ih.ph),
        |asm AS (SELECT doc_id AS id, strlen(p) // 2 AS n,
        |        list_transform(range(0, strlen(p) // 2), i ->
        |           ascii(substr(p, CAST(2*i+2 AS BIGINT), 1)) * 256
        |         + ascii(substr(p, CAST(2*i+1 AS BIGINT), 1))) AS s
        |        FROM pay WHERE m = 1),
        |alv AS (SELECT id, list_transform(
        |        list_transform(range(0, CASE WHEN n >= 16 THEN (n - 16) // 4 + 1 ELSE 0 END),
        |          w -> list_sum(list_transform(range(w*4, w*4 + 16),
        |                 j -> CAST(s[CAST(j+1 AS BIGINT)] AS BIGINT) * s[CAST(j+1 AS BIGINT)]))),
        |        ss -> len(list_filter($thresholds, t -> ss >= t))) AS L FROM asm),
        |arp AS (SELECT id, min(id) OVER (PARTITION BY L) AS rep FROM alv),
        |alvr AS (SELECT alv.* FROM alv JOIN arp ON alv.id = arp.id AND arp.id = arp.rep),
        |${audioLandmarkVoteCtes("alvr")},
        |apr AS (SELECT a_id AS pa, b_id AS pb FROM vt
        |        GROUP BY a_id, b_id HAVING max(v) >= 5),
        |vc AS (SELECT doc_id, p AS text FROM pay WHERE m = 2),
        |$videoFrameHashCtes,
        |vfp AS (SELECT doc_id, string_agg(
        |          CAST(frame_no AS VARCHAR) || ':' || CAST(fhash AS VARCHAR),
        |          ' ' ORDER BY frame_no) AS fp
        |        FROM fh GROUP BY doc_id),
        |vrp AS (SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY fp) AS rep FROM vfp),
        |fhr AS (SELECT fh.* FROM fh JOIN vrp ON fh.doc_id = vrp.id AND vrp.id = vrp.rep),
        |vp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         a.frame_no - b.frame_no AS off
        |       FROM fhr a JOIN fhr b ON a.fhash = b.fhash AND a.doc_id < b.doc_id),
        |vvv AS (SELECT a_id, b_id, off, count(*) AS v FROM vp GROUP BY 1, 2, 3),
        |vpr AS (SELECT a_id AS pa, b_id AS pb FROM vvv
        |        GROUP BY a_id, b_id HAVING max(v) >= 3),$xmvCte
        |me AS (SELECT pa, pb FROM ipr UNION SELECT pb, pa FROM ipr
        |       UNION SELECT pa, pb FROM apr UNION SELECT pb, pa FROM apr
        |       UNION SELECT pa, pb FROM vpr UNION SELECT pb, pa FROM vpr),
        |mwalk(pa, pb) AS (SELECT pa, pb FROM me
        |                  UNION SELECT mwalk.pa, me.pb FROM mwalk JOIN me ON mwalk.pb = me.pa),
        |mroots AS (SELECT pa AS id, least(pa, min(pb)) AS root FROM mwalk GROUP BY pa),
        |mmap AS (SELECT doc_id, rep FROM imap
        |         UNION ALL SELECT id, rep FROM arp
        |         UNION ALL SELECT id, rep FROM vrp),
        |mediag AS (SELECT mmap.doc_id,
        |           (mmap.doc_id = coalesce(mr.root, mmap.rep))$xmConj AS media_ok
        |           FROM mmap LEFT JOIN mroots mr ON mr.id = mmap.rep$xmJoin),
        |mflags AS (SELECT f.doc_id, f.quality_ok, f.repetition_ok, f.pii_ok,
        |           f.dedup_ok, f.near_ok, f.decontam_ok,
        |           coalesce(mg.media_ok, TRUE) AS media_ok, f.b
        |           FROM flags f LEFT JOIN mediag mg ON f.doc_id = mg.doc_id),
        |fk AS (SELECT *, (quality_ok AND repetition_ok AND pii_ok AND dedup_ok
        |    AND near_ok AND decontam_ok AND media_ok) AS kept FROM mflags),
        |ck AS (SELECT fk.doc_id,
        |    CAST(len(list_filter(string_split(d.text, ' '), x -> x != '')) AS BIGINT) AS n_tok
        |  FROM fk JOIN documents d ON fk.doc_id = d.doc_id
        |  WHERE fk.kept AND fk.b < 80),
        |cs AS (SELECT doc_id,
        |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 10000 AS shard
        |  FROM ck)
        |SELECT fk.doc_id, fk.quality_ok, fk.repetition_ok, fk.pii_ok,
        |  fk.dedup_ok, fk.near_ok, fk.decontam_ok, fk.media_ok, fk.kept,
        |  CASE WHEN NOT fk.kept THEN NULL
        |       WHEN fk.b < 80 THEN 'train'
        |       WHEN fk.b < 90 THEN 'val' ELSE 'bench' END AS split,
        |  CAST(cs.shard AS BIGINT) AS shard
        |FROM fk LEFT JOIN cs ON fk.doc_id = cs.doc_id
        |ORDER BY fk.doc_id""".stripMargin
  }

  private def curateDecontamCtes: String =
    """dct0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |dchs AS (SELECT doc_id,
      |    list_distinct(list_transform(range(0, len(t) - 4),
      |      i -> CAST(('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 14))::UBIGINT AS BIGINT))) AS hs
      |  FROM dct0),
      |dcbench AS (SELECT DISTINCT unnest(hs) AS g FROM dchs
      |  JOIN buck USING (doc_id) WHERE b >= 90),
      |dctg AS (SELECT dchs.doc_id, unnest(hs) AS g FROM dchs
      |  JOIN buck USING (doc_id) WHERE b < 80),
      |dchits AS (SELECT doc_id, count(*) AS n FROM dctg
      |  JOIN dcbench USING (g) GROUP BY doc_id)""".stripMargin

  /** The `curate` oracle, parameterized on the decontamination arm:
    * `runDecontam = false` is the shingle-set-overlap frame (shared CTE
    * chain with `curate_multimodal`); `true` swaps in the run-rule chain
    * ([[curateRunHitsCtes]]) — everything downstream of the `flags` CTE
    * byte-identical. */
  private def curateSqlFor(runDecontam: Boolean,
                           sourceGate: Boolean = false,
                           budget: Option[Long] = None): String = {
    val (decoCtes, decoOk, decoJoin) =
      if (runDecontam)
        (curateRunHitsCtes,
          "CASE WHEN buck.b < 80 THEN rhit.doc_id IS NULL ELSE TRUE END",
          "LEFT JOIN rhit ON cfd.doc_id = rhit.doc_id")
      else
        (curateDecontamCtes,
          "CASE WHEN buck.b < 80 THEN coalesce(dchits.n, 0) = 0 ELSE TRUE END",
          "LEFT JOIN dchits ON cfd.doc_id = dchits.doc_id")
    // sourceGate: the host-level arm joined as one more gate column —
    // the sstats chain + the keep rule at minAvgQuality 0.29 (the
    // source_gate oracle's thresholds), per doc via its source
    val (srcCtes, srcCol, srcColFk, srcJoin, srcConj) =
      if (!sourceGate) ("", "", "", "", "")
      else (
        s""",
           |$sourceStatsTailCtes,
           |csg AS (SELECT d.doc_id,
           |    coalesce(NOT (s.n_docs >= 5) OR (
           |       round(s.q_micro_sum::DOUBLE / 1000000.0 / s.n_docs, 6) >= 0.29
           |       AND round(s.n_repetitive::DOUBLE / s.n_docs, 6) <= 0.5
           |       AND round(s.n_pii::DOUBLE / s.n_docs, 6) <= 0.5), TRUE) AS source_ok
           |  FROM documents d LEFT JOIN sstats s ON d.source = s.source)""".stripMargin,
        """
          |    csg.source_ok AS source_ok,""".stripMargin,
        "source_ok, ",
        """
          |  JOIN csg ON cfd.doc_id = csg.doc_id""".stripMargin,
        " AND source_ok")
    // budget: the TOKEN-BUDGET arm — the [[budgetSelectCtes]] machinery
    // over the gate-kept TRAIN docs (kept ∧ b < 80), its verdict
    // conjoined as `budget_ok` (vacuously TRUE for kept val/bench docs,
    // FALSE for gate-dropped ones) before the shard scan
    val (bCtes, bColFk, fkT) = budget.fold(("", "", "fk")) { b =>
      (s""",
         |$budgetTailCtes,
         |bkm AS (SELECT m.doc_id, m.n_tokens, m.micro, m.bin
         |  FROM bmic m JOIN fk ON m.doc_id = fk.doc_id
         |  WHERE fk.kept AND fk.b < 80),
         |bkh AS (SELECT bin, sum(n_tokens) AS n_tokens FROM bkm GROUP BY bin),
         |bkcum AS (SELECT bin, sum(n_tokens) OVER (ORDER BY bin DESC) AS cum_top FROM bkh),
         |bkt AS (SELECT coalesce((SELECT max(bin) FROM bkcum WHERE cum_top > $b), -1) AS t),
         |bkrem AS (SELECT $b - coalesce(
         |    (SELECT sum(n_tokens) FROM bkh, bkt WHERE bin > t), 0) AS remaining),
         |bkrun AS (SELECT doc_id,
         |    sum(n_tokens) OVER (ORDER BY micro DESC, doc_id) AS running
         |  FROM bkm, bkt WHERE bin = t),
         |bok AS (SELECT m.doc_id, (m.bin > t OR (m.bin = t AND r.running <= remaining)) AS bk
         |  FROM bkm m CROSS JOIN bkt CROSS JOIN bkrem
         |  LEFT JOIN bkrun r ON m.doc_id = r.doc_id),
         |fkx AS (SELECT fk.* REPLACE((fk.kept AND
         |      CASE WHEN NOT fk.kept THEN FALSE
         |           WHEN fk.b < 80 THEN coalesce(bok.bk, FALSE)
         |           ELSE TRUE END) AS kept),
         |    CASE WHEN NOT fk.kept THEN FALSE
         |         WHEN fk.b < 80 THEN coalesce(bok.bk, FALSE)
         |         ELSE TRUE END AS budget_ok
         |  FROM fk LEFT JOIN bok ON fk.doc_id = bok.doc_id)""".stripMargin,
        "budget_ok, ", "fkx")
    }
    s"""WITH $corpusFilterCtes,
       |${ngramPairsSql()},
       |$decoCtes$srcCtes,
       |flags AS (SELECT cfd.doc_id, cfd.quality_ok, cfd.repetition_ok,
       |    cfd.pii_ok, cfd.dedup_ok,
       |    cfd.doc_id NOT IN (SELECT b_id FROM pairs) AS near_ok,
       |    $decoOk AS decontam_ok,$srcCol
       |    buck.b AS b
       |  FROM cfd JOIN buck ON cfd.doc_id = buck.doc_id
       |  $decoJoin$srcJoin),
       |fk AS (SELECT *, (quality_ok AND repetition_ok AND pii_ok AND dedup_ok
       |    AND near_ok AND decontam_ok$srcConj) AS kept FROM flags)$bCtes,
       |ck AS (SELECT $fkT.doc_id,
       |    CAST(len(list_filter(string_split(d.text, ' '), x -> x != '')) AS BIGINT) AS n_tok
       |  FROM $fkT JOIN documents d ON $fkT.doc_id = d.doc_id
       |  WHERE $fkT.kept AND $fkT.b < 80),
       |cs AS (SELECT doc_id,
       |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 10000 AS shard
       |  FROM ck)
       |SELECT $fkT.doc_id, $fkT.quality_ok, $fkT.repetition_ok, $fkT.pii_ok,
       |  $fkT.dedup_ok, $fkT.near_ok, $fkT.decontam_ok, $srcColFk$bColFk$fkT.kept,
       |  CASE WHEN NOT $fkT.kept THEN NULL
       |       WHEN $fkT.b < 80 THEN 'train'
       |       WHEN $fkT.b < 90 THEN 'val' ELSE 'bench' END AS split,
       |  CAST(cs.shard AS BIGINT) AS shard
       |FROM $fkT LEFT JOIN cs ON $fkT.doc_id = cs.doc_id
       |ORDER BY $fkT.doc_id""".stripMargin
  }

  /** The run-rule decontamination CTE chain of `curate_runs` /
    * `decontaminate_runs_indexed`: positional 5-word postings over the
    * raw documents, train (b < 80) × eval (b >= 90) hash co-occurrences,
    * (pair, diagonal) islands, and the >= 13-token hit set. Needs `buck`
    * ([[corpusFilterCtes]]) in scope. */
  private def curateRunHitsCtes: String =
    """rtok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |rpos AS MATERIALIZED (SELECT doc_id, u.p AS pos, u.h AS h FROM (
      |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 4),
      |    i -> {'p': i,
      |          'h': CAST(('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 14))::UBIGINT AS BIGINT)})) AS u
      |  FROM rtok WHERE len(t) >= 5) q),
      |rtr AS (SELECT rpos.* FROM rpos JOIN buck USING (doc_id) WHERE b < 80),
      |rev AS (SELECT rpos.* FROM rpos JOIN buck USING (doc_id) WHERE b >= 90),
      |rco AS (SELECT a.doc_id AS inc_id, e.doc_id AS ref_id, a.pos AS pa,
      |        a.pos - e.pos AS diag
      |        FROM rtr a JOIN rev e ON a.h = e.h),
      |rrun AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
      |  SELECT inc_id, ref_id, diag,
      |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
      |  FROM rco) z GROUP BY 1, 2, 3, 4),
      |rhit AS (SELECT DISTINCT inc_id AS doc_id FROM rrun WHERE len + 4 >= 13)""".stripMargin

  /** The per-doc text-gate `flags` CTE of the `curate` frame — shared
    * verbatim by `curate` and `curate_multimodal`. */
  private def curateFlagsCte: String =
    """flags AS (SELECT cfd.doc_id, cfd.quality_ok, cfd.repetition_ok,
      |    cfd.pii_ok, cfd.dedup_ok,
      |    cfd.doc_id NOT IN (SELECT b_id FROM pairs) AS near_ok,
      |    CASE WHEN buck.b < 80 THEN coalesce(dchits.n, 0) = 0
      |         ELSE TRUE END AS decontam_ok,
      |    buck.b AS b
      |  FROM cfd JOIN buck ON cfd.doc_id = buck.doc_id
      |  LEFT JOIN dchits ON cfd.doc_id = dchits.doc_id)""".stripMargin

  /** Chained PQ-training CTEs: iteration i reads `cb{i-1}` (s, code, p,
    * mv rows), encodes every vector by per-subspace squared-L2 argmin
    * (first index on ties — [[graft.functions.PqCodes]]' rule, distances
    * accumulated left-to-right like PqReconstruct.compute so the doubles
    * are bit-identical), emits the 9-dp means, and coalesces against the
    * previous codebook (a code with no members keeps its centroid — the
    * Scala clone-then-update fallback). Ends at `cb$iters`. */
  private def pqTrainChainSql(iters: Int): String =
    (1 to iters).map { i =>
      s"""cbv$i AS (SELECT s, code, list(mv ORDER BY p) AS cv FROM cb${i - 1} GROUP BY s, code),
         |cbl$i AS (SELECT s, list(cv ORDER BY code) AS kl FROM cbv$i GROUP BY s),
         |sc$i AS (SELECT t.vec_id, t.s,
         |    list_transform(range(0, 16), k -> list_sum(list_transform(range(0, 8), p ->
         |      (t.v[CAST(t.s*8+p+1 AS BIGINT)] - kl[CAST(k+1 AS BIGINT)][CAST(p+1 AS BIGINT)])
         |    * (t.v[CAST(t.s*8+p+1 AS BIGINT)] - kl[CAST(k+1 AS BIGINT)][CAST(p+1 AS BIGINT)])))) AS d
         |  FROM (SELECT vec_id, v, unnest(range(0, 8)) AS s FROM e) t
         |  JOIN cbl$i ON cbl$i.s = t.s),
         |asg$i AS (SELECT vec_id, s, list_position(d, list_min(d)) - 1 AS code FROM sc$i),
         |cbn$i AS (SELECT CAST(a.s AS BIGINT) AS s, CAST(a.code AS BIGINT) AS code,
         |    CAST(pp.p AS BIGINT) AS p,
         |    round(avg(e.v[CAST(a.s*8 + pp.p + 1 AS BIGINT)]), 9) AS mv
         |  FROM asg$i a JOIN e ON e.vec_id = a.vec_id,
         |       (SELECT unnest(range(0, 8)) AS p) pp
         |  GROUP BY 1, 2, 3),
         |cb$i AS (SELECT o.s, o.code, o.p, coalesce(n.mv, o.mv) AS mv
         |  FROM cb${i - 1} o LEFT JOIN cbn$i n
         |    ON n.s = o.s AND n.code = o.code AND n.p = o.p)""".stripMargin
    }.mkString(",\n")

  private def dedupImageSql(videoTwin: Boolean = false): String = {
    // videoTwin: every doc also appears as an MP4-wrapped copy at
    // doc_id + 100000 whose extracted first sample IS the text — the grid,
    // and hence the hash and components, are the same computation
    val dCte =
      if (videoTwin)
        """d0 AS (SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)),
          |d AS (SELECT doc_id, text FROM d0
          |      UNION ALL SELECT doc_id + 100000, text FROM d0),""".stripMargin
      else "d AS (SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)),"
    s"""WITH RECURSIVE $dCte
      |g AS (SELECT doc_id, list_transform(range(0, 64), i ->
      |        CASE WHEN i < strlen(text)
      |             THEN ascii(substr(text, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
      |      FROM d),
      |h AS MATERIALIZED (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), k ->
      |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
      |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
      |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
      |      FROM g),
      |r AS MATERIALIZED (SELECT ph, min(doc_id) AS rep FROM h GROUP BY ph),
      |pr AS (SELECT a.rep AS pa, b.rep AS pb FROM r a JOIN r b
      |       ON a.rep < b.rep AND bit_count(xor(a.ph, b.ph)) <= 6),
      |e AS (SELECT pa, pb FROM pr UNION SELECT pb, pa FROM pr),
      |walk(pa, pb) AS (SELECT pa, pb FROM e
      |                 UNION SELECT walk.pa, e.pb FROM walk JOIN e ON walk.pb = e.pa),
      |roots AS (SELECT pa AS id, least(pa, min(pb)) AS root FROM walk GROUP BY pa)
      |SELECT h.doc_id, coalesce(rt.root, r.rep) AS group_id,
      |       h.doc_id = coalesce(rt.root, r.rep) AS keep
      |FROM h JOIN r ON r.ph = h.ph LEFT JOIN roots rt ON rt.id = r.rep
      |ORDER BY h.doc_id""".stripMargin
  }

  private def ivfRecallSql(nQ: Int = 8, k: Int = 10, nCells: Int = 16,
                           nProbe: Int = 4): String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < $nCells),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQ),
       |qcell AS (SELECT query_id, ci FROM (
       |  SELECT query_id, ci,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, ci ASC) AS r
       |  FROM (SELECT z.query_id, u.ci AS ci, u.s AS s FROM (
       |        SELECT q.query_id, unnest(list_transform(range(1, ${nCells + 1}),
       |          ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
       |        FROM cents, q) z) y) t
       |  WHERE r <= $nProbe),
       |assigned AS (
       |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
       |    SELECT e.vec_id, e.label, e.v,
       |           list_transform(range(1, ${nCells + 1}), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |    FROM e, cents) t2),
       |exact AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |                       ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id ASC) AS rnk
       |  FROM e, q) t WHERE rnk <= $k),
       |cand AS (SELECT query_id, vec_id FROM (
       |  SELECT qc.query_id, a.vec_id,
       |    row_number() OVER (PARTITION BY qc.query_id
       |                       ORDER BY ${cosSql("a.v", "q.qv")} DESC, a.vec_id ASC) AS rnk
       |  FROM assigned a
       |  JOIN qcell qc ON a.cell = qc.ci
       |  JOIN q ON q.query_id = qc.query_id) t WHERE rnk <= $k),
       |h AS (SELECT x.query_id, count(*)::BIGINT AS hits
       |      FROM exact x JOIN cand c ON c.query_id = x.query_id AND c.vec_id = x.vec_id
       |      GROUP BY x.query_id)
       |SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |       round(coalesce(h.hits, 0) / ${k.toDouble}, 6) AS recall
       |FROM q LEFT JOIN h ON h.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin

  /** The recall-drop → rebuild loop, reproduced decision and all — mirrors
    * Ann.ivfRetrainOnRecall: TWO Lloyd chains (stale = trained on the
    * `vec_id < splitId` base slice, fresh = the full corpus, disambiguated
    * by the chain `tag`), the stale probe's summed hit count vs the exact
    * scan over the first nQ queries as ONE integer, and a UNION ALL whose
    * arms are gated on the exact integer comparison `th < minHits` — so
    * the oracle takes the same branch the operator took, bit-for-bit (no
    * float recall crosses the engines). The served arm reuses the
    * ivf_delta_topk serving form (whole-corpus assignment ≡ base ∪ delta
    * under frozen centroids). */
  private def ivfRetrainOnRecallSql(nQ: Int = 8, k: Int = 10, nCells: Int = 16,
                                    nProbe: Int = 4, iters: Int = 10,
                                    splitId: Long = 250L, minHits: Long = 64L): String =
    s"""WITH ${ivfTrainChainSql(iters, nCells, sourceSql =
          s"SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < $splitId")},
       |${ivfTrainChainSql(iters, nCells, tag = "r")},
       |clS AS MATERIALIZED (SELECT list(cm ORDER BY cell) AS cl FROM (
       |  SELECT cell, list(m ORDER BY pos) AS cm FROM c$iters GROUP BY cell) t),
       |clR AS MATERIALIZED (SELECT list(cm ORDER BY cell) AS cl FROM (
       |  SELECT cell, list(m ORDER BY pos) AS cm FROM rc$iters GROUP BY cell) t),
       |eAll AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM eAll WHERE vec_id < $nQ),
       |qcell AS (SELECT query_id, ci FROM (
       |  SELECT query_id, ci,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, ci ASC) AS r
       |  FROM (SELECT z.query_id, u.ci AS ci, u.s AS s FROM (
       |        SELECT q.query_id, unnest(list_transform(range(1, ${nCells + 1}),
       |          ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
       |        FROM clS, q) z) y) t
       |  WHERE r <= $nProbe),
       |assignedS AS MATERIALIZED (
       |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
       |    SELECT eAll.vec_id, eAll.label, eAll.v,
       |           list_transform(range(1, ${nCells + 1}), ci -> ${cosRawSql("cl[ci]", "eAll.v")}) AS sc
       |    FROM eAll, clS) t2),
       |exact AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, eAll.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |                       ORDER BY ${cosSql("eAll.v", "q.qv")} DESC, eAll.vec_id ASC) AS rnk
       |  FROM eAll, q) t WHERE rnk <= $k),
       |cand AS (SELECT query_id, vec_id FROM (
       |  SELECT qc.query_id, a.vec_id,
       |    row_number() OVER (PARTITION BY qc.query_id
       |                       ORDER BY ${cosSql("a.v", "q.qv")} DESC, a.vec_id ASC) AS rnk
       |  FROM assignedS a
       |  JOIN qcell qc ON a.cell = qc.ci
       |  JOIN q ON q.query_id = qc.query_id) t WHERE rnk <= $k),
       |tot AS (SELECT CAST(coalesce(sum(hits), 0) AS BIGINT) AS th FROM (
       |  SELECT x.query_id, count(*) AS hits
       |  FROM exact x JOIN cand c ON c.query_id = x.query_id AND c.vec_id = x.vec_id
       |  GROUP BY x.query_id) hh),
       |qv0 AS (SELECT v AS qv FROM eAll WHERE vec_id = 0),
       |scell AS (SELECT ci FROM (
       |    SELECT u.ci AS ci, u.s AS s FROM (
       |      SELECT unnest(list_transform(range(1, ${nCells + 1}),
       |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "qv0.qv")}, 6)})) AS u
       |      FROM clS, qv0) z) t
       |  ORDER BY s DESC, ci ASC LIMIT $nProbe),
       |rcell AS (SELECT ci FROM (
       |    SELECT u.ci AS ci, u.s AS s FROM (
       |      SELECT unnest(list_transform(range(1, ${nCells + 1}),
       |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "qv0.qv")}, 6)})) AS u
       |      FROM clR, qv0) z) t
       |  ORDER BY s DESC, ci ASC LIMIT $nProbe),
       |assignedR AS (
       |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
       |    SELECT eAll.vec_id, eAll.label, eAll.v,
       |           list_transform(range(1, ${nCells + 1}), ci -> ${cosRawSql("cl[ci]", "eAll.v")}) AS sc
       |    FROM eAll, clR) t2),
       |staleArm AS (SELECT vec_id, label, score FROM (
       |  SELECT a.vec_id, a.label, ${cosSql("a.v", "qv0.qv")} AS score
       |  FROM assignedS a, qv0 WHERE a.cell IN (SELECT ci FROM scell)
       |  ORDER BY score DESC, vec_id ASC LIMIT $k) t),
       |freshArm AS (SELECT vec_id, label, score FROM (
       |  SELECT a.vec_id, a.label, ${cosSql("a.v", "qv0.qv")} AS score
       |  FROM assignedR a, qv0 WHERE a.cell IN (SELECT ci FROM rcell)
       |  ORDER BY score DESC, vec_id ASC LIMIT $k) t)
       |SELECT vec_id, label, score, rebuilt, total_hits FROM (
       |  SELECT s.vec_id, s.label, s.score, false AS rebuilt, tot.th AS total_hits
       |  FROM staleArm s, tot WHERE tot.th >= $minHits
       |  UNION ALL
       |  SELECT f.vec_id, f.label, f.score, true AS rebuilt, tot.th AS total_hits
       |  FROM freshArm f, tot WHERE tot.th < $minHits) u
       |ORDER BY score DESC, vec_id ASC""".stripMargin

  /** Recall@k of residual IVF-PQ vs raw-vector PQ, both against the exact
    * ranking of the probed-cell subset — mirrors Ann.ivfPqRecall (same
    * centroids, residual seeds vec_id 16..31 minus their assigned
    * centroids, same rounded-score ranking). MATERIALIZED throughout: the
    * CTE chain is deep and referenced multiply. */
  private def ivfPqRecallSql(nQ: Int = 8, k: Int = 10, nCells: Int = 16,
                             nProbe: Int = 4, m: Int = 8, dsub: Int = 8): String = {
    val dim = m * dsub
    s"""WITH e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS MATERIALIZED (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < $nCells),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQ),
       |qcell AS MATERIALIZED (SELECT query_id, ci FROM (
       |  SELECT query_id, ci,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, ci ASC) AS r
       |  FROM (SELECT z.query_id, u.ci AS ci, u.s AS s FROM (
       |        SELECT q.query_id, unnest(list_transform(range(1, ${nCells + 1}),
       |          ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
       |        FROM cents, q) z) y) t
       |  WHERE r <= $nProbe),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, v, list_position(sc, list_max(sc)) AS cell FROM (
       |    SELECT e.vec_id, e.v,
       |           list_transform(range(1, ${nCells + 1}), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
       |    FROM e, cents) t2),
       |rcbl AS MATERIALIZED (
       |  SELECT list(r ORDER BY vec_id) AS rl FROM (
       |    SELECT a.vec_id, list_transform(range(1, ${dim + 1}), i -> a.v[i] - cl[a.cell][i]) AS r
       |    FROM assigned a, cents WHERE a.vec_id >= $nCells AND a.vec_id < ${2 * nCells}) s0),
       |resid AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell, list_transform(range(1, ${dim + 1}), i -> a.v[i] - cl[a.cell][i]) AS r
       |  FROM assigned a, cents),
       |scs AS MATERIALIZED (SELECT vec_id,
       |    list_transform(range(0, $m), s ->
       |      list_transform(range(1, ${nCells + 1}), j ->
       |        list_sum(list_transform(range(1, ${dsub + 1}), i ->
       |          (r[s*$dsub+i] - rl[j][s*$dsub+i]) * (r[s*$dsub+i] - rl[j][s*$dsub+i]))))) AS scs
       |  FROM resid, rcbl),
       |rec AS MATERIALIZED (SELECT vec_id,
       |    flatten(list_transform(range(0, $m), s ->
       |      rl[list_position(scs[s+1], list_min(scs[s+1]))][s*$dsub+1:s*$dsub+$dsub])) AS rr
       |  FROM scs, rcbl),
       |recon AS MATERIALIZED (
       |  SELECT r2.vec_id, list_transform(range(1, ${dim + 1}), i -> rec.rr[i] + cl[r2.cell][i]) AS rv
       |  FROM rec JOIN resid r2 USING (vec_id), cents),
       |rawscs AS MATERIALIZED (SELECT vec_id,
       |    list_transform(range(0, $m), s ->
       |      list_transform(range(1, ${nCells + 1}), j ->
       |        list_sum(list_transform(range(1, ${dsub + 1}), i ->
       |          (v[s*$dsub+i] - cl[j][s*$dsub+i]) * (v[s*$dsub+i] - cl[j][s*$dsub+i]))))) AS scs
       |  FROM e, cents),
       |rawrec AS MATERIALIZED (SELECT vec_id,
       |    flatten(list_transform(range(0, $m), s ->
       |      cl[list_position(scs[s+1], list_min(scs[s+1]))][s*$dsub+1:s*$dsub+$dsub])) AS rv
       |  FROM rawscs, cents),
       |truth AS MATERIALIZED (SELECT query_id, vec_id FROM (
       |  SELECT qc.query_id, a.vec_id,
       |    row_number() OVER (PARTITION BY qc.query_id
       |                       ORDER BY ${cosSql("a.v", "q.qv")} DESC, a.vec_id ASC) AS rnk
       |  FROM assigned a JOIN qcell qc ON a.cell = qc.ci
       |  JOIN q ON q.query_id = qc.query_id) t WHERE rnk <= $k),
       |rtop AS (SELECT query_id, vec_id FROM (
       |  SELECT qc.query_id, a.vec_id,
       |    row_number() OVER (PARTITION BY qc.query_id
       |                       ORDER BY ${cosSql("rc.rv", "q.qv")} DESC, a.vec_id ASC) AS rnk
       |  FROM assigned a JOIN recon rc ON rc.vec_id = a.vec_id
       |  JOIN qcell qc ON a.cell = qc.ci
       |  JOIN q ON q.query_id = qc.query_id) t WHERE rnk <= $k),
       |wtop AS (SELECT query_id, vec_id FROM (
       |  SELECT qc.query_id, a.vec_id,
       |    row_number() OVER (PARTITION BY qc.query_id
       |                       ORDER BY ${cosSql("rw.rv", "q.qv")} DESC, a.vec_id ASC) AS rnk
       |  FROM assigned a JOIN rawrec rw ON rw.vec_id = a.vec_id
       |  JOIN qcell qc ON a.cell = qc.ci
       |  JOIN q ON q.query_id = qc.query_id) t WHERE rnk <= $k),
       |hr AS (SELECT t.query_id, count(*)::BIGINT AS hits
       |       FROM truth t JOIN rtop r ON r.query_id = t.query_id AND r.vec_id = t.vec_id
       |       GROUP BY t.query_id),
       |hw AS (SELECT t.query_id, count(*)::BIGINT AS hits
       |       FROM truth t JOIN wtop w ON w.query_id = t.query_id AND w.vec_id = t.vec_id
       |       GROUP BY t.query_id)
       |SELECT q.query_id, CAST(coalesce(hr.hits, 0) AS BIGINT) AS hits_resid,
       |       CAST(coalesce(hw.hits, 0) AS BIGINT) AS hits_raw,
       |       round(coalesce(hr.hits, 0) / ${k.toDouble}, 6) AS recall_resid,
       |       round(coalesce(hw.hits, 0) / ${k.toDouble}, 6) AS recall_raw
       |FROM q LEFT JOIN hr ON hr.query_id = q.query_id
       |       LEFT JOIN hw ON hw.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  /** Recall@k of the LSH probe vs the exact scan, per query — mirrors
    * Ann.annRecall (same planes, same rounded-score ranking, same
    * tie-break) so both engines elect identical top-k sets. */
  private def annRecallSql(nQ: Int = 8, k: Int = 10): String =
    s"""WITH $annKeysCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv, ks AS qks FROM keys WHERE vec_id < $nQ),
       |exact AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, k2.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |                       ORDER BY ${cosSql("k2.v", "q.qv")} DESC, k2.vec_id ASC) AS rnk
       |  FROM keys k2, q) t WHERE rnk <= $k),
       |annc AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, k2.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |                       ORDER BY ${cosSql("k2.v", "q.qv")} DESC, k2.vec_id ASC) AS rnk
       |  FROM keys k2, q
       |  WHERE len(list_intersect(k2.ks, q.qks)) > 0) t WHERE rnk <= $k),
       |h AS (SELECT x.query_id, count(*)::BIGINT AS hits
       |      FROM exact x JOIN annc a ON a.query_id = x.query_id AND a.vec_id = x.vec_id
       |      GROUP BY x.query_id)
       |SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |       round(coalesce(h.hits, 0) / ${k.toDouble}, 6) AS recall
       |FROM q LEFT JOIN h ON h.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin

  private def annTopkSql: String =
    s"""$annProbeSql
       |SELECT vec_id, label, score FROM scored
       |ORDER BY score DESC, vec_id ASC
       |LIMIT 10""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Incremental exact-dedup oracle — shared by the inline and stored-index
    * variants: the index is a cache of the reference fp set, so admissions
    * must be byte-identical. */
  private def dedupIncrementalSql: String =
    """WITH b AS (SELECT doc_id, text,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
      |  FROM documents),
      |off AS (SELECT coalesce(max(doc_id), 0) + 1 AS o FROM documents),
      |ref AS (SELECT DISTINCT sha256(text) AS fp FROM b WHERE bucket < 50),
      |inc AS (SELECT doc_id, text FROM b WHERE bucket >= 50
      |  UNION ALL SELECT doc_id + (SELECT o FROM off), text FROM b WHERE bucket < 10
      |  UNION ALL SELECT doc_id + 2 * (SELECT o FROM off), text FROM b WHERE bucket >= 95),
      |f AS (SELECT doc_id, sha256(text) AS fp FROM inc),
      |m AS (SELECT f.doc_id, f.fp,
      |    f.fp IN (SELECT fp FROM ref) AS seen_in_corpus,
      |    f.doc_id = min(f.doc_id) OVER (PARTITION BY f.fp) AS first_in_batch
      |  FROM f)
      |SELECT doc_id, fp, seen_in_corpus, first_in_batch,
      |  (NOT seen_in_corpus AND first_in_batch) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** Incremental near-dedup oracle — shared by the inline and stored-index
    * variants (same shingle/minhash/banding constants as ngramPairsSql,
    * incoming = bucket >= 50, reference = bucket < 50; the final base is
    * ALL incoming documents, restoring sub-n-char docs as admitted). */
  private def dedupNearIncrementalSql: String =
    """WITH sh AS MATERIALIZED (SELECT doc_id,
      |    list_transform(
      |      list_distinct(list_transform(range(0, length(text) - 7),
      |        i -> substr(text, CAST(i + 1 AS BIGINT), 8))),
      |      x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
      |  FROM documents WHERE length(text) >= 8),
      |mh AS MATERIALIZED (SELECT doc_id, bucket,
      |    list_transform(range(0, 12),
      |      sd -> list_min(list_transform(hs,
      |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
      |  FROM sh),
      |bands AS (SELECT doc_id, bucket, u.band, u.key FROM (
      |  SELECT doc_id, bucket, unnest(list_transform(range(0, 4), b ->
      |    {'band': b, 'key': array_to_string(sig[b*3+1:b*3+3], '|')})) AS u FROM mh) q),
      |cand AS (SELECT DISTINCT a.doc_id AS inc_id, b.doc_id AS ref_id
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |         WHERE a.bucket >= 50 AND b.bucket < 50),
      |v AS (SELECT c.inc_id, round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
      |        / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS j
      |      FROM cand c
      |      JOIN sh sa ON sa.doc_id = c.inc_id
      |      JOIN sh sb ON sb.doc_id = c.ref_id),
      |nears AS (SELECT inc_id, count(*) AS n_near, max(j) AS max_jaccard
      |          FROM v WHERE j >= 0.5 GROUP BY inc_id)
      |SELECT d.doc_id, CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near,
      |  coalesce(n.max_jaccard, 0.0) AS max_jaccard,
      |  coalesce(n.n_near, 0) = 0 AS keep
      |FROM (SELECT doc_id FROM documents
      |      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50) d
      |LEFT JOIN nears n ON n.inc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Word-shingle incremental near-dedup oracle — shared by the inline and
    * stored-index variants (same shingle/minhash/banding constants as the
    * dedup_minhash oracle: word trigrams, 12 seeds, 6 bands of r=2, τ=0.3;
    * incoming = bucket >= 50, reference = bucket < 50). */
  private def dedupMinhashIncrementalSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
      |  FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id, bucket,
      |    list_transform(
      |      list_distinct(list_transform(range(0, len(t) - 2),
      |        i -> array_to_string(t[i+1:i+3], ' '))),
      |      x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
      |  FROM toks WHERE len(t) >= 3),
      |mh AS MATERIALIZED (SELECT doc_id, bucket,
      |    list_transform(range(0, 12),
      |      sd -> list_min(list_transform(hs,
      |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
      |  FROM sh),
      |bands AS (SELECT doc_id, bucket, u.band, u.key FROM (
      |  SELECT doc_id, bucket, unnest(list_transform(range(0, 6), b ->
      |    {'band': b, 'key': array_to_string(sig[b*2+1:b*2+2], '|')})) AS u FROM mh) q),
      |cand AS (SELECT DISTINCT a.doc_id AS inc_id, b.doc_id AS ref_id
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |         WHERE a.bucket >= 50 AND b.bucket < 50),
      |v AS (SELECT c.inc_id, round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
      |        / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS j
      |      FROM cand c
      |      JOIN sh sa ON sa.doc_id = c.inc_id
      |      JOIN sh sb ON sb.doc_id = c.ref_id),
      |nears AS (SELECT inc_id, count(*) AS n_near, max(j) AS max_jaccard
      |          FROM v WHERE j >= 0.3 GROUP BY inc_id)
      |SELECT d.doc_id, CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near,
      |  coalesce(n.max_jaccard, 0.0) AS max_jaccard,
      |  coalesce(n.n_near, 0) = 0 AS keep
      |FROM (SELECT doc_id FROM documents
      |      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50) d
      |LEFT JOIN nears n ON n.inc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** [[dedupMinhashIncrementalSql]] with the signature-only verify —
    * shared by the inline and indexed approx variants (index-correctness
    * proof). The estimate is an integer equality count, exact in both
    * engines. */
  private def dedupMinhashApproxIncrementalSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
      |  FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id, bucket,
      |    list_transform(
      |      list_distinct(list_transform(range(0, len(t) - 2),
      |        i -> array_to_string(t[i+1:i+3], ' '))),
      |      x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
      |  FROM toks WHERE len(t) >= 3),
      |mh AS MATERIALIZED (SELECT doc_id, bucket,
      |    list_transform(range(0, 12),
      |      sd -> list_min(list_transform(hs,
      |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
      |  FROM sh),
      |bands AS (SELECT doc_id, bucket, u.band, u.key FROM (
      |  SELECT doc_id, bucket, unnest(list_transform(range(0, 6), b ->
      |    {'band': b, 'key': array_to_string(sig[b*2+1:b*2+2], '|')})) AS u FROM mh) q),
      |cand AS (SELECT DISTINCT a.doc_id AS inc_id, b.doc_id AS ref_id
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |         WHERE a.bucket >= 50 AND b.bucket < 50),
      |v AS (SELECT c.inc_id,
      |        round(len(list_filter(range(0, 12),
      |                i -> sa.sig[i+1] = sb.sig[i+1]))::DOUBLE / 12, 6) AS j
      |      FROM cand c
      |      JOIN mh sa ON sa.doc_id = c.inc_id
      |      JOIN mh sb ON sb.doc_id = c.ref_id),
      |nears AS (SELECT inc_id, count(*) AS n_near, max(j) AS max_est_jaccard
      |          FROM v WHERE j >= 0.5 GROUP BY inc_id)
      |SELECT d.doc_id, CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near,
      |  coalesce(n.max_est_jaccard, 0.0) AS max_est_jaccard,
      |  coalesce(n.n_near, 0) = 0 AS keep
      |FROM (SELECT doc_id FROM documents
      |      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50) d
      |LEFT JOIN nears n ON n.inc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Shared per-doc unigram-LM CTE chain (add-one smoothing, bucket<50
    * train slice) ending in `lper(doc_id, n_tokens, xent)` — used by the
    * lm_score oracle and as the LM arm of corpus_report, so the model
    * definition cannot drift between them. */
  private def lmPerDocCtes: String =
    """ltok AS MATERIALIZED (SELECT doc_id, lower(w) AS w FROM (
      |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
      |    FROM documents)),
      |lcounts AS MATERIALIZED (SELECT w, count(*) AS c FROM ltok
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 50
      |  GROUP BY w),
      |ltot AS (SELECT sum(c) AS n_train, count(*) AS v FROM lcounts),
      |lbits AS (SELECT t.doc_id,
      |    -log2((coalesce(c.c, 0) + 1.0)
      |          / ((SELECT n_train FROM ltot) + (SELECT v FROM ltot) + 1.0)) AS b
      |  FROM ltok t LEFT JOIN lcounts c ON t.w = c.w),
      |lper AS (SELECT doc_id, count(*) AS n_tokens,
      |    round(sum(b) / count(*), 6) AS xent FROM lbits GROUP BY doc_id)""".stripMargin

  /** Shared CTE chain for the BPE oracles: symbolized weighted word table
    * `bw0`, then 8 unrolled merge steps — each `bpK` = weighted pair
    * counts, `bmK` = the deterministic argmax, `bwK` = the leftmost-non-
    * overlapping replace (bit-identical to the JVM replace semantics the
    * operator uses; see operators/Bpe.scala). */
  private def bpeCtes: String = {
    def step(k: Int): String =
      s"""bp$k AS (SELECT prev AS a, cur AS b, sum(cnt) AS pc FROM (
         |    SELECT cnt, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS cur
         |    FROM (SELECT list_filter(string_split(sym, '  '), x -> x != '') AS t, cnt
         |          FROM bw${k - 1})
         |    WHERE len(t) >= 2)
         |  GROUP BY 1, 2),
         |bm$k AS MATERIALIZED (SELECT a, b, pc FROM bp$k ORDER BY pc DESC, a, b LIMIT 1),
         |bw$k AS MATERIALIZED (SELECT CASE
         |    WHEN (SELECT count(*) FROM bm$k) = 0 THEN sym
         |    ELSE replace(sym,
         |      ' ' || (SELECT a FROM bm$k) || '  ' || (SELECT b FROM bm$k) || ' ',
         |      ' ' || (SELECT a FROM bm$k) || (SELECT b FROM bm$k) || ' ') END AS sym, cnt
         |  FROM bw${k - 1})""".stripMargin
    s"""btok AS (SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS w
       |  FROM documents),
       |bw0 AS MATERIALIZED (SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym,
       |    count(*) AS cnt FROM btok GROUP BY w),
       |${(1 to 8).map(step).mkString(",\n")}""".stripMargin
  }

  /** Shared CTE chain for the trained-quality-classifier oracles: hashed
    * tf features `x`, labeled slices `lab`, 3 unrolled logistic-regression
    * steps (w0 = 0 makes step 1 closed-form), ending in `sc(doc_id, score)`
    * — used by quality_classifier and calibration_audit so the model
    * definition cannot drift between them. */
  private def qcCtes: String =
    """t0 AS (SELECT doc_id,
      |    list_transform(list_filter(string_split(text, ' '), x -> x != ''),
      |                   x -> lower(x)) AS t,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
      |  FROM documents),
      |tok AS (SELECT doc_id, ('0x' || substr(md5(unnest(t)), 1, 14))::UBIGINT % 4096 AS feat
      |  FROM t0 WHERE len(t) > 0),
      |cnts AS (SELECT doc_id, feat, count(*)::DOUBLE AS c FROM tok GROUP BY doc_id, feat),
      |nt AS (SELECT doc_id, sum(c) AS n FROM cnts GROUP BY doc_id),
      |x AS MATERIALIZED (SELECT cnts.doc_id, feat, c / n AS xf FROM cnts JOIN nt USING (doc_id)
      |  UNION ALL SELECT doc_id, 4096, 1.0 FROM documents),
      |lab AS (SELECT doc_id, CASE WHEN bucket < 20 THEN 1.0 ELSE 0.0 END AS y
      |  FROM t0 WHERE bucket < 20 OR bucket >= 50),
      |ntr AS (SELECT count(*)::DOUBLE AS m FROM lab),
      |xt AS MATERIALIZED (SELECT x.doc_id, x.feat, x.xf, lab.y FROM x JOIN lab USING (doc_id)),
      |g1 AS (SELECT feat, sum((0.5 - y) * xf) / (SELECT m FROM ntr) AS g
      |  FROM xt GROUP BY feat),
      |w1 AS (SELECT feat, -g AS w FROM g1),
      |e2 AS (SELECT doc_id, 1.0 / (1.0 + exp(-sum(coalesce(w1.w, 0) * xf)))
      |      - any_value(y) AS err
      |  FROM xt LEFT JOIN w1 USING (feat) GROUP BY doc_id),
      |g2 AS (SELECT feat, sum(err * xf) / (SELECT m FROM ntr) AS g
      |  FROM xt JOIN e2 USING (doc_id) GROUP BY feat),
      |w2 AS (SELECT coalesce(w1.feat, g2.feat) AS feat,
      |    coalesce(w1.w, 0) - coalesce(g2.g, 0) AS w
      |  FROM w1 FULL OUTER JOIN g2 ON w1.feat = g2.feat),
      |e3 AS (SELECT doc_id, 1.0 / (1.0 + exp(-sum(coalesce(w2.w, 0) * xf)))
      |      - any_value(y) AS err
      |  FROM xt LEFT JOIN w2 USING (feat) GROUP BY doc_id),
      |g3 AS (SELECT feat, sum(err * xf) / (SELECT m FROM ntr) AS g
      |  FROM xt JOIN e3 USING (doc_id) GROUP BY feat),
      |w3 AS (SELECT coalesce(w2.feat, g3.feat) AS feat,
      |    coalesce(w2.w, 0) - coalesce(g3.g, 0) AS w
      |  FROM w2 FULL OUTER JOIN g3 ON w2.feat = g3.feat),
      |sc AS (SELECT x.doc_id,
      |    round(1.0 / (1.0 + exp(-sum(coalesce(w3.w, 0) * xf))), 6) AS score
      |  FROM x LEFT JOIN w3 USING (feat) GROUP BY x.doc_id)""".stripMargin

  /** Closed-form OLS over a small `pts(lx, ly)` CTE → `fit(n_points,
    * slope, intercept, r2)` — the SQL mirror of TextAnalysis.olsFit,
    * shared by the zipf_fit and heaps_fit oracles. */
  private def olsSql: String =
    """m AS (SELECT count(*) AS n_points, avg(lx) AS mx, avg(ly) AS my,
      |    avg(lx * lx) AS mxx, avg(ly * ly) AS myy, avg(lx * ly) AS mxy
      |  FROM pts),
      |fit AS (SELECT n_points,
      |    (mxy - mx * my) / (mxx - mx * mx) AS slope,
      |    my - (mxy - mx * my) / (mxx - mx * mx) * mx AS intercept,
      |    CASE WHEN (mxx - mx * mx) = 0 OR (myy - my * my) = 0 THEN 0.0
      |         ELSE pow(mxy - mx * my, 2) / ((mxx - mx * mx) * (myy - my * my))
      |    END AS r2
      |  FROM m)""".stripMargin

  /** The corpus_filter gate CTE chain, ending in `cfd(doc_id,
    * quality_ok, repetition_ok, pii_ok, dedup_ok, cf_kept)` plus the
    * shared `buck` id-hash bucket table — reused verbatim by the
    * standalone corpus_filter oracle and the assembled `curate` pipeline
    * oracle so the gate definitions cannot drift between them. */
  private def corpusFilterCtes: String =
      """toks AS (SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS t FROM documents),
        |q AS (SELECT doc_id,
        |    round(least(1.0, len(t)::DOUBLE / 100.0)
        |      * (1.0 - CASE WHEN length(text) > 0
        |               THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
        |               ELSE 0.0 END)
        |      * (0.5 + 0.5 * CASE WHEN len(t) > 0
        |          THEN (len(list_filter(t, x -> x IN ('the','a','of','and','to','is')))
        |              + len(list_filter(t, x -> x IN ('el','la','de','que','y','en')))
        |              + len(list_filter(t, x -> x IN ('der','die','das','und','ist','ein'))))::DOUBLE / len(t)
        |          ELSE 0.0 END), 6) >= 0.3 AS quality_ok
        |  FROM toks),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN list_transform(range(0, len(t) - 1),
        |      i -> array_to_string(t[i+1:i+2], ' ')) ELSE CAST([] AS VARCHAR[]) END AS g2,
        |    CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2),
        |      i -> array_to_string(t[i+1:i+3], ' ')) ELSE CAST([] AS VARCHAR[]) END AS g3
        |  FROM toks),
        |top AS (SELECT doc_id, max(c) AS top_c FROM (
        |    SELECT doc_id, gi, count(*) AS c
        |    FROM (SELECT doc_id, unnest(g2) AS gi FROM g) u GROUP BY doc_id, gi) v
        |  GROUP BY doc_id),
        |rep AS (SELECT g.doc_id,
        |    NOT (round(CASE WHEN len(g2) > 0
        |           THEN coalesce(top.top_c, 0)::DOUBLE / len(g2) ELSE 0.0 END, 6) > 0.05
        |      OR round(CASE WHEN len(g3) > 0
        |           THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3) ELSE 0.0 END, 6) > 0.05)
        |      AS repetition_ok
        |  FROM g LEFT JOIN top ON g.doc_id = top.doc_id),
        |pii AS (SELECT doc_id,
        |    (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |     + len(regexp_extract_all(text, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |     + len(regexp_extract_all(text, '(?:[0-9]{1,3}\.){3}[0-9]{1,3}'))) = 0 AS pii_ok
        |  FROM documents),
        |dd AS (SELECT doc_id,
        |    doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS dedup_ok
        |  FROM documents),
        |buck AS (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
        |  FROM documents),
        |cfd AS (SELECT q.doc_id, q.quality_ok, rep.repetition_ok,
        |    pii.pii_ok, dd.dedup_ok,
        |    (q.quality_ok AND rep.repetition_ok AND pii.pii_ok AND dd.dedup_ok) AS cf_kept
        |  FROM q
        |  JOIN rep ON q.doc_id = rep.doc_id
        |  JOIN pii ON q.doc_id = pii.doc_id
        |  JOIN dd  ON q.doc_id = dd.doc_id)""".stripMargin

  /** Per-source mergeable-stats CTE chain (the SourceCurate contract):
    * reuses [[corpusFilterCtes]]' gate booleans verbatim (so the per-doc
    * definitions cannot drift between the doc gate and the source gate)
    * plus the quality SCORE, collapsed by one source-keyed aggregation —
    * ends in `sstats(source, n_docs, n_tokens, q_micro_sum,
    * n_low_quality, n_repetitive, n_pii)`. */
  private def sourceStatsCtes: String =
    s"""$corpusFilterCtes,
       |$sourceStatsTailCtes""".stripMargin

  /** The per-source tail of [[sourceStatsCtes]] — needs [[corpusFilterCtes]]
    * already in scope (shared with the `curate_sourced` oracle, whose
    * chain opens with the filter CTEs anyway). */
  private def sourceStatsTailCtes: String =
    s"""sq AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |    round(least(1.0, len(t)::DOUBLE / 100.0)
       |      * (1.0 - CASE WHEN length(text) > 0
       |               THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
       |               ELSE 0.0 END)
       |      * (0.5 + 0.5 * CASE WHEN len(t) > 0
       |          THEN (len(list_filter(t, x -> x IN ('the','a','of','and','to','is')))
       |              + len(list_filter(t, x -> x IN ('el','la','de','que','y','en')))
       |              + len(list_filter(t, x -> x IN ('der','die','das','und','ist','ein'))))::DOUBLE / len(t)
       |          ELSE 0.0 END), 6) AS quality
       |  FROM toks),
       |sstats AS (SELECT d.source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(sq.n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(round(sq.quality * 1000000.0) AS BIGINT)) AS BIGINT) AS q_micro_sum,
       |    CAST(sum(CASE WHEN cfd.quality_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_low_quality,
       |    CAST(sum(CASE WHEN cfd.repetition_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_repetitive,
       |    CAST(sum(CASE WHEN cfd.pii_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_pii
       |  FROM documents d JOIN sq ON d.doc_id = sq.doc_id
       |  JOIN cfd ON d.doc_id = cfd.doc_id
       |  GROUP BY d.source)""".stripMargin

  /** The budget-selection CTE chain (the BudgetSelect contract): per-doc
    * quality on the 6-dp grid (the [[sourceStatsTailCtes]] `sq` formula),
    * micro/bin by INTEGER arithmetic (`CAST(round(q·10⁶) AS BIGINT)`,
    * then `// 1000` — no float floor anywhere), and the token-weighted
    * bin histogram — ends in `bmic(doc_id, quality, n_tokens, micro,
    * bin)` and `bh(bin, n_docs, n_tokens)`. */
  private def budgetCtes: String =
    s"""toks AS (SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x != '') AS t FROM documents),
       |$budgetTailCtes""".stripMargin

  /** The per-doc tail of [[budgetCtes]] — needs `toks` already in scope
    * (shared with the `curate_budget` oracle, whose chain opens with the
    * filter CTEs anyway — the [[sourceStatsTailCtes]] device). */
  private def budgetTailCtes: String =
    s"""bq AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |    round(least(1.0, len(t)::DOUBLE / 100.0)
       |      * (1.0 - CASE WHEN length(text) > 0
       |               THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
       |               ELSE 0.0 END)
       |      * (0.5 + 0.5 * CASE WHEN len(t) > 0
       |          THEN (len(list_filter(t, x -> x IN ('the','a','of','and','to','is')))
       |              + len(list_filter(t, x -> x IN ('el','la','de','que','y','en')))
       |              + len(list_filter(t, x -> x IN ('der','die','das','und','ist','ein'))))::DOUBLE / len(t)
       |          ELSE 0.0 END), 6) AS quality
       |  FROM toks),
       |bmic AS (SELECT doc_id, quality, n_tokens,
       |    CAST(round(quality * 1000000.0) AS BIGINT) AS micro,
       |    CAST(CAST(round(quality * 1000000.0) AS BIGINT) // 1000 AS BIGINT) AS bin
       |  FROM bq),
       |bh AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |  FROM bmic GROUP BY bin)""".stripMargin

  /** The selection tail over [[budgetCtes]] for a budget expression
    * (a literal or a derived subquery): threshold bin by suffix sum,
    * boundary prefix by the single `(micro DESC, doc_id)` running sum —
    * the semantics Spark's two-level implementation must equal exactly.
    * Ends in `bsel(doc_id, quality, n_tokens, bin, region, kept)`. */
  private def budgetSelectCtes(budgetExpr: String): String =
    s"""$budgetCtes,
       |bb AS (SELECT CAST(($budgetExpr) AS BIGINT) AS budget),
       |bcum AS (SELECT bin, sum(n_tokens) OVER (ORDER BY bin DESC) AS cum_top FROM bh),
       |bth AS (SELECT coalesce((SELECT max(bin) FROM bcum, bb WHERE cum_top > budget), -1) AS t),
       |brem AS (SELECT budget - coalesce(
       |    (SELECT sum(n_tokens) FROM bh, bth WHERE bin > t), 0) AS remaining
       |  FROM bb),
       |brun AS (SELECT doc_id,
       |    sum(n_tokens) OVER (ORDER BY micro DESC, doc_id) AS running
       |  FROM bmic, bth WHERE bin = t),
       |bsel AS (SELECT m.doc_id, m.quality, m.n_tokens, m.bin,
       |    CASE WHEN m.bin > t THEN 'above' WHEN m.bin = t THEN 'boundary'
       |         ELSE 'below' END AS region,
       |    (m.bin > t OR (m.bin = t AND r.running <= remaining)) AS kept
       |  FROM bmic m CROSS JOIN bth CROSS JOIN brem
       |  LEFT JOIN brun r ON m.doc_id = r.doc_id)""".stripMargin

  /** The full decision-frame oracle at a given budget expression —
    * shared by the inline, indexed, and auto rungs. */
  private def budgetSelectSql(budgetExpr: String): String =
    s"""WITH ${budgetSelectCtes(budgetExpr)}
       |SELECT doc_id, quality, n_tokens, bin, region, kept
       |FROM bsel ORDER BY doc_id""".stripMargin

  /** The source-gate projection over `sstats` at minAvgQuality 0.29 —
    * shared by the inline and indexed gate oracles. */
  private def sourceGateSql: String =
    s"""WITH $sourceStatsCtes
       |SELECT source, n_docs, n_tokens,
       |  round(q_micro_sum::DOUBLE / 1000000.0 / n_docs, 6) AS avg_quality,
       |  round(n_low_quality::DOUBLE / n_docs, 6) AS low_quality_share,
       |  round(n_repetitive::DOUBLE / n_docs, 6) AS repetitive_share,
       |  round(n_pii::DOUBLE / n_docs, 6) AS pii_share,
       |  (round(q_micro_sum::DOUBLE / 1000000.0 / n_docs, 6) >= 0.29) AS quality_ok,
       |  (round(n_repetitive::DOUBLE / n_docs, 6) <= 0.5) AS repetition_ok,
       |  (round(n_pii::DOUBLE / n_docs, 6) <= 0.5) AS pii_ok,
       |  (n_docs >= 5) AS measured,
       |  (NOT (n_docs >= 5) OR (
       |     round(q_micro_sum::DOUBLE / 1000000.0 / n_docs, 6) >= 0.29
       |     AND round(n_repetitive::DOUBLE / n_docs, 6) <= 0.5
       |     AND round(n_pii::DOUBLE / n_docs, 6) <= 0.5)) AS keep
       |FROM sstats ORDER BY source""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "source_stats" ->
      s"""WITH $sourceStatsCtes
         |SELECT * FROM sstats ORDER BY source""".stripMargin,

    // the merge-identity proof: Spark merges the bucket-halves' stats;
    // the ground truth aggregates the whole corpus directly — equality IS
    // the mergeability property (every column a per-doc sum)
    "source_stats_merged" ->
      s"""WITH $sourceStatsCtes
         |SELECT * FROM sstats ORDER BY source""".stripMargin,

    "source_gate" -> sourceGateSql,
    "source_gate_indexed" -> sourceGateSql,

    // TOKEN-BUDGET selection (r18): the bin histogram, its merge-identity
    // proof (Spark merges bucket-halves; the ground truth aggregates the
    // whole corpus), and the decision frame at absolute/auto budgets
    "budget_hist" ->
      s"""WITH $budgetCtes
         |SELECT bin, n_docs, n_tokens FROM bh ORDER BY bin""".stripMargin,
    "budget_hist_merged" ->
      s"""WITH $budgetCtes
         |SELECT bin, n_docs, n_tokens FROM bh ORDER BY bin""".stripMargin,
    "budget_select" -> budgetSelectSql("9000"),
    "budget_select_indexed" -> budgetSelectSql("9000"),
    // the auto rung's budget: total tokens · 40 ÷ 100 in integer
    // arithmetic — exactly the Long math the Spark side runs
    "budget_select_auto" -> budgetSelectSql(
      "SELECT CAST(sum(n_tokens) AS BIGINT) * 40 // 100 FROM bq"),
    // incremental admission: merged evidence ≡ the whole corpus, so the
    // threshold derives from ALL documents; the incoming docs (id-hash
    // buckets ≥ 80) admit iff strictly above it (bin-granular — the
    // declared incremental semantics)
    "budget_select_incremental" ->
      s"""WITH ${budgetSelectCtes("9000")},
         |bbuck AS (SELECT doc_id,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
         |  FROM documents)
         |SELECT m.doc_id, m.quality, m.n_tokens, m.bin,
         |  (m.bin > t) AS admitted
         |FROM bmic m CROSS JOIN bth JOIN bbuck k ON m.doc_id = k.doc_id
         |WHERE k.b >= 80 ORDER BY m.doc_id""".stripMargin,
    "budget_audit" ->
      s"""WITH ${budgetSelectCtes("9000")},
         |bper AS (SELECT region,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
         |    CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |  FROM bsel GROUP BY region),
         |bach AS (SELECT CAST(coalesce(sum(kept_tokens), 0) AS BIGINT) AS achieved
         |  FROM bper)
         |SELECT region, n_docs, n_tokens, kept_docs, kept_tokens,
         |  (SELECT budget FROM bb) AS budget,
         |  achieved AS achieved_tokens,
         |  round(achieved::DOUBLE / (SELECT budget FROM bb)::DOUBLE, 6) AS fill_ratio
         |FROM bper CROSS JOIN bach ORDER BY region""".stripMargin,

    // the auto rung: measured sources ranked by (avg_quality, source),
    // bottom floor(n*10/100) block; unmeasured pass with NULL rank
    "source_gate_auto" ->
      s"""WITH $sourceStatsCtes,
         |shr AS (SELECT source, n_docs, n_tokens,
         |    round(q_micro_sum::DOUBLE / 1000000.0 / n_docs, 6) AS avg_quality,
         |    (n_docs >= 5) AS measured
         |  FROM sstats),
         |rk AS (SELECT source, n_docs, n_tokens, avg_quality, measured,
         |    CAST(row_number() OVER (ORDER BY avg_quality, source) AS BIGINT) AS q_rank,
         |    count(*) OVER () AS n
         |  FROM shr WHERE measured)
         |SELECT source, n_docs, n_tokens, avg_quality, measured, q_rank,
         |  (q_rank > (n * 10) // 100) AS keep
         |FROM rk
         |UNION ALL
         |SELECT source, n_docs, n_tokens, avg_quality, measured,
         |  CAST(NULL AS BIGINT) AS q_rank, TRUE AS keep
         |FROM shr WHERE NOT measured
         |ORDER BY source""".stripMargin,

    "source_filter" ->
      s"""WITH $sourceStatsCtes,
         |sg AS (SELECT source,
         |  (NOT (n_docs >= 5) OR (
         |     round(q_micro_sum::DOUBLE / 1000000.0 / n_docs, 6) >= 0.29
         |     AND round(n_repetitive::DOUBLE / n_docs, 6) <= 0.5
         |     AND round(n_pii::DOUBLE / n_docs, 6) <= 0.5)) AS source_ok
         |  FROM sstats)
         |SELECT d.doc_id, d.source, coalesce(sg.source_ok, TRUE) AS source_ok
         |FROM documents d LEFT JOIN sg ON d.source = sg.source
         |ORDER BY d.doc_id""".stripMargin,

    "topk_single" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${cosSql("e.v", "q.qv")} AS score
         |FROM e, q
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "topk_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${cosSql("e.v", "q.qv")} AS score
         |FROM e, q
         |WHERE e.label = 3
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "point_lookup" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS norm
        |FROM embeddings WHERE vec_id = 42""".stripMargin,

    "topk_via_catalog" ->
      s"""WITH e AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.id, ${cosSql("e.v", "q.qv")} AS score
         |FROM e, q
         |ORDER BY score DESC, id ASC
         |LIMIT 10""".stripMargin,

    "chunk_docs" ->
      s"""SELECT id, chunk, length(chunk) AS chunk_len FROM (${chunkSql(128)})""",

    "ingest_topk" ->
      s"""WITH chunks AS (${chunkSql(128)}),
         |emb AS (SELECT id, ${embSql("chunk")} AS v FROM chunks),
         |q AS (SELECT ${embSql("'spark data query'")} AS qv)
         |SELECT emb.id, ${cosSql("emb.v", "q.qv")} AS score
         |FROM emb, q
         |ORDER BY score DESC, id ASC
         |LIMIT 10""".stripMargin,

    // mirrors Search.chunkDocRetrieval: same chunk/embed CTEs as
    // ingest_topk, per-doc best chunk, doc ranking by that score
    "chunk_doc_topk" ->
      s"""WITH chunks AS (${chunkSql(128)}),
         |emb AS (SELECT id, CAST(string_split(id, '-')[1] AS BIGINT) AS doc_id,
         |               ${embSql("chunk")} AS v FROM chunks),
         |q AS (SELECT ${embSql("'spark data query'")} AS qv),
         |scored AS (SELECT doc_id, id, ${cosSql("emb.v", "q.qv")} AS score FROM emb, q),
         |best AS (SELECT doc_id, id AS best_chunk, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                               ORDER BY score DESC, id ASC) AS rn
         |  FROM scored) t WHERE rn = 1)
         |SELECT doc_id, best_chunk, score FROM best
         |ORDER BY score DESC, doc_id ASC
         |LIMIT 10""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, sha256(text) AS fp,
        |       doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS keep
        |FROM documents""".stripMargin,

    // mirrors Dedup.minhashNear: word-trigram shingles hashed to 56-bit
    // ints, 12 XOR-mask minhashes in 6 bands of r=2 (same banded skeleton
    // as ngramPairsSql), exact Jaccard on candidates, >= 0.3
    "dedup_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |         list_transform(
        |           list_distinct(list_transform(range(0, len(t) - 2),
        |             i -> array_to_string(t[i+1:i+3], ' '))),
        |           x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
        |       FROM toks WHERE len(t) >= 3),
        |mh AS (SELECT doc_id,
        |    list_transform(range(0, 12),
        |      sd -> list_min(list_transform(hs,
        |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
        |  FROM sh),
        |bands AS (SELECT doc_id, u.band, u.key FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, 6), b ->
        |    {'band': b, 'key': array_to_string(sig[b*2+1:b*2+2], '|')})) AS u FROM mh) q),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |v AS (SELECT c.a_id, c.b_id,
        |        round(len(list_intersect(sa.hs, sb.hs))::DOUBLE
        |              / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
        |      FROM cand c
        |      JOIN sh sa ON sa.doc_id = c.a_id
        |      JOIN sh sb ON sb.doc_id = c.b_id)
        |SELECT a_id, b_id, jaccard FROM v WHERE jaccard >= 0.3
        |ORDER BY a_id, b_id""".stripMargin,

    // mirrors Dedup.minhashNearApprox: same shingles/signature/banding as
    // dedup_minhash, verify = agreeing-seed fraction instead of exact
    // Jaccard (integer equality counts — exact in both engines)
    "dedup_minhash_approx" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |         list_transform(
        |           list_distinct(list_transform(range(0, len(t) - 2),
        |             i -> array_to_string(t[i+1:i+3], ' '))),
        |           x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT)) AS hs
        |       FROM toks WHERE len(t) >= 3),
        |mh AS (SELECT doc_id,
        |    list_transform(range(0, 12),
        |      sd -> list_min(list_transform(hs,
        |        b -> xor(b, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))))) AS sig
        |  FROM sh),
        |bands AS (SELECT doc_id, u.band, u.key FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, 6), b ->
        |    {'band': b, 'key': array_to_string(sig[b*2+1:b*2+2], '|')})) AS u FROM mh) q),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |v AS (SELECT c.a_id, c.b_id,
        |        round(len(list_filter(range(0, 12),
        |                i -> sa.sig[i+1] = sb.sig[i+1]))::DOUBLE / 12, 6) AS est_jaccard
        |      FROM cand c
        |      JOIN mh sa ON sa.doc_id = c.a_id
        |      JOIN mh sb ON sb.doc_id = c.b_id)
        |SELECT a_id, b_id, est_jaccard FROM v WHERE est_jaccard >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bits AS (SELECT vec_id, list_transform(range(0, 24), p ->
         |    CASE WHEN list_sum(list_transform(range(0, 64), i ->
         |      v[i+1] * (CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
         |                     BETWEEN '0' AND '7' THEN 1 ELSE -1 END)
         |    )) >= 0 THEN '1' ELSE '0' END) AS bs FROM e),
         |bands AS (SELECT vec_id, u.band, u.key FROM (
         |   SELECT vec_id, unnest(list_transform(range(0, 3), b ->
         |     {'band': b, 'key': array_to_string(bs[b*8+1:b*8+8], '')})) AS u FROM bits) q),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
         |v AS (SELECT c.a_id, c.b_id, ${cosSql("ea.v", "eb.v")} AS score
         |      FROM cand c
         |      JOIN e ea ON ea.vec_id = c.a_id
         |      JOIN e eb ON eb.vec_id = c.b_id)
         |SELECT a_id, b_id, score FROM v WHERE score >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,

    // SemDeDup: same seeded-centroid assignment as the IVF oracles
    // (raw argmax cosine, first position on ties), pairs within a cell only
    "dedup_semantic" -> semanticDedupSql,
    // the rung-picker twin below the literal threshold IS semanticDedup —
    // same oracle verbatim (the dedup_image_auto shared-oracle device)
    "dedup_semantic_auto" -> semanticDedupSql,

    // hot-cell split SemDeDup: same assignment as dedup_semantic, cells
    // with population > 32 pair only within an 8-bit SimHash sub-bucket
    // (planes re-derived from the md5 sign convention, as dedup_simhash)
    "dedup_semantic_split" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
         |    SELECT e.vec_id, e.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
         |    FROM e, cents) t),
         |sizes AS (SELECT cell, count(*) AS cn FROM assigned GROUP BY cell),
         |keyed AS (
         |  SELECT a.vec_id, a.v, a.cell, s.cn > 32 AS split,
         |    CASE WHEN s.cn > 32 THEN array_to_string(list_transform(range(0, 8), p ->
         |      CASE WHEN list_sum(list_transform(range(0, 64), i ->
         |        a.v[i+1] * (CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
         |                         BETWEEN '0' AND '7' THEN 1 ELSE -1 END)
         |      )) >= 0 THEN '1' ELSE '0' END), '') ELSE '' END AS sub
         |  FROM assigned a JOIN sizes s ON a.cell = s.cell),
         |dups AS (
         |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM keyed a JOIN keyed b
         |    ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.4
         |  GROUP BY b.vec_id)
         |SELECT k.vec_id, k.cell, k.split, (d.dup_of IS NULL) AS keep, d.dup_of
         |FROM keyed k LEFT JOIN dups d ON k.vec_id = d.vec_id
         |ORDER BY k.vec_id""".stripMargin,

    // the OR-of-bands recall dial at subBands = 2: hot-cell rows fan out
    // to one row per 4-bit half of the 8-bit sign key, pairs compare when
    // ANY band agrees (the within-cell simhashNear banding); cool cells
    // keep the single always-agreeing empty key
    "dedup_semantic_split2" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
         |    SELECT e.vec_id, e.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
         |    FROM e, cents) t),
         |sizes AS (SELECT cell, count(*) AS cn FROM assigned GROUP BY cell),
         |keyed0 AS (
         |  SELECT a.vec_id, a.v, a.cell, s.cn > 32 AS split,
         |    CASE WHEN s.cn > 32 THEN array_to_string(list_transform(range(0, 8), p ->
         |      CASE WHEN list_sum(list_transform(range(0, 64), i ->
         |        a.v[i+1] * (CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
         |                         BETWEEN '0' AND '7' THEN 1 ELSE -1 END)
         |      )) >= 0 THEN '1' ELSE '0' END), '') ELSE '' END AS bits
         |  FROM assigned a JOIN sizes s ON a.cell = s.cell),
         |kx AS (SELECT vec_id, v, cell, split, u.band AS band, u.key AS key FROM (
         |    SELECT vec_id, v, cell, split,
         |      unnest(CASE WHEN split
         |        THEN [{'band': 0, 'key': substr(bits, 1, 4)},
         |              {'band': 1, 'key': substr(bits, 5, 4)}]
         |        ELSE [{'band': 0, 'key': ''}] END) AS u
         |    FROM keyed0) q),
         |dups AS (
         |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM kx a JOIN kx b
         |    ON a.cell = b.cell AND a.band = b.band AND a.key = b.key
         |   AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.4
         |  GROUP BY b.vec_id)
         |SELECT k.vec_id, k.cell, k.split, (d.dup_of IS NULL) AS keep, d.dup_of
         |FROM keyed0 k LEFT JOIN dups d ON k.vec_id = d.vec_id
         |ORDER BY k.vec_id""".stripMargin,

    // incremental SemDeDup over the standard incremental split: centroids
    // from the REFERENCE slice's vec_id < 16 (len(cl) cells — the slice
    // keeps only some of 0..15), corpus hits via the cell equi-join,
    // in-batch hits via the lower-id self-join
    // incremental image admission: the standard split, the fake-grid dHash
    // chain of dedup_image on both sides, corpus arm = brute-force Hamming
    // vs the reference's DISTINCT hashes, batch arm = lower-id in-batch —
    // the banded+verified plan must return exactly these verdicts
    // (losslessness at maxHamming <= bands - agreeBands)
    "dedup_image_incremental" -> dedupImageIncrementalSql,
    "dedup_image_incremental_indexed" -> dedupImageIncrementalSql,
    "audio_dedup_incremental" -> audioDedupIncrementalSql,
    "audio_dedup_incremental_indexed" -> audioDedupIncrementalSql,
    "video_dedup_incremental" -> videoDedupIncrementalSql,
    "video_dedup_incremental_indexed" -> videoDedupIncrementalSql,

    "dedup_semantic_incremental" -> dedupSemanticIncrementalSql,

    // the indexed variant must produce BYTE-IDENTICAL admissions — the
    // stored index caches the reference assignment + centroids, nothing more
    "dedup_semantic_incremental_indexed" -> dedupSemanticIncrementalSql,

    // TWO-LEVEL SemDeDup: assignment via the shared hierarchical quantizer
    // CTEs (coarse literal + fine TABLE — the ivf_topk2 chain), pairing
    // within the FINE cell under the auto hot-cell cap rule
    // greatest(64, 4N/nFine); at this scale no fine cell trips the cap,
    // so the sub-key CASE stays cold on both engines
    "dedup_semantic2" -> semanticDedup2Sql,
    // the forced two-level rung (flatCellMax = 0) at the derived params
    // (nFine = 16, nCoarse = ⌈√16⌉ = 4) IS semanticDedup2's registered
    // call — same oracle verbatim
    "dedup_semantic_auto2" -> semanticDedup2Sql,

    // span-level duplication: distinct 5-word shingles (the minhash
    // shingling convention), df over the corpus, per-doc duplicated share
    "dedup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(0, len(t) - 4),
        |           i -> array_to_string(t[i+1:i+5], ' '))) AS gs
        |       FROM toks WHERE len(t) >= 5),
        |ex AS (SELECT doc_id, CAST(('0x' || substr(md5(g), 1, 14))::UBIGINT AS BIGINT) AS h
        |       FROM (SELECT doc_id, unnest(gs) AS g FROM sh) u),
        |dfs AS (SELECT h, count(*) AS df FROM ex GROUP BY h),
        |per AS (SELECT e.doc_id, count(*) AS n_shingles,
        |          count(*) FILTER (d.df >= 2) AS n_dup
        |        FROM ex e JOIN dfs d ON e.h = d.h GROUP BY e.doc_id)
        |SELECT doc.doc_id,
        |  coalesce(per.n_shingles, 0) AS n_shingles,
        |  coalesce(per.n_dup, 0) AS n_dup,
        |  round(coalesce(per.n_dup, 0)::DOUBLE / greatest(coalesce(per.n_shingles, 0), 1), 6) AS dup_fraction,
        |  coalesce(per.n_dup, 0)::DOUBLE / greatest(coalesce(per.n_shingles, 0), 1) >= 0.5 AS flagged
        |FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
        |ORDER BY doc.doc_id""".stripMargin,

    // mirrors Dedup.trimSpans: positions covered by a duplicated (df>=2,
    // per-doc-distinct) 5-word shingle removed; trimmed text reassembled
    // by ordered aggregation — Spark's sort_array(collect_list(struct))
    // reassembly == string_agg ORDER BY here
    "span_trim" ->
      """WITH t0 AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, u.pos AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(t[u.pos+1:u.pos+5], ' ')), 1, 14))::UBIGINT AS BIGINT) AS h
        |  FROM (SELECT doc_id, t, unnest(list_transform(range(0, len(t) - 4), i -> {'pos': i})) AS u
        |        FROM t0 WHERE len(t) >= 5) q),
        |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM pos) dd
        |        GROUP BY h HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT p.doc_id, p.pos + r.d AS ti
        |        FROM pos p JOIN dup USING (h) CROSS JOIN range(0, 5) r(d)),
        |tok AS (SELECT doc_id, u.ti AS ti, u.w AS w FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(t)), i -> {'ti': i, 'w': t[i+1]})) AS u
        |  FROM t0 WHERE len(t) >= 5) q),
        |kept AS (SELECT tok.doc_id, string_agg(w, ' ' ORDER BY tok.ti) AS kept_text,
        |           count(*) AS n_kept
        |         FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ti = cov.ti
        |         WHERE cov.ti IS NULL GROUP BY tok.doc_id)
        |SELECT t0.doc_id,
        |  CASE WHEN len(t) < 5 THEN text ELSE coalesce(kept.kept_text, '') END AS kept_text,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN len(t) < 5 THEN 0
        |            ELSE len(t) - coalesce(kept.n_kept, 0) END AS BIGINT) AS n_removed,
        |  round((CASE WHEN len(t) < 5 THEN 0
        |              ELSE len(t) - coalesce(kept.n_kept, 0) END)::DOUBLE
        |        / greatest(len(t), 1), 6) AS removed_ratio
        |FROM t0 LEFT JOIN kept ON t0.doc_id = kept.doc_id
        |ORDER BY t0.doc_id""".stripMargin,

    "dedup_ngram" ->
      s"""WITH ${ngramPairsSql()}
         |SELECT a_id, b_id, jaccard FROM pairs ORDER BY a_id, b_id""".stripMargin,

    "dedup_resolve" ->
      s"""WITH ${ngramPairsSql()}
         |SELECT d.doc_id, d.doc_id NOT IN (SELECT b_id FROM pairs) AS keep
         |FROM documents d ORDER BY d.doc_id""".stripMargin,

    "dedup_groups" -> dedupGroupsOracleSql,

    // the star-contraction form must land the SAME components through a
    // structurally different loop (the shared-oracle device): the oracle
    // is dedup_groups' recursive walk verbatim
    "dedup_groups_star" -> dedupGroupsOracleSql,

    // the stored component map is a cache of the same computation —
    // byte-identical labels through the registry
    "dedup_groups_indexed" -> dedupGroupsOracleSql,

    // dedup_groups' components + a split hashed on the GROUP id — the
    // leakage-safe split contract (no near-dup pair straddles the split)
    "leak_safe_split" ->
      s"""WITH RECURSIVE ${ngramPairsSql()},
         |e AS (SELECT a_id AS a, b_id AS b FROM pairs
         |      UNION SELECT b_id, a_id FROM pairs),
         |walk(a, b) AS (SELECT a, b FROM e
         |               UNION SELECT walk.a, e.b FROM walk JOIN e ON walk.b = e.a),
         |roots AS (SELECT a AS id, least(a, min(b)) AS root FROM walk GROUP BY a),
         |g AS (SELECT d.doc_id, coalesce(r.root, d.doc_id) AS group_id
         |      FROM documents d LEFT JOIN roots r ON d.doc_id = r.id)
         |SELECT doc_id, group_id,
         |  CASE WHEN ('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |       THEN 'train' ELSE 'test' END AS split
         |FROM g ORDER BY doc_id""".stripMargin,

    // same shingle/minhash/banding constants as ngramPairsSql, split into
    // incoming (bucket >= 50) vs reference (bucket < 50) sides; the final
    // base is ALL incoming documents (not just shingled ones) to mirror
    // the operator's left join restoring sub-n-char docs as admitted
    "dedup_near_incremental" -> dedupNearIncrementalSql,
    "dedup_near_incremental_indexed" -> dedupNearIncrementalSql,
    "dedup_minhash_incremental" -> dedupMinhashIncrementalSql,
    "dedup_minhash_incremental_indexed" -> dedupMinhashIncrementalSql,
    "dedup_minhash_approx_incremental" -> dedupMinhashApproxIncrementalSql,
    "dedup_minhash_approx_incremental_indexed" -> dedupMinhashApproxIncrementalSql,
    // mirrors Dedup.sourceOverlap: per-source 64-seed MinHash signature
    // over word-trigram shingle hashes, est Jaccard = agreeing-seed share
    "source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT source, unnest(list_transform(
        |    list_distinct(list_transform(range(0, len(t) - 2),
        |      i -> array_to_string(t[i+1:i+3], ' '))),
        |    x -> CAST(('0x' || substr(md5(x), 1, 14))::UBIGINT AS BIGINT))) AS h
        |  FROM toks WHERE len(t) >= 3),
        |mins AS (SELECT source, sd,
        |    min(xor(h, CAST(('0x' || substr(md5(CAST(sd AS VARCHAR)), 1, 14))::UBIGINT AS BIGINT))) AS mh
        |  FROM sh CROSS JOIN range(0, 64) r(sd) GROUP BY source, sd)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)::DOUBLE / 64, 6) AS est_jaccard
        |FROM mins a JOIN mins b ON a.sd = b.sd AND a.source < b.source
        |GROUP BY a.source, b.source
        |ORDER BY source_a, source_b""".stripMargin,

    "dedup_incremental" -> dedupIncrementalSql,
    // the indexed variant must produce BYTE-IDENTICAL admissions — the
    // stored index is a cache of the reference fp set, nothing more
    "dedup_incremental_indexed" -> dedupIncrementalSql,

    "decontaminate" ->
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |hs AS (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket,
        |    list_distinct(list_transform(range(0, len(t) - 4),
        |      i -> CAST(('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 14))::UBIGINT AS BIGINT))) AS hs
        |  FROM t0),
        |bench AS (SELECT DISTINCT unnest(hs) AS g FROM hs WHERE bucket >= 90),
        |train AS (SELECT doc_id, hs FROM hs WHERE bucket < 80),
        |tg AS (SELECT doc_id, unnest(hs) AS g FROM train),
        |hits AS (SELECT doc_id, count(*) AS n FROM tg JOIN bench USING (g) GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.hs) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
        |  round(CASE WHEN len(t.hs) > 0 THEN coalesce(h.n, 0)::DOUBLE / len(t.hs) ELSE 0.0 END, 6) AS contamination,
        |  coalesce(h.n, 0) > 0 AS contaminated
        |FROM train t LEFT JOIN hits h USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "decontaminate_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
         |  FROM embeddings),
         |bench AS (SELECT v AS bv FROM e WHERE bucket >= 90),
         |train AS (SELECT vec_id, v FROM e WHERE bucket < 80),
         |s AS (SELECT t.vec_id, coalesce(${cosSql("t.v", "b.bv")}, 0.0) AS sc
         |  FROM train t LEFT JOIN bench b ON true)
         |SELECT vec_id, max(sc) AS max_sim, max(sc) >= 0.35 AS contaminated
         |FROM s GROUP BY vec_id
         |ORDER BY vec_id""".stripMargin,

    "bigram_novelty" ->
      """WITH t0 AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS t FROM documents),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN list_distinct(list_transform(range(0, len(t) - 1),
        |      i -> array_to_string(t[i+1:i+2], ' '))) ELSE CAST([] AS VARCHAR[]) END AS g2
        |  FROM t0),
        |dg AS (SELECT doc_id, unnest(g2) AS g FROM g),
        |dfq AS (SELECT g, count(*) AS df FROM dg GROUP BY g),
        |per AS (SELECT dg.doc_id, count(*) AS n_bigrams,
        |    sum(CASE WHEN dfq.df < 3 THEN 1 ELSE 0 END) AS n_rare
        |  FROM dg JOIN dfq USING (g) GROUP BY dg.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(p.n_rare, 0) AS BIGINT) AS n_rare,
        |  round(CASE WHEN coalesce(p.n_bigrams, 0) > 0
        |    THEN coalesce(p.n_rare, 0)::DOUBLE / p.n_bigrams ELSE 0.0 END, 6) AS novelty
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // mirrors CorpusFilter.report: per-lang rollup of the per-doc arms
    // (quality, exact-dup keep, raw-text PII, unigram-LM xent)
    "corpus_report" ->
      ("""WITH tq AS (SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','is'))) AS en_hits,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','que','y','en'))) AS es_hits,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist','ein'))) AS de_hits,
        |    CASE WHEN length(text) > 0
        |         THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
        |         ELSE 0.0 END AS punct_raw
        |  FROM documents),
        |qual AS (SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    round(least(1.0, n_tokens::DOUBLE / 100.0) * (1.0 - punct_raw)
        |      * (0.5 + 0.5 * CASE WHEN n_tokens > 0
        |                          THEN (en_hits + es_hits + de_hits)::DOUBLE / n_tokens
        |                          ELSE 0.0 END), 6) AS quality
        |  FROM tq),
        |dup AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS keep
        |  FROM documents),
        |p1 AS (SELECT doc_id, text,
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        |  FROM documents),
        |p2 AS (SELECT doc_id, text, after_email,
        |    regexp_replace(after_email, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS after_phone
        |  FROM p1),
        |pii AS (SELECT doc_id,
        |    (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |     + len(regexp_extract_all(after_email, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |     + len(regexp_extract_all(after_phone, '(?:[0-9]{1,3}\.){3}[0-9]{1,3}'))) > 0 AS has_pii
        |  FROM p2),
        |""".stripMargin + lmPerDocCtes + """,
        |lm AS (SELECT d.doc_id, coalesce(l.xent, 0.0) AS xent
        |  FROM documents d LEFT JOIN lper l ON l.doc_id = d.doc_id)
        |SELECT qual.lang, count(*) AS n_docs,
        |  CAST(sum(qual.n_tokens) AS BIGINT) AS total_tokens,
        |  round(sum(CAST(round(qual.quality * 1000000.0) AS BIGINT))::DOUBLE
        |        / 1000000.0 / count(*), 6) AS avg_quality,
        |  round(avg(CASE WHEN dup.keep THEN 0.0 ELSE 1.0 END), 6) AS exact_dup_share,
        |  round(avg(CASE WHEN pii.has_pii THEN 1.0 ELSE 0.0 END), 6) AS pii_share,
        |  round(sum(CAST(round(lm.xent * 1000000.0) AS BIGINT))::DOUBLE
        |        / 1000000.0 / count(*), 6) AS avg_xent
        |FROM qual JOIN dup USING (doc_id) JOIN pii USING (doc_id) JOIN lm USING (doc_id)
        |GROUP BY qual.lang ORDER BY qual.lang""".stripMargin),

    // mirrors TextAnalysis.lmCrossEntropy: unigram add-one LM trained on
    // the bucket<50 slice, per-token cross-entropy in bits over all docs
    "lm_score" ->
      s"""WITH $lmPerDocCtes
        |SELECT d.doc_id, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  coalesce(p.xent, 0.0) AS xent
        |FROM documents d LEFT JOIN lper p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // mirrors TextAnalysis.doremiWeights: one multiplicative-weights step
    // over per-source mean xent vs the corpus mean, token-share baseline
    "doremi_weights" ->
      s"""WITH $lmPerDocCtes,
        |per AS (SELECT d.doc_id, d.source,
        |    coalesce(p.n_tokens, 0) AS n_tokens, coalesce(p.xent, 0.0) AS xent
        |  FROM documents d LEFT JOIN lper p ON p.doc_id = d.doc_id),
        |bysrc AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    round(sum(CAST(round(xent * 1000000.0) AS BIGINT))::DOUBLE
        |          / 1000000.0 / count(*), 6) AS mean_xent
        |  FROM per GROUP BY source),
        |gl AS (SELECT round(sum(CAST(round(xent * 1000000.0) AS BIGINT))::DOUBLE
        |          / 1000000.0 / count(*), 6) AS global_xent,
        |    sum(n_tokens) AS total_tokens FROM per),
        |raw AS (SELECT source, n_docs, n_tokens, mean_xent,
        |    round(greatest(mean_xent - gl.global_xent, 0.0), 6) AS excess,
        |    (n_tokens::DOUBLE / gl.total_tokens) *
        |      exp(1.0 * round(greatest(mean_xent - gl.global_xent, 0.0), 6)) AS raw_w
        |  FROM bysrc, gl)
        |SELECT source, n_docs, n_tokens, mean_xent, excess,
        |  round(raw_w / (SELECT sum(raw_w) FROM raw), 6) AS weight
        |FROM raw ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.perplexityBuckets: per-language xent terciles
    // from the deterministic 30% hash sample, value-at-rank ceil(j*n/3)
    // thresholds, head = lowest xent (CCNet head/middle/tail)
    "ppl_buckets" ->
      s"""WITH $lmPerDocCtes,
        |lx AS (SELECT d.doc_id, d.lang, coalesce(p.xent, 0.0) AS xent
        |  FROM documents d LEFT JOIN lper p ON p.doc_id = d.doc_id),
        |samp AS (SELECT lang, xent,
        |    row_number() OVER (PARTITION BY lang ORDER BY xent, doc_id) AS r,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM lx
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 30),
        |thr AS (SELECT lang,
        |    min(CASE WHEN r = CAST(ceil(n / 3.0) AS BIGINT) THEN xent END) AS t1,
        |    min(CASE WHEN r = CAST(ceil(2.0 * n / 3.0) AS BIGINT) THEN xent END) AS t2
        |  FROM samp GROUP BY lang)
        |SELECT lx.doc_id, lx.lang, lx.xent,
        |  CASE WHEN thr.lang IS NULL THEN 'tail'
        |       WHEN lx.xent <= thr.t1 THEN 'head'
        |       WHEN lx.xent <= thr.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM lx LEFT JOIN thr ON lx.lang = thr.lang
        |ORDER BY lx.doc_id""".stripMargin,

    // mirrors TextAnalysis.lmCrossEntropyBigram: Jelinek-Mercer
    // interpolation of a bigram MLE with the add-one unigram, lambda 0.7,
    // unigram-only at position 0 / unseen context
    "lm_score_bigram" ->
      """WITH t0 AS (SELECT doc_id,
        |    list_transform(list_filter(string_split(text, ' '), x -> x != ''),
        |                   x -> lower(x)) AS t,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
        |  FROM documents),
        |tok AS MATERIALIZED (SELECT doc_id, bucket,
        |    unnest(range(len(t))) AS pos, unnest(t) AS cur,
        |    unnest(list_concat(CAST([NULL] AS VARCHAR[]), t[1:len(t)-1])) AS prev
        |  FROM t0 WHERE len(t) > 0),
        |uni AS MATERIALIZED (SELECT cur, count(*) AS c FROM tok WHERE bucket < 50 GROUP BY cur),
        |big AS MATERIALIZED (SELECT prev, cur, count(*) AS cb FROM tok
        |  WHERE bucket < 50 AND prev IS NOT NULL GROUP BY prev, cur),
        |ctx AS (SELECT prev, sum(cb) AS cctx FROM big GROUP BY prev),
        |tot AS (SELECT sum(c) AS n_train, count(*) AS v FROM uni),
        |bits AS (SELECT t.doc_id,
        |    -log2(CASE WHEN t.prev IS NOT NULL AND cx.cctx > 0
        |      THEN 0.7 * (coalesce(b.cb, 0)::DOUBLE / cx.cctx::DOUBLE)
        |           + (1.0 - 0.7) * ((coalesce(u.c, 0)::DOUBLE + 1.0)
        |               / ((SELECT n_train FROM tot)::DOUBLE + (SELECT v FROM tot)::DOUBLE + 1.0))
        |      ELSE (coalesce(u.c, 0)::DOUBLE + 1.0)
        |           / ((SELECT n_train FROM tot)::DOUBLE + (SELECT v FROM tot)::DOUBLE + 1.0)
        |      END) AS b
        |  FROM tok t
        |  LEFT JOIN uni u ON u.cur = t.cur
        |  LEFT JOIN ctx cx ON cx.prev = t.prev
        |  LEFT JOIN big b ON b.prev = t.prev AND b.cur = t.cur),
        |per AS (SELECT doc_id, count(*) AS n_tokens,
        |    round(sum(b) / count(*), 6) AS xent FROM bits GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  coalesce(p.xent, 0.0) AS xent
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // mirrors TextAnalysis.dsirWeights: hashed-token (hash56 mod 4096)
    // add-one models on the target (bucket<20) and raw (bucket>=50)
    // slices; per-doc log2-likelihood ratio
    "dsir_weights" ->
      """WITH t0 AS (SELECT doc_id,
        |    list_transform(list_filter(string_split(text, ' '), x -> x != ''),
        |                   x -> lower(x)) AS t,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bucket
        |  FROM documents),
        |tok AS MATERIALIZED (SELECT doc_id, bucket,
        |    ('0x' || substr(md5(unnest(t)), 1, 14))::UBIGINT % 4096 AS feat
        |  FROM t0 WHERE len(t) > 0),
        |tgt AS (SELECT feat, count(*) AS ct FROM tok WHERE bucket < 20 GROUP BY feat),
        |rawm AS (SELECT feat, count(*) AS cr FROM tok WHERE bucket >= 50 GROUP BY feat),
        |tot AS (SELECT (SELECT sum(ct) FROM tgt) AS nt, (SELECT sum(cr) FROM rawm) AS nr),
        |per AS (SELECT t.doc_id, count(*) AS n_tokens,
        |    sum(log2((coalesce(g.ct, 0)::DOUBLE + 1.0) / (tot.nt::DOUBLE + 4096.0))
        |      - log2((coalesce(r.cr, 0)::DOUBLE + 1.0) / (tot.nr::DOUBLE + 4096.0))) AS s
        |  FROM tok t
        |  LEFT JOIN tgt g ON g.feat = t.feat
        |  LEFT JOIN rawm r ON r.feat = t.feat, tot
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  round(coalesce(p.s, 0.0), 6) AS lr_bits,
        |  round(coalesce(p.s / p.n_tokens, 0.0), 6) AS lr_per_token
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // mirrors TextAnalysis.qualityClassifier: 3 unrolled full-batch
    // logistic-regression steps (w0 = 0 makes step 1 closed-form), lr 1.0,
    // mean gradient, tf features + bias over the same hashed space as dsir
    "quality_classifier" ->
      s"""WITH $qcCtes
        |SELECT d.doc_id, sc.score, sc.score >= 0.5 AS pass
        |FROM documents d JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // mirrors TextAnalysis.calibrationAudit: the classifier's scores binned
    // into 10 equal-width confidence bins over the labeled slices, plus the
    // corpus ECE replicated onto every row
    "calibration_audit" ->
      s"""WITH $qcCtes,
        |j AS (SELECT least(CAST(floor(sc.score * 10) AS BIGINT), 9) AS bin,
        |        sc.score, lab.y
        |      FROM sc JOIN lab USING (doc_id)),
        |b AS (SELECT bin, count(*) AS n,
        |    sum(CAST(round(score * 1000000.0) AS BIGINT))::DOUBLE
        |      / 1000000.0 / count(*) AS conf, avg(y) AS acc
        |      FROM j GROUP BY bin),
        |t AS (SELECT sum(n) AS nt, sum(n * abs(conf - acc)) AS gap_sum FROM b)
        |SELECT bin, CAST(n AS BIGINT) AS n,
        |  round(conf, 6) AS confidence, round(acc, 6) AS accuracy,
        |  round(abs(conf - acc), 6) AS abs_gap,
        |  round(gap_sum / nt, 6) AS ece
        |FROM b, t ORDER BY bin""".stripMargin,

    // mirrors TextAnalysis.classifierAuc: tie-aware Mann-Whitney AUC over
    // distinct classifier scores (ties count half)
    "classifier_auc" ->
      s"""WITH $qcCtes,
        |ps AS (SELECT sc.score, sum(lab.y) AS np, sum(1.0 - lab.y) AS nn
        |       FROM sc JOIN lab USING (doc_id) GROUP BY sc.score),
        |t AS (SELECT np, nn,
        |        coalesce(sum(nn) OVER (ORDER BY score
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nnb
        |      FROM ps),
        |a AS (SELECT sum(np) AS npos, sum(nn) AS nneg,
        |        sum(np * (nnb + nn / 2)) AS u FROM t)
        |SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
        |  CASE WHEN npos = 0 OR nneg = 0 THEN 0.5
        |       ELSE round(u / (npos * nneg), 6) END AS auc
        |FROM a""".stripMargin,

    // mirrors TextAnalysis.zipfFit: ln-ln OLS over the top-100 token
    // frequencies, rank ties broken by token
    "zipf_fit" ->
      s"""WITH tok AS (SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS w
        |             FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w ORDER BY c DESC, w LIMIT 100),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank FROM cnt),
        |pts AS (SELECT ln(rank::DOUBLE) AS lx, ln(c::DOUBLE) AS ly FROM rk),
        |$olsSql
        |SELECT CAST(n_points AS BIGINT) AS n_points,
        |  round(slope, 6) + 0.0 AS slope, round(intercept, 6) + 0.0 AS intercept,
        |  round(r2, 6) + 0.0 AS r2
        |FROM fit""".stripMargin,

    // mirrors TextAnalysis.heapsFit: vocabulary growth over 16 hash-ordered
    // doc groups — first-group vocab entry + per-group token counts, then
    // ln-ln OLS over the cumulative checkpoints
    "heaps_fit" ->
      s"""WITH tok AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 16 AS g,
        |    lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS w
        |  FROM documents),
        |pg AS (SELECT g, count(*) AS toks FROM tok GROUP BY g),
        |fi AS (SELECT g, count(*) AS vnew FROM (
        |    SELECT w, min(g) AS g FROM tok GROUP BY w) GROUP BY g),
        |cum AS (SELECT pg.g, sum(pg.toks) OVER (ORDER BY pg.g) AS n,
        |        sum(coalesce(fi.vnew, 0)) OVER (ORDER BY pg.g) AS v
        |        FROM pg LEFT JOIN fi ON pg.g = fi.g),
        |pts AS (SELECT ln(n::DOUBLE) AS lx, ln(v::DOUBLE) AS ly FROM cum
        |        WHERE n > 0 AND v > 0),
        |$olsSql
        |SELECT CAST(n_points AS BIGINT) AS n_points,
        |  round(slope, 6) + 0.0 AS beta, round(intercept, 6) + 0.0 AS ln_k,
        |  round(r2, 6) + 0.0 AS r2
        |FROM fit""".stripMargin,


    "corpus_filter" ->
      s"""WITH $corpusFilterCtes
        |SELECT doc_id, quality_ok, repetition_ok, pii_ok, dedup_ok,
        |  cf_kept AS kept
        |FROM cfd ORDER BY doc_id""".stripMargin,

    // the assembled pipeline: corpus_filter's gates + near-dedup keeper
    // election + train-split decontamination + hash split + token-budget
    // shards over kept train docs — every arm shared verbatim with its
    // standalone oracle
    "curate_approx" ->
      s"""WITH $corpusFilterCtes,
        |${approxPairsSql()},
        |dct0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |dchs AS (SELECT doc_id,
        |    list_distinct(list_transform(range(0, len(t) - 4),
        |      i -> CAST(('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 14))::UBIGINT AS BIGINT))) AS hs
        |  FROM dct0),
        |dcbench AS (SELECT DISTINCT unnest(hs) AS g FROM dchs
        |  JOIN buck USING (doc_id) WHERE b >= 90),
        |dctg AS (SELECT dchs.doc_id, unnest(hs) AS g FROM dchs
        |  JOIN buck USING (doc_id) WHERE b < 80),
        |dchits AS (SELECT doc_id, count(*) AS n FROM dctg
        |  JOIN dcbench USING (g) GROUP BY doc_id),
        |flags AS (SELECT cfd.doc_id, cfd.quality_ok, cfd.repetition_ok,
        |    cfd.pii_ok, cfd.dedup_ok,
        |    cfd.doc_id NOT IN (SELECT b_id FROM pairs) AS near_ok,
        |    CASE WHEN buck.b < 80 THEN coalesce(dchits.n, 0) = 0
        |         ELSE TRUE END AS decontam_ok,
        |    buck.b AS b
        |  FROM cfd JOIN buck ON cfd.doc_id = buck.doc_id
        |  LEFT JOIN dchits ON cfd.doc_id = dchits.doc_id),
        |fk AS (SELECT *, (quality_ok AND repetition_ok AND pii_ok AND dedup_ok
        |    AND near_ok AND decontam_ok) AS kept FROM flags),
        |ck AS (SELECT fk.doc_id,
        |    CAST(len(list_filter(string_split(d.text, ' '), x -> x != '')) AS BIGINT) AS n_tok
        |  FROM fk JOIN documents d ON fk.doc_id = d.doc_id
        |  WHERE fk.kept AND fk.b < 80),
        |cs AS (SELECT doc_id,
        |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 10000 AS shard
        |  FROM ck)
        |SELECT fk.doc_id, fk.quality_ok, fk.repetition_ok, fk.pii_ok,
        |  fk.dedup_ok, fk.near_ok, fk.decontam_ok, fk.kept,
        |  CASE WHEN NOT fk.kept THEN NULL
        |       WHEN fk.b < 80 THEN 'train'
        |       WHEN fk.b < 90 THEN 'val' ELSE 'bench' END AS split,
        |  CAST(cs.shard AS BIGINT) AS shard
        |FROM fk LEFT JOIN cs ON fk.doc_id = cs.doc_id
        |ORDER BY fk.doc_id""".stripMargin,

    "curate" -> curateSqlFor(runDecontam = false),
    // the run-rule frame: identical CTE chain except the decontamination
    // arm — positional postings, the cross-side island merge, and the
    // >= 13-token rhit set replace the shingle-set overlap
    "curate_runs" -> curateSqlFor(runDecontam = true),
    // the host-arm frame: same chain + the sstats CTEs and one more gate
    "curate_sourced" -> curateSqlFor(runDecontam = false, sourceGate = true),
    "curate_budget" -> curateSqlFor(runDecontam = false, budget = Some(8000L)),


    // the multimodal frame: the curate CTEs verbatim (corpus filter, n-gram
    // near pairs, decontamination, text flags) plus the three modality
    // dedup chains over the constructed pair-device corpus — image =
    // dedup_image's fake-grid chain, audio = audio_dedup's envelope-
    // collapse + landmark-vote chain, video = video_dedup's fingerprint-
    // collapse + frame-vote chain — resolved through ONE recursive
    // component walk (doc-id spaces are disjoint across families), every
    // doc inheriting its rep's root; kept adds media_ok to the conjunction
    // and the shard prefix scan runs over the COMPOSED kept set
    "curate_multimodal" -> curateMultimodalSql(xm = false),
    // the cross-modal twin: extra 32-byte stills equal to selected video
    // classes' repeated frame block make the laundering arm LIVE; the SQL
    // re-derives the cross-side Hamming probe gating the video verdicts
    "curate_multimodal_xm" -> curateMultimodalSql(xm = true),

    "text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS total_tokens,
        |  round(avg(len(list_filter(string_split(text, ' '), x -> x != ''))), 4) AS avg_tokens,
        |  round(avg(length(text)), 4) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "text_normalize" ->
      """WITH c AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS clean
        |  FROM documents)
        |SELECT doc_id, CAST(length(clean) AS BIGINT) AS clean_len,
        |  md5(clean) AS clean_fp
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
        |            FROM documents),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN list_transform(range(0, len(t) - 1),
        |      i -> array_to_string(t[i+1:i+2], ' ')) ELSE CAST([] AS VARCHAR[]) END AS g2,
        |    CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2),
        |      i -> array_to_string(t[i+1:i+3], ' ')) ELSE CAST([] AS VARCHAR[]) END AS g3
        |  FROM t0),
        |top AS (SELECT doc_id, max(c) AS top_c FROM (
        |    SELECT doc_id, gi, count(*) AS c
        |    FROM (SELECT doc_id, unnest(g2) AS gi FROM g) u GROUP BY doc_id, gi) v
        |  GROUP BY doc_id),
        |r AS (SELECT g.doc_id,
        |    CAST(len(g2) AS BIGINT) AS n_2grams,
        |    round(CASE WHEN len(g2) > 0
        |          THEN (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2) ELSE 0.0 END, 6) AS dup_2gram_ratio,
        |    round(CASE WHEN len(g2) > 0
        |          THEN coalesce(top.top_c, 0)::DOUBLE / len(g2) ELSE 0.0 END, 6) AS top_2gram_ratio,
        |    round(CASE WHEN len(g3) > 0
        |          THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3) ELSE 0.0 END, 6) AS dup_3gram_ratio
        |  FROM g LEFT JOIN top ON g.doc_id = top.doc_id)
        |SELECT doc_id, n_2grams, dup_2gram_ratio, top_2gram_ratio, dup_3gram_ratio,
        |  (top_2gram_ratio > 0.05 OR dup_3gram_ratio > 0.05) AS repetitive
        |FROM r ORDER BY doc_id""".stripMargin,

    "bm25_topk" -> bm25Sql(Bm25Terms, 15),

    "hybrid_topk" ->
      s"""WITH ${bm25Ctes(Bm25Terms)},
         |bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
         |       FROM (SELECT doc_id, score FROM scored WHERE score > 0
         |             ORDER BY score DESC, doc_id ASC LIMIT 50) tb),
         |emb AS (SELECT doc_id, ${embSql("text")} AS v FROM documents),
         |q AS (SELECT ${embSql("'spark data query'")} AS qv),
         |cs AS (SELECT emb.doc_id, ${cosSql("emb.v", "q.qv")} AS score FROM emb, q),
         |cr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
         |       FROM (SELECT doc_id, score FROM cs
         |             ORDER BY score DESC, doc_id ASC LIMIT 50) tc)
         |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
         |  CAST(b.rnk AS BIGINT) AS bm25_rnk,
         |  CAST(c.rnk AS BIGINT) AS cos_rnk,
         |  round(coalesce(1.0 / (60 + b.rnk), 0.0)
         |      + coalesce(1.0 / (60 + c.rnk), 0.0), 9) AS rrf
         |FROM bm b FULL JOIN cr c ON b.doc_id = c.doc_id
         |ORDER BY rrf DESC, doc_id ASC LIMIT 15""".stripMargin,

    "pii_redact" ->
      """WITH d AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |         || '@example.com or call +1-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text,
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        |  FROM d),
        |s2 AS (SELECT doc_id, text, after_email,
        |    regexp_replace(after_email, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS after_phone
        |  FROM s1),
        |r AS (SELECT doc_id,
        |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    len(regexp_extract_all(after_email, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |    len(regexp_extract_all(after_phone, '(?:[0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips,
        |    regexp_replace(after_phone, '(?:[0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS redacted
        |  FROM s2)
        |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
        |  CAST(n_phones AS BIGINT) AS n_phones, CAST(n_ips AS BIGINT) AS n_ips,
        |  (n_emails + n_phones + n_ips > 0) AS has_pii,
        |  CAST(length(redacted) AS BIGINT) AS redacted_len,
        |  md5(redacted) AS redacted_fp
        |FROM r ORDER BY doc_id""".stripMargin,

    "doc_winnow" ->
      """WITH gh AS (SELECT doc_id,
        |    list_transform(range(0, length(text) - 4),
        |      i -> CAST(('0x' || substr(md5(substr(text, CAST(i + 1 AS BIGINT), 5)), 1, 14))::UBIGINT AS BIGINT)) AS gh
        |  FROM documents WHERE length(text) >= 8),
        |fps AS (SELECT doc_id,
        |    list_distinct(list_transform(range(0, len(gh) - 3),
        |      wi -> list_min(gh[wi+1:wi+4]))) AS fps
        |  FROM gh)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
        |  list_min(fps) AS fp_min, list_max(fps) AS fp_max,
        |  CAST(list_sum(list_transform(fps, x -> x % 1000003)) AS BIGINT) AS fp_sum
        |FROM fps ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.winnowPairs: doc pairs sharing >= 2 winnowed
    // fingerprints of corpus df <= 8 (hot fps are boilerplate, excluded)
    "winnow_pairs" ->
      """WITH gh AS (SELECT doc_id,
        |    list_transform(range(0, length(text) - 4),
        |      i -> CAST(('0x' || substr(md5(substr(text, CAST(i + 1 AS BIGINT), 5)), 1, 14))::UBIGINT AS BIGINT)) AS gh
        |  FROM documents WHERE length(text) >= 8),
        |fps AS (SELECT doc_id,
        |    list_distinct(list_transform(range(0, len(gh) - 3),
        |      wi -> list_min(gh[wi+1:wi+4]))) AS fps
        |  FROM gh),
        |ex AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fp FROM fps),
        |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM ex GROUP BY fp)
        |  WHERE df <= 8),
        |r AS MATERIALIZED (SELECT doc_id, fp FROM ex JOIN rare USING (fp))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM r a JOIN r b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "docs_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "sample_delta" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20
        |EXCEPT
        |SELECT doc_id FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    // mirrors Sampling.packBatches: window keyed by (lang, shard) with
    // shard = hash56(doc_id) % 8 and shard-offset batch ids
    "pack_batches" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tok,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 8 AS BIGINT) AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tok, shard,
        |    CAST(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        |  FROM t)
        |SELECT doc_id, lang, n_tok, shard, cum_tok,
        |  CAST(floor((cum_tok - n_tok) / 4096.0) AS BIGINT) * 8 + shard AS batch_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "skew_audit" ->
      """WITH counts AS (SELECT user_id AS key, count(*) AS n_rows FROM events GROUP BY user_id),
        |stats AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
        |                 round(avg(n_rows), 9) AS avg_rows FROM counts)
        |SELECT key, n_rows,
        |  round(n_rows / total, 6) AS share,
        |  round(n_rows / avg_rows, 6) AS skew
        |FROM counts, stats
        |ORDER BY n_rows DESC, key ASC LIMIT 20""".stripMargin,

    // deliberately the PLAIN (unsalted) join: equality proves the salted
    // plan preserves semantics
    "salted_priority_revenue" ->
      """SELECT o.o_orderpriority AS priority,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY priority
        |ORDER BY priority""".stripMargin,

    "split_audit" ->
      """WITH s AS (SELECT lang,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tok
        |  FROM documents)
        |SELECT lang, split, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "token_topk" ->
      """WITH tok AS (SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS token
        |             FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
        |SELECT token, cnt, rnk
        |FROM (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk FROM c)
        |WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    // mirrors TextAnalysis.tokenHll: p=10 HyperLogLog over hash56, rho via
    // binary-digit count (integer arithmetic — no float log2), linear
    // counting below 2.5m
    "token_hll" ->
      """WITH tok AS (SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS w
        |             FROM documents),
        |cells AS (SELECT h % 1024 AS bucket, h // 1024 AS r FROM (
        |    SELECT ('0x' || substr(md5(w), 1, 14))::UBIGINT AS h FROM tok)),
        |regs AS (SELECT bucket,
        |    max(CASE WHEN r > 0 THEN 47 - length(bin(r)) ELSE 47 END) AS reg
        |  FROM cells GROUP BY bucket),
        |dense AS (SELECT coalesce(reg, 0) AS reg
        |  FROM range(1024) LEFT JOIN regs ON range = regs.bucket),
        |agg AS (SELECT sum(power(2.0, -reg)) AS z,
        |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v FROM dense),
        |est AS (SELECT CASE
        |    WHEN (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024 / z <= 2.5 * 1024
        |         AND v > 0
        |    THEN CAST(1024 AS DOUBLE) * ln(CAST(1024 AS DOUBLE) / v)
        |    ELSE (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024 / z END AS e
        |  FROM agg),
        |ex AS (SELECT count(DISTINCT w) AS exact_distinct FROM tok)
        |SELECT exact_distinct, round(e, 6) AS est,
        |  CASE WHEN exact_distinct = 0 THEN 0.0
        |       ELSE round((e - exact_distinct) / exact_distinct, 6) END AS rel_err
        |FROM ex, est""".stripMargin,

    // mirrors Bpe.train: 8 unrolled Sennrich merge steps over the weighted
    // word table, argmax tie-break (pc DESC, a, b)
    "bpe_merges" ->
      s"""WITH $bpeCtes
        |SELECT * FROM (
        |${(1 to 8).map(k =>
          s"  SELECT CAST($k AS BIGINT) AS step, a AS lhs, b AS rhs, " +
            s"a || b AS merged, CAST(pc AS BIGINT) AS pair_count FROM bm$k")
          .mkString("\n  UNION ALL BY NAME\n")}
        |) ORDER BY step""".stripMargin,

    // mirrors Bpe.segmentCounts over Bpe.train's merges: the train+apply
    // round trip — per-doc token budget under the freshly learned vocab
    "bpe_segment" -> {
      def dstep(k: Int): String =
        s"""dsym$k AS (SELECT doc_id, CASE
           |    WHEN (SELECT count(*) FROM bm$k) = 0 THEN sym
           |    ELSE replace(sym,
           |      ' ' || (SELECT a FROM bm$k) || '  ' || (SELECT b FROM bm$k) || ' ',
           |      ' ' || (SELECT a FROM bm$k) || (SELECT b FROM bm$k) || ' ') END AS sym
           |  FROM dsym${k - 1})""".stripMargin
      s"""WITH $bpeCtes,
         |dtok AS (SELECT doc_id,
         |    lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS w
         |  FROM documents),
         |dsym0 AS (SELECT doc_id, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym
         |  FROM dtok),
         |${(1 to 8).map(dstep).mkString(",\n")},
         |per AS (SELECT doc_id,
         |    CAST(sum(len(list_filter(string_split(sym, '  '), x -> x != ''))) AS BIGINT)
         |      AS bpe_tokens
         |  FROM dsym8 GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(per.bpe_tokens, 0) AS BIGINT) AS bpe_tokens
         |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // mirrors Bpe.fertility: weighted mean symbols per word occurrence
    // after the same 8 merges
    "bpe_fertility" ->
      s"""WITH $bpeCtes
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
        |  CAST(sum(cnt * ns) AS BIGINT) AS n_symbols,
        |  round(sum(cnt * ns)::DOUBLE / sum(cnt)::DOUBLE, 6) AS fertility
        |FROM (SELECT cnt,
        |    len(list_filter(string_split(sym, '  '), x -> x != '')) AS ns
        |  FROM bw8)""".stripMargin,

    // mirrors TextAnalysis.tokenCms: 4x1024 Count-Min sketch over the
    // lowercased token stream, estimate = min over rows, audited against
    // the exact top-20
    "token_cms" ->
      """WITH tok AS (SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS w
        |             FROM documents),
        |dd AS (SELECT unnest(range(4)) AS d),
        |sk AS (SELECT d,
        |    ('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || w), 1, 14))::UBIGINT % 1024 AS bucket,
        |    count(*) AS c
        |  FROM tok CROSS JOIN dd GROUP BY 1, 2),
        |topk AS (SELECT w AS token, count(*) AS exact_cnt FROM tok
        |  GROUP BY w ORDER BY exact_cnt DESC, token ASC LIMIT 20),
        |est AS (SELECT t.token, min(sk.c) AS est_cnt
        |  FROM topk t CROSS JOIN dd
        |  JOIN sk ON sk.d = dd.d AND sk.bucket =
        |    ('0x' || substr(md5(CAST(dd.d AS VARCHAR) || '|' || t.token), 1, 14))::UBIGINT % 1024
        |  GROUP BY t.token)
        |SELECT t.token, t.exact_cnt, e.est_cnt,
        |  e.est_cnt - t.exact_cnt AS overestimate
        |FROM topk t JOIN est e USING (token)
        |ORDER BY t.exact_cnt DESC, t.token""".stripMargin,

    "token_drift" ->
      """WITH tok AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80 AS train,
        |    lower(unnest(list_filter(string_split(text, ' '), x -> x != ''))) AS token
        |  FROM documents),
        |counts AS (SELECT token,
        |    CAST(sum(CASE WHEN train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |    CAST(sum(CASE WHEN train THEN 0 ELSE 1 END) AS BIGINT) AS n_test
        |  FROM tok GROUP BY token),
        |totals AS (SELECT CAST(sum(n_train) AS BIGINT) AS tot_train,
        |                  CAST(sum(n_test) AS BIGINT) AS tot_test FROM counts)
        |SELECT token, n_train, n_test,
        |  round(n_train / tot_train, 6) AS rate_train,
        |  round(n_test / tot_test, 6) AS rate_test,
        |  round(abs(n_train / tot_train - n_test / tot_test), 6) AS rate_diff
        |FROM counts, totals
        |ORDER BY rate_diff DESC, token ASC LIMIT 20""".stripMargin,

    "text_quality" ->
      """WITH q AS (
        | SELECT doc_id, lang, text,
        |   len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','is'))) AS en_hits,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','que','y','en'))) AS es_hits,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist','ein'))) AS de_hits,
        |   CASE WHEN length(text) > 0
        |        THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
        |        ELSE 0.0 END AS punct_raw
        | FROM documents)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(punct_raw, 6) AS punct_ratio,
        |  round(CASE WHEN n_tokens > 0
        |             THEN (en_hits + es_hits + de_hits)::DOUBLE / n_tokens
        |             ELSE 0.0 END, 6) AS stop_ratio,
        |  round(least(1.0, n_tokens::DOUBLE / 100.0) * (1.0 - punct_raw)
        |        * (0.5 + 0.5 * CASE WHEN n_tokens > 0
        |                            THEN (en_hits + es_hits + de_hits)::DOUBLE / n_tokens
        |                            ELSE 0.0 END), 6) AS quality,
        |  CASE WHEN en_hits > es_hits AND en_hits > de_hits THEN 'en'
        |       WHEN es_hits > en_hits AND es_hits > de_hits THEN 'es'
        |       WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
        |       ELSE 'und' END AS lang_guess,
        |  md5(lower(text)) AS fp
        |FROM q ORDER BY doc_id""".stripMargin,

    // per-language discrete inverse-CDF on the 6-dp quality grid; the
    // rank threshold is an INTEGER ceiling in micro-units (q=0.2 →
    // 200000) — no float multiply near an integer boundary
    "quality_calibrated" ->
      """WITH q0 AS (
        | SELECT doc_id, lang,
        |   len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','is'))) AS en_hits,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','que','y','en'))) AS es_hits,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist','ein'))) AS de_hits,
        |   CASE WHEN length(text) > 0
        |        THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
        |        ELSE 0.0 END AS punct_raw
        | FROM documents),
        |ql AS (SELECT doc_id, lang,
        |  round(least(1.0, n_tokens::DOUBLE / 100.0) * (1.0 - punct_raw)
        |        * (0.5 + 0.5 * CASE WHEN n_tokens > 0
        |                            THEN (en_hits + es_hits + de_hits)::DOUBLE / n_tokens
        |                            ELSE 0.0 END), 6) AS quality
        |  FROM q0),
        |hist AS (SELECT lang, quality, count(*) AS c FROM ql GROUP BY lang, quality),
        |cum AS (SELECT lang, quality,
        |    sum(c) OVER (PARTITION BY lang ORDER BY quality
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |cut AS (SELECT lang, min(quality) AS cutoff FROM cum
        |        WHERE cum >= (n * 200000 + 999999) // 1000000 GROUP BY lang)
        |SELECT ql.doc_id, ql.lang, ql.quality, cut.cutoff,
        |       ql.quality >= cut.cutoff AS keep
        |FROM ql JOIN cut ON ql.lang = cut.lang
        |ORDER BY ql.doc_id""".stripMargin,

    // marker lists must stay IDENTICAL to TextAnalysis.LangMarkers; CASE
    // order (de,en,es,fr,zh) is the alphabetical tie-break contract
    "lang_id" ->
      """WITH t AS (SELECT doc_id, lang,
        |    list_transform(list_filter(string_split(text, ' '), x -> x != ''), x -> lower(x)) AS tl
        |  FROM documents),
        |h AS (SELECT doc_id, lang, len(tl) AS n_tok,
        |    len(list_filter(tl, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','eine','zu'], x))) AS h_de,
        |    len(list_filter(tl, x -> list_contains(['the','and','of','to','is','in','that','it','for','a'], x))) AS h_en,
        |    len(list_filter(tl, x -> list_contains(['el','los','las','que','y','un','una','por','con','para'], x))) AS h_es,
        |    len(list_filter(tl, x -> list_contains(['le','les','et','est','une','du','dans','pour','sur','pas'], x))) AS h_fr,
        |    len(list_filter(tl, x -> list_contains(['的','是','在','了','和','有','我','不','这','人'], x))) AS h_zh
        |  FROM t),
        |p AS (SELECT doc_id, lang, n_tok, h_de, h_en, h_es, h_fr, h_zh,
        |    greatest(h_de, h_en, h_es, h_fr, h_zh) AS best,
        |    CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
        |         WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
        |         WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
        |         WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
        |         WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
        |         ELSE 'zh' END AS pred_lang
        |  FROM h)
        |SELECT doc_id, pred_lang, CAST(best AS BIGINT) AS best_hits,
        |  CAST(n_tok AS BIGINT) AS n_tok,
        |  CASE WHEN n_tok = 0 THEN 0.0 ELSE round(best::DOUBLE / n_tok, 6) END AS lang_score,
        |  pred_lang = lang AS matches_label
        |FROM p ORDER BY doc_id""".stripMargin,

    "pq_err" ->
      s"""WITH ${pqRecSql()},
         |err AS (SELECT label,
         |    round(sqrt(list_sum(list_transform(range(1, 65), i -> (v[i]-r[i])*(v[i]-r[i]))))
         |          / sqrt(list_sum(list_transform(v, x -> x*x))), 9) AS rel_err
         |  FROM rec
         |  WHERE sqrt(list_sum(list_transform(v, x -> x*x))) > 0)
         |SELECT label, count(*) AS n,
         |  round(sum(CAST(round(rel_err * 1000000000.0) AS BIGINT))::DOUBLE
         |        / 1000000000.0 / count(*), 6) AS avg_err,
         |  round(max(rel_err), 6) AS max_err
         |FROM err GROUP BY label ORDER BY label""".stripMargin,

    "pq_topk" -> pqTopkSql,
    "pq_topk_indexed" -> pqTopkSql, // identical semantics: same codes, same decode, same rerank

    "embed_label_stats" ->
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
         |ex AS (SELECT label, u.i AS pos, u.v AS val FROM (
         |  SELECT label, unnest(list_transform(range(0, 64), i -> {'i': i, 'v': v[i+1]})) AS u
         |  FROM e) t),
         |cent0 AS (SELECT label, pos, round(avg(val), 9) AS m FROM ex GROUP BY label, pos),
         |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM cent0 GROUP BY label),
         |scored AS (SELECT e.label, ${cosSql("e.v", "cent.c")} AS s
         |           FROM e JOIN cent ON e.label = cent.label)
         |SELECT label, count(*) AS n, round(avg(s), 4) AS avg_cos,
         |       min(s) AS min_cos, max(s) AS max_cos
         |FROM scored GROUP BY label ORDER BY label""".stripMargin,

    "embed_norm_quantiles" ->
      """WITH n AS (SELECT label,
        |    round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 9) AS norm
        |  FROM embeddings)
        |SELECT label, count(*) AS n,
        |  round(min(norm), 6) AS min_norm,
        |  round(quantile_cont(norm, 0.25), 6) AS p25,
        |  round(quantile_cont(norm, 0.5), 6) AS p50,
        |  round(quantile_cont(norm, 0.75), 6) AS p75,
        |  round(quantile_cont(norm, 0.99), 6) AS p99,
        |  round(max(norm), 6) AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    "embed_quantize_err" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |q AS (SELECT label, v, mx,
        |        list_transform(v, x -> round(x * 127.0 / mx, 0)) AS qv
        |      FROM m WHERE mx > 0),
        |err AS (SELECT label,
        |    round(sqrt(list_sum(list_transform(range(1, len(v)+1),
        |            i -> (v[i] - qv[i]*mx/127.0) * (v[i] - qv[i]*mx/127.0))))
        |          / sqrt(list_sum(list_transform(v, x -> x*x))), 9) AS rel_err,
        |    round(mx / 127.0, 9) AS scale
        |  FROM q)
        |SELECT label, count(*) AS n,
        |  round(avg(rel_err), 6) AS avg_err,
        |  round(max(rel_err), 6) AS max_err,
        |  round(avg(scale), 6) AS avg_scale
        |FROM err GROUP BY label ORDER BY label""".stripMargin,

    // mirrors EmbeddingStats.covariance: E[xi*xj] and means rounded to
    // 9 dp before the subtraction, cov to 6 dp
    "embed_covariance" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT vec_id, i, v[CAST(i + 1 AS INT)] AS xi
        |      FROM e CROSS JOIN range(0, 64) t(i)),
        |m AS (SELECT i, round(avg(xi), 9) AS mi FROM x GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j, round(avg(a.xi * b.xi), 9) AS eab
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i)
        |SELECT p.i, p.j, round(eab - ma.mi * mb.mi, 6) + 0.0 AS cov
        |FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
        |ORDER BY p.i, p.j""".stripMargin,

    // mirrors EmbeddingStats.spectrum: trace / Frobenius / participation
    // ratio off the SAME 6-dp covariance table as embed_covariance
    "embed_spectrum" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT vec_id, i, v[CAST(i + 1 AS INT)] AS xi
        |      FROM e CROSS JOIN range(0, 64) t(i)),
        |m AS (SELECT i, round(avg(xi), 9) AS mi FROM x GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j, round(avg(a.xi * b.xi), 9) AS eab
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
        |cov AS (SELECT p.i, p.j, round(eab - ma.mi * mb.mi, 6) + 0.0 AS cov
        |  FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j),
        |s AS (SELECT round(sum(CASE WHEN i = j THEN cov ELSE 0.0 END), 6) AS trace,
        |    round(sum(cov * cov), 6) AS frob_sq FROM cov)
        |SELECT trace, frob_sq,
        |  CASE WHEN frob_sq = 0 THEN 0.0
        |       ELSE round(trace * trace / frob_sq, 6) END AS effective_rank FROM s""".stripMargin,

    // mirrors Sampling.topicBalance: hash-embed docs (normalization
    // mirrors hashProjection's x * (1/sqrt(s)) op order exactly), 5
    // unrolled Lloyd steps seeded from doc_id < 8, assignment with the
    // trained centroids, per-cell volume + mean quality
    "topic_balance" -> {
      val docSrc =
        s"""SELECT doc_id AS vec_id, 0 AS label,
           |  CASE WHEN s > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(s)))
           |       ELSE v END AS v
           |FROM (SELECT doc_id, v, list_sum(list_transform(v, x -> x*x)) AS s
           |      FROM (SELECT doc_id, ${embSql("text")} AS v FROM documents))""".stripMargin
      s"""WITH ${ivfTrainChainSql(5, 8, 64, docSrc)},
         |clT AS MATERIALIZED (SELECT list(cm ORDER BY cell) AS cl,
         |    list(sqrt(cn) ORDER BY cell) AS cns FROM (
         |  SELECT cell, cm, list_sum(list_transform(cm, x -> x*x)) AS cn FROM (
         |    SELECT cell, list(m ORDER BY pos) AS cm FROM c5 GROUP BY cell) t0) t),
         |asg AS (SELECT vec_id, list_position(sc, list_max(sc)) AS cell FROM (
         |  SELECT ev2.vec_id, list_transform(range(1, 9), ci ->
         |      CASE WHEN cns[ci] = 0 OR ev2.en = 0 THEN 0.0
         |           ELSE list_dot_product(cl[ci], ev2.v) / (cns[ci] * ev2.en) END) AS sc
         |  FROM (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS en
         |        FROM e) ev2, clT) t2),
         |tq AS (SELECT doc_id,
         |    round(least(1.0, n_tokens::DOUBLE / 100.0) * (1.0 - punct_raw)
         |      * (0.5 + 0.5 * CASE WHEN n_tokens > 0
         |                          THEN (en_hits + es_hits + de_hits)::DOUBLE / n_tokens
         |                          ELSE 0.0 END), 6) AS quality
         |  FROM (SELECT doc_id,
         |      len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
         |      len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','is'))) AS en_hits,
         |      len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','que','y','en'))) AS es_hits,
         |      len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist','ein'))) AS de_hits,
         |      CASE WHEN length(text) > 0
         |           THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
         |           ELSE 0.0 END AS punct_raw
         |    FROM documents)),
         |rep AS (SELECT asg.cell, count(*) AS n_docs,
         |    round(avg(tq.quality), 6) AS mean_quality
         |  FROM asg JOIN tq ON tq.doc_id = asg.vec_id GROUP BY asg.cell)
         |SELECT CAST(cell AS BIGINT) AS cell, n_docs,
         |  round(n_docs::DOUBLE / (SELECT count(*) FROM documents), 6) AS share,
         |  mean_quality
         |FROM rep ORDER BY cell""".stripMargin
    },

    "token_counts" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+', 0)) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 0) AS sum_qty,
        |  round(sum(l_extendedprice), 0) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 0) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "part_type_revenue" ->
      """SELECT r_name,  p_type,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, p_type
        |ORDER BY r_name, p_type""".stripMargin,

    "top_types_per_region" ->
      """WITH a AS (SELECT r_name, p_type,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue,
        |    count(*) AS n_items
        |  FROM lineitem
        |  JOIN part     ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  GROUP BY r_name, p_type),
        |r AS (SELECT *, row_number() OVER (PARTITION BY r_name
        |                ORDER BY revenue DESC, p_type ASC) AS rnk FROM a)
        |SELECT r_name, p_type, revenue, n_items, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3
        |ORDER BY r_name, rnk""".stripMargin,

    "top_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    "orders_no_lineitem" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |ANTI JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "active_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |SEMI JOIN (SELECT o_custkey FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00') o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "revenue_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue,
        |  count(*) AS n_items,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "events_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1996-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "attribution" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts, p.value
        |FROM p JOIN c ON c.user_id = p.user_id
        |  AND c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 24 HOURS
        |ORDER BY p.purchase_id, c.click_id""".stripMargin,

    "asof_purchase_click" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts,
        |  c.ts AS asof_ts,
        |  round(c.value, 4) AS asof_value,
        |  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS micros_since
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "sessions" ->
      """WITH e AS (SELECT user_id, event_id, ts, value FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |                     THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(new_session)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |        AS session_seq
        |      FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value,
        |  CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_sec
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    // mirrors Sessionize.retentionCohorts: integer epoch-week cohorts
    "retention" ->
      """WITH active AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id),
        |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM cohort GROUP BY cohort_week),
        |cells AS (SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |    count(*) AS n_active
        |  FROM active a JOIN cohort c ON a.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT cells.cohort_week, week_offset, n_active, sizes.cohort_size,
        |  round(n_active::DOUBLE / cohort_size, 6) AS retention
        |FROM cells JOIN sizes ON cells.cohort_week = sizes.cohort_week
        |ORDER BY cells.cohort_week, week_offset""".stripMargin,

    "funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS qual_ts FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS qual_ts FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.qual_ts
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS qual_ts FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.qual_ts
        |       GROUP BY e.user_id),
        |c AS (SELECT 1 AS step, 'signup' AS event_type, (SELECT count(*) FROM s1) AS n_users
        |      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT CAST(step AS BIGINT) AS step, event_type, n_users,
        |  round(n_users::DOUBLE / (SELECT n_users FROM c WHERE step = 1), 6) AS pct_of_first
        |FROM c ORDER BY step""".stripMargin,

    "range_join_clicks" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts,
        |  CAST(count(c.ts) AS BIGINT) AS n_right,
        |  round(coalesce(sum(c.value), 0.0), 4) AS sum_value
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.user_id
        | AND c.ts > p.ts - INTERVAL '1 hour'
        | AND c.ts <= p.ts
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "events_windowed" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(count(json_extract(props, '$.k')) AS BIGINT) AS n_parsed,
        |  CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |  round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k,
        |  CAST(min(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS min_k,
        |  CAST(max(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS BIGINT) AS width,
        |  CAST(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END AS BIGINT) AS height,
        |  CAST(strlen(text) // 64 AS BIGINT) AS n_frames,
        |  CAST(0 AS BIGINT) AS sample_rate,
        |  CAST(0 AS BIGINT) AS channels,
        |  CAST(0 AS BIGINT) AS duration_ms,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // fake-arm dHash re-derivation: 8x8 byte grid (0-padded), bit r*7+c set
    // iff grid(r,c+1) > grid(r,c). The oracle brute-forces the pair set —
    // band-pair candidate generation is LOSSLESS at maxHamming <= bands-2
    // (DedupSpec proves banded == brute on the same corpus), so the banded
    // operator must return exactly these rows
    "dedup_image_near" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)),
        |g AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |        CASE WHEN i < strlen(text)
        |             THEN ascii(substr(text, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
        |      FROM d),
        |h AS MATERIALIZED (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), k ->
        |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
        |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
        |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
        |      FROM g)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id AND bit_count(xor(a.ph, b.ph)) <= 6
        |ORDER BY a_id, b_id""".stripMargin,

    // exact-collapse + rep-pair components: reps = min doc per distinct
    // hash; the oracle brute-forces rep pairs (banding is lossless at
    // maxHamming < bands, so the banded mine finds exactly these), then
    // the dedup_groups recursive walk over reps; docs inherit their rep's
    // root
    "dedup_image" -> dedupImageSql(),
    // auto-t shares the oracle: any clamped t is lossless, so the banded
    // mine reproduces the same brute-force rep-pair set at every setting
    "dedup_image_auto" -> dedupImageSql(),
    // the cross-modality arm: the video twin's extracted sample is the
    // text, so its grid — and the whole component structure — is the
    // dedup_image computation over the doubled id space
    "dedup_video" -> dedupImageSql(videoTwin = true),

    // the video first-sample extraction, pinned end-to-end: the sample
    // behind the constant mp4VideoHeader prefix IS the doc text, so the
    // fake-arm dHash over the extracted sample equals the dHash over the
    // text's own first 64 bytes (the dedup_image grid CTE)
    // the multi-frame walk, pinned end-to-end: the frames header declares
    // uniform 32-byte samples in one chunk, so extracted sample i IS
    // text[i*32, (i+1)*32) (final frame short, declared-but-absent tail
    // dropped) and each frame's fake-arm dHash is re-derived from substr
    // slices
    "multimodal_video_frames" ->
      s"""WITH vc AS (SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)),
         |${videoFrameHashCtes}
         |SELECT doc_id, frame_no, fhash FROM fh
         |ORDER BY doc_id, frame_no""".stripMargin,

    // cross-modal video <-> image still match: the oracle re-derives BOTH
    // hash passes (frame slices via the videoFrameHashCtes walk, image
    // grids via the ascii device) and brute-forces the cross-side Hamming
    // verify — banding is lossless at maxHamming <= bands - t, so the
    // engine's distinct-hash banded mine + member restore must reproduce
    // exactly these (video, image) verdict rows
    "video_still_match" ->
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |  WHERE strlen(text) = length(text) AND strlen(text) >= 64
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20),
         |vc AS (SELECT doc_id, text FROM d0),
         |${videoFrameHashCtes},
         |ib AS (SELECT doc_id AS image_id,
         |         CASE WHEN doc_id % 2 = 1 THEN substr(t, 1, 5) || '~' || substr(t, 7)
         |              ELSE t END AS t
         |       FROM (SELECT doc_id, substr(text, 33, 32) AS t FROM d0
         |             WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10) z),
         |ig AS (SELECT image_id, list_transform(range(0, 64), i ->
         |         CASE WHEN i < strlen(t)
         |              THEN ascii(substr(t, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
         |       FROM ib),
         |ih AS (SELECT image_id, CAST(list_sum(list_transform(range(0, 56), k ->
         |         CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
         |                   > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
         |              THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
         |       FROM ig)
         |SELECT f.doc_id AS video_id, h.image_id,
         |       CAST(count(*) AS BIGINT) AS frames_matched,
         |       CAST(min(bit_count(xor(f.fhash, h.ph))) AS BIGINT) AS min_hamming
         |FROM fh f JOIN ih h ON bit_count(xor(f.fhash, h.ph)) <= 6
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    // the catalog-indexed cross-modal probe: the stored stills (distinct
    // phash of bucket<50 docs-as-binary — the image index's exact content)
    // re-derived, 64-byte video frames hashed through the same grid, the
    // cross-side Hamming verify brute-forced, per-video counts restored
    // with the zero fill (non-ASCII stills in the real index cannot be
    // re-derived by DuckDB's char-indexed substr; at Hamming <= 6 on
    // 56-bit hashes their cross-match probability is ~1e-9 per pair — the
    // dedup_image_incremental_indexed oracle's standing convention)
    "video_still_match_indexed" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
         |  FROM documents WHERE strlen(text) = length(text)),
         |rg AS (SELECT list_transform(range(0, 64), i ->
         |        CASE WHEN i < strlen(text)
         |             THEN ascii(substr(text, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
         |      FROM d WHERE b < 50),
         |rh AS MATERIALIZED (SELECT DISTINCT CAST(list_sum(list_transform(range(0, 56), k ->
         |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
         |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
         |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ph
         |      FROM rg),
         |vsrc AS (SELECT doc_id,
         |           CASE WHEN doc_id % 2 = 1
         |                THEN substr(text, 1, 5) || '~' || substr(text, 7)
         |                ELSE text END AS p
         |         FROM d WHERE b < 10 AND strlen(text) >= 64
         |  UNION ALL SELECT doc_id, text AS p FROM d WHERE b >= 90 AND strlen(text) >= 64),
         |fr AS (SELECT doc_id, CAST(u AS BIGINT) AS frame_no,
         |         substr(p, CAST(u*64+1 AS BIGINT), 64) AS fb
         |       FROM (SELECT doc_id, p,
         |               unnest(range(0, least(16, (strlen(p)+63)//64))) AS u
         |             FROM vsrc) z),
         |gg AS (SELECT doc_id, frame_no, list_transform(range(0, 64), i ->
         |        CASE WHEN i < strlen(fb)
         |             THEN ascii(substr(fb, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
         |       FROM fr),
         |fh AS MATERIALIZED (SELECT doc_id, frame_no,
         |        CAST(list_sum(list_transform(range(0, 56), k ->
         |          CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
         |                    > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
         |               THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS fhash
         |       FROM gg),
         |mh AS (SELECT DISTINCT f.fhash FROM (SELECT DISTINCT fhash FROM fh) f
         |       JOIN rh ON bit_count(xor(f.fhash, rh.ph)) <= 6),
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS fm
         |        FROM fh JOIN mh USING (fhash) GROUP BY doc_id)
         |SELECT v.doc_id, coalesce(c.fm, 0) AS frames_matched,
         |       coalesce(c.fm, 0) < 1 AS keep
         |FROM (SELECT doc_id FROM vsrc) v LEFT JOIN cnt c USING (doc_id)
         |ORDER BY v.doc_id""".stripMargin,

    // frame-vote pairing over the re-introed-twin corpus: per-frame hashes
    // for both arms (arm B = one 32-byte md5-hex junk frame prepended),
    // exact-hash join, per-offset vote, max-vote >= 3 — the
    // audio_shift_near full-pipeline re-derivation, video edition
    "dedup_video_frames" ->
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |  WHERE strlen(text) = length(text)
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20),
         |vc AS (SELECT doc_id, text FROM d0
         |       UNION ALL
         |       SELECT doc_id + 100000 AS doc_id, md5(text) || text AS text FROM d0),
         |${videoFrameHashCtes},
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |        a.frame_no - b.frame_no AS off
         |      FROM fh a JOIN fh b ON a.fhash = b.fhash
         |      WHERE a.doc_id < b.doc_id),
         |vv AS (SELECT a_id, b_id, off, count(*) AS v FROM p GROUP BY 1, 2, 3)
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vv GROUP BY a_id, b_id HAVING max(v) >= 3
         |ORDER BY a_id, b_id""".stripMargin,

    // the treatment form: fingerprint collapse (ordered frame-hash list)
    // before the vote mine, components via the recursive walk over rep
    // pairs, every video inherits its rep's root — the audio_dedup oracle
    // structure for the video modality over the three-arm corpus
    "video_dedup" ->
      s"""WITH RECURSIVE d0 AS (SELECT doc_id, text FROM documents
         |  WHERE strlen(text) = length(text)
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20),
         |vc AS (SELECT doc_id, text FROM d0
         |       UNION ALL
         |       SELECT doc_id + 100000 AS doc_id, md5(text) || text AS text FROM d0
         |       UNION ALL
         |       SELECT doc_id + 200000 AS doc_id, text FROM d0),
         |${videoFrameHashCtes},
         |fp AS (SELECT doc_id, string_agg(
         |         CAST(frame_no AS VARCHAR) || ':' || CAST(fhash AS VARCHAR),
         |         ' ' ORDER BY frame_no) AS fp
         |       FROM fh GROUP BY doc_id),
         |rp AS (SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY fp) AS rep FROM fp),
         |fhr AS (SELECT fh.* FROM fh JOIN rp ON fh.doc_id = rp.id AND rp.id = rp.rep),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |        a.frame_no - b.frame_no AS off
         |      FROM fhr a JOIN fhr b ON a.fhash = b.fhash AND a.doc_id < b.doc_id),
         |vv AS (SELECT a_id, b_id, off, count(*) AS v FROM p GROUP BY 1, 2, 3),
         |pr AS (SELECT a_id AS pa, b_id AS pb FROM vv
         |       GROUP BY a_id, b_id HAVING max(v) >= 3),
         |e AS (SELECT pa, pb FROM pr UNION SELECT pb, pa FROM pr),
         |walk(pa, pb) AS (SELECT pa, pb FROM e
         |                 UNION SELECT walk.pa, e.pb FROM walk JOIN e ON walk.pb = e.pa),
         |roots AS (SELECT pa AS id, least(pa, min(pb)) AS root FROM walk GROUP BY pa)
         |SELECT rp.id AS doc_id, coalesce(rt.root, rp.rep) AS group_id,
         |       rp.id = coalesce(rt.root, rp.rep) AS keep
         |FROM rp LEFT JOIN roots rt ON rt.id = rp.rep
         |ORDER BY doc_id""".stripMargin,

    // the banded-Hamming widening, brute-forced: same corpus and frame
    // hashes as dedup_video_frames, frames pair at popcount <= 3, votes
    // per offset — losslessness (pinned in MultimodalSpec/DedupSpec's
    // band-subset proofs) makes the banded plan answer-equivalent
    "dedup_video_frames_near" ->
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |  WHERE strlen(text) = length(text)
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 5),
         |vc AS (SELECT doc_id, text FROM d0
         |       UNION ALL
         |       SELECT doc_id + 100000 AS doc_id, md5(text) || text AS text FROM d0),
         |${videoFrameHashCtes},
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |        a.frame_no - b.frame_no AS off
         |      FROM fh a JOIN fh b ON a.doc_id < b.doc_id
         |        AND bit_count(xor(a.fhash, b.fhash)) <= 3),
         |vv AS (SELECT a_id, b_id, off, count(*) AS v FROM p GROUP BY 1, 2, 3)
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vv GROUP BY a_id, b_id HAVING max(v) >= 3
         |ORDER BY a_id, b_id""".stripMargin,

    // the phash key-space audit: bucket sizes by exact dHash over the
    // saturating replica corpus; Σ|bucket|² is imageNear's pair output on
    // hash-identical groups — the video_key_audit device, image edition
    "image_key_audit" ->
      s"""WITH $imageSaturatedHashCtes,
         |b AS (SELECT ph, count(*) AS bn FROM h GROUP BY 1)
         |SELECT CAST(sum(bn) AS BIGINT) AS n_images,
         |  CAST(count(*) AS BIGINT) AS n_hashes,
         |  CAST(max(bn) AS BIGINT) AS max_bucket,
         |  round(sum(bn)::DOUBLE / count(*), 6) AS mean_bucket,
         |  CAST(sum(bn * bn) AS DOUBLE) AS est_candidates
         |FROM b""".stripMargin,

    // the self-dialing escape: the audit's fan-out rule gates the full
    // pair chain (brute-force Hamming over all docs) vs the REP mine
    // (brute-force over min-id reps of distinct hashes) — this corpus
    // saturates, so the rep arm is the live one on both engines
    "image_near_auto" ->
      s"""WITH $imageSaturatedHashCtes,
         |b AS (SELECT ph, count(*) AS bn FROM h GROUP BY 1),
         |dec AS (SELECT CAST(sum(bn * bn) AS DOUBLE)
         |               > 16.0 * greatest(sum(bn), 1) AS hot FROM b),
         |rep AS MATERIALIZED (SELECT min(doc_id) AS doc_id, ph FROM h GROUP BY ph),
         |pf AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id,
         |         CAST(bit_count(xor(a.ph, b2.ph)) AS BIGINT) AS hamming
         |       FROM h a JOIN h b2
         |         ON a.doc_id < b2.doc_id AND bit_count(xor(a.ph, b2.ph)) <= 6),
         |pr AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id,
         |         CAST(bit_count(xor(a.ph, b2.ph)) AS BIGINT) AS hamming
         |       FROM rep a JOIN rep b2
         |         ON a.doc_id < b2.doc_id AND bit_count(xor(a.ph, b2.ph)) <= 6)
         |SELECT a_id, b_id, hamming FROM pf WHERE NOT (SELECT hot FROM dec)
         |UNION ALL
         |SELECT a_id, b_id, hamming FROM pr WHERE (SELECT hot FROM dec)
         |ORDER BY a_id, b_id""".stripMargin,

    // the band-key-space audit: (band, key) bucket sizes over the
    // saturating replica-crawl text corpus; Σ|bucket|² is candidatePairs'
    // exact pre-distinct join volume — the image_key_audit device, word-
    // minhash edition
    "minhash_key_audit" ->
      s"""WITH $textSaturatedBandCtes,
         |${bandAuditSql(6)}""".stripMargin,

    // the self-dialing escape: the audit's fan-out rule gates the full
    // banded chain vs the sha-256 exact-collapse REP mine — this corpus
    // saturates, so the rep arm is the live one on both engines
    "minhash_near_auto" ->
      s"""WITH $textSaturatedBandCtes,
         |${textNearAutoSql(6, 0.3)}""".stripMargin,

    // same audit over the char-8-gram family's 4-band keys
    "ngram_key_audit" ->
      s"""WITH $textSaturatedNgramBandCtes,
         |${bandAuditSql(4)}""".stripMargin,

    // the char-shingle edition of minhash_near_auto (tau 0.5, 4 bands)
    "ngram_near_auto" ->
      s"""WITH $textSaturatedNgramBandCtes,
         |${textNearAutoSql(4, 0.5)}""".stripMargin,

    // the collapse-first treatment form: sha-256 groups → min-id reps →
    // banded mine over reps only → member restore; keep = is-the-rep AND
    // rep never the larger side of a rep pair (resolveKeepers' rule
    // through the collapse — the scaladoc equivalence, re-checked in SQL)
    "minhash_dedup" ->
      s"""WITH $textSaturatedBandCtes,
         |${textDedupSql(0.3)}""".stripMargin,

    // the char-shingle treatment twin
    "ngram_dedup" ->
      s"""WITH $textSaturatedNgramBandCtes,
         |${textDedupSql(0.5)}""".stripMargin,

    // pair-level exact-substring detection: positional shingles, hash
    // co-occurrence join, diagonal island merge — a shared island of m
    // consecutive positions IS a verbatim run of m+4 tokens (k=5)
    "verbatim_overlap" ->
      s"""WITH $quoteOverlapCorpusCte,
         |${positionalShingleCtes("qc")},
         |co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h AND a.doc_id < b.doc_id),
         |$runAggSql
         |SELECT * FROM ragg WHERE max_run_tokens >= 8
         |ORDER BY a_id, b_id""".stripMargin,

    // the composable pair-restricted form: co-occurrences semi-join the
    // candidate list, absent-overlap pairs restore as the ZERO row
    "shared_runs" ->
      s"""WITH $quoteOverlapCorpusCte,
         |${positionalShingleCtes("qc")},
         |p AS (SELECT doc_id AS a_id, doc_id + 3 AS b_id FROM qc),
         |co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h AND a.doc_id < b.doc_id
         |       JOIN p ON a.doc_id = p.a_id AND b.doc_id = p.b_id),
         |$runAggSql
         |SELECT p.a_id, p.b_id,
         |       coalesce(r.max_run_tokens, 0) AS max_run_tokens,
         |       coalesce(r.n_cooccurrences, 0) AS n_cooccurrences
         |FROM p LEFT JOIN ragg r ON p.a_id = r.a_id AND p.b_id = r.b_id
         |ORDER BY p.a_id, p.b_id""".stripMargin,

    // the positional-shingle saturation probe over the replica corpus
    "overlap_key_audit" ->
      s"""WITH $textSaturatedCorpusCte,
         |${positionalShingleCtes("tsc")},
         |b AS (SELECT h, count(*) AS bn FROM pos GROUP BY h)
         |SELECT CAST(sum(bn) AS BIGINT) AS n_positions,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(max(bn) AS BIGINT) AS max_bucket,
         |  round(sum(bn)::DOUBLE / count(*), 6) AS mean_bucket,
         |  CAST(sum(bn * bn) AS DOUBLE) AS est_candidates
         |FROM b""".stripMargin,

    // the self-dialing replica escape: the fan-out rule gates the full
    // co-occurrence chain vs the sha-256 rep chain — this corpus
    // saturates, so the rep arm is the live one on both engines
    "verbatim_overlap_auto" ->
      s"""WITH $textSaturatedCorpusCte,
         |${positionalShingleCtes("tsc")},
         |b AS (SELECT h, count(*) AS bn FROM pos GROUP BY h),
         |dec AS (SELECT CAST(sum(bn * bn) AS DOUBLE)
         |               > 16.0 * greatest(sum(bn), 1) AS hot FROM b),
         |rep AS MATERIALIZED (SELECT min(doc_id) AS doc_id
         |       FROM (SELECT doc_id, sha256(text) AS fp FROM tsc) f GROUP BY fp),
         |posr AS (SELECT pos.* FROM pos JOIN rep USING (doc_id)),
         |co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h AND a.doc_id < b.doc_id),
         |$runAggSql,
         |cor AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |               a.pos - b.pos AS diag
         |        FROM posr a JOIN posr b ON a.h = b.h AND a.doc_id < b.doc_id),
         |runsr AS (SELECT a_id, b_id, diag, grp, count(*) AS len FROM (
         |  SELECT a_id, b_id, diag,
         |         pa - row_number() OVER (PARTITION BY a_id, b_id, diag ORDER BY pa) AS grp
         |  FROM cor) z GROUP BY 1, 2, 3, 4),
         |raggr AS (SELECT a_id, b_id, CAST(max(len) + 4 AS BIGINT) AS max_run_tokens,
         |                 CAST(sum(len) AS BIGINT) AS n_cooccurrences
         |          FROM runsr GROUP BY 1, 2)
         |SELECT * FROM ragg
         |WHERE max_run_tokens >= 6 AND NOT (SELECT hot FROM dec)
         |UNION ALL
         |SELECT * FROM raggr
         |WHERE max_run_tokens >= 6 AND (SELECT hot FROM dec)
         |ORDER BY a_id, b_id""".stripMargin,

    // the boilerplate escape: postings whose hash occurs > 64 times are
    // cut BEFORE the co-occurrence join (the shared header disappears as
    // pair evidence; the bounded-df class quote survives), then the same
    // island merge as verbatim_overlap
    "verbatim_overlap_dfcap" ->
      s"""WITH $boilerplateCorpusCte,
         |${positionalShingleCtes("bpc")},
         |keeph AS (SELECT h FROM pos GROUP BY h HAVING count(*) <= 64),
         |posf AS MATERIALIZED (SELECT pos.* FROM pos JOIN keeph USING (h)),
         |co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM posf a JOIN posf b ON a.h = b.h AND a.doc_id < b.doc_id),
         |$runAggSql
         |SELECT * FROM ragg WHERE max_run_tokens >= 8
         |ORDER BY a_id, b_id""".stripMargin,

    // the against-seen-corpus rung: incoming (bucket 5..14 — quoted AND
    // unquoted halves, both verdict arms live) postings join reference
    // (bucket <5 or >=15) postings on the hash, islands per (pair,
    // diagonal), pairs at run >= 8, per-incoming aggregate + zero restore
    "verbatim_incremental" ->
      s"""WITH $quoteOverlapCorpusCte,
         |${positionalShingleCtes("qc")},
         |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 BETWEEN 5 AND 14
         |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 NOT BETWEEN 5 AND 14),
         |runs AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY 1, 2, 3, 4),
         |pr AS (SELECT inc_id, ref_id, max(len) + 4 AS mr FROM runs GROUP BY 1, 2),
         |agg AS (SELECT inc_id, CAST(count(*) AS BIGINT) AS n_ref_runs,
         |               CAST(max(mr) AS BIGINT) AS mr
         |        FROM pr WHERE mr >= 8 GROUP BY inc_id)
         |SELECT q.doc_id, coalesce(a.n_ref_runs, 0) AS n_ref_runs,
         |       coalesce(a.mr, 0) AS max_run_tokens,
         |       (coalesce(a.n_ref_runs, 0) = 0) AS keep
         |FROM qc q LEFT JOIN agg a ON q.doc_id = a.inc_id
         |WHERE ('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 BETWEEN 5 AND 14
         |ORDER BY q.doc_id""".stripMargin,

    // the indexed twin over the RAW warehouse split (state = stored
    // postings of bucket<50): the ground truth is engine-independent, so
    // index correctness is proven by the same brute-force SQL the inline
    // form would get on this slice — plus DedupSpec's indexed ≡ inline pin
    "verbatim_incremental_indexed" ->
      s"""WITH ${positionalShingleCtes("documents")},
         |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50
         |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 50),
         |runs AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY 1, 2, 3, 4),
         |pr AS (SELECT inc_id, ref_id, max(len) + 4 AS mr FROM runs GROUP BY 1, 2),
         |agg AS (SELECT inc_id, CAST(count(*) AS BIGINT) AS n_ref_runs,
         |               CAST(max(mr) AS BIGINT) AS mr
         |        FROM pr WHERE mr >= 20 GROUP BY inc_id)
         |SELECT d.doc_id, coalesce(a.n_ref_runs, 0) AS n_ref_runs,
         |       coalesce(a.mr, 0) AS max_run_tokens,
         |       (coalesce(a.n_ref_runs, 0) = 0) AS keep
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.inc_id
         |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50
         |ORDER BY d.doc_id""".stripMargin,

    // the decontamination treatment: islands keep min(pa), coverage =
    // [p0, p0+len+k-2] per qualifying island, token anti-join, the
    // span_trim ordered reassembly — train docs only
    "decontaminate_trim" ->
      s"""WITH qdc AS (SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10
         |           OR ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90
         |         THEN text || ' ' || array_to_string(list_transform(range(0, 8),
         |                i -> substr(md5(CAST(doc_id % 3 AS VARCHAR)), CAST(i*4+1 AS BIGINT), 4)), ' ')
         |         ELSE text END AS text
         |  FROM documents),
         |t0 AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM qdc),
         |${positionalShingleCtes("qdc")},
         |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90),
         |isl AS (SELECT inc_id, min(pa) AS p0, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag, pa,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY inc_id, ref_id, diag, grp
         |  HAVING count(*) + 4 >= 8),
         |cov AS (SELECT DISTINCT doc_id, CAST(u AS BIGINT) AS ti FROM (
         |  SELECT inc_id AS doc_id, unnest(range(p0, p0 + len + 4)) AS u FROM isl) q),
         |tok AS (SELECT doc_id, u.ti AS ti, u.w AS w FROM (
         |  SELECT doc_id, unnest(list_transform(range(0, len(t)), i -> {'ti': i, 'w': t[i+1]})) AS u
         |  FROM t0 WHERE len(t) >= 5
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80) q),
         |kept AS (SELECT tok.doc_id, string_agg(w, ' ' ORDER BY tok.ti) AS kept_text,
         |           count(*) AS n_kept
         |         FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ti = cov.ti
         |         WHERE cov.ti IS NULL GROUP BY tok.doc_id)
         |SELECT t0.doc_id,
         |  CASE WHEN len(t) < 5 THEN text ELSE coalesce(kept.kept_text, '') END AS kept_text,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN len(t) < 5 THEN 0
         |            ELSE len(t) - coalesce(kept.n_kept, 0) END AS BIGINT) AS n_removed,
         |  round((CASE WHEN len(t) < 5 THEN 0
         |              ELSE len(t) - coalesce(kept.n_kept, 0) END)::DOUBLE
         |        / greatest(len(t), 1), 6) AS removed_ratio
         |FROM t0 LEFT JOIN kept ON t0.doc_id = kept.doc_id
         |WHERE ('0x' || substr(md5(CAST(t0.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |ORDER BY t0.doc_id""".stripMargin,

    // run-length decontamination over the two-sided quote corpus: per
    // TRAIN doc (bucket<80) the longest run vs ANY eval doc (bucket>=90)
    // — max over ALL pair runs, hits counted at the >= 8 rule
    "decontaminate_runs" ->
      s"""WITH qdc AS (SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 10
         |           OR ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90
         |         THEN text || ' ' || array_to_string(list_transform(range(0, 8),
         |                i -> substr(md5(CAST(doc_id % 3 AS VARCHAR)), CAST(i*4+1 AS BIGINT), 4)), ' ')
         |         ELSE text END AS text
         |  FROM documents),
         |${positionalShingleCtes("qdc")},
         |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90),
         |runs AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY 1, 2, 3, 4),
         |pr AS (SELECT inc_id, ref_id, max(len) + 4 AS mr FROM runs GROUP BY 1, 2),
         |agg AS (SELECT inc_id, CAST(max(mr) AS BIGINT) AS mr,
         |               CAST(sum(CASE WHEN mr >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_hits
         |        FROM pr GROUP BY inc_id)
         |SELECT q.doc_id, coalesce(a.mr, 0) AS max_run_tokens,
         |       coalesce(a.n_eval_hits, 0) AS n_eval_hits,
         |       (coalesce(a.mr, 0) >= 8) AS contaminated
         |FROM qdc q LEFT JOIN agg a ON q.doc_id = a.inc_id
         |WHERE ('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |ORDER BY q.doc_id""".stripMargin,

    // the capped run rule over the template device: eval postings hotter
    // than maxEvalDf = 20 are cut BEFORE the cross join (the benchmark's
    // shared prompt format stops flagging format-only matches), content
    // quotes survive
    "decontaminate_runs_capped" ->
      s"""WITH tdc AS (SELECT doc_id,
         |    CASE WHEN bkt >= 90 THEN tpl || ' ' || text || ' ' || q
         |         WHEN bkt >= 20 AND bkt < 30 THEN tpl || ' ' || text
         |         WHEN bkt < 10 THEN text || ' ' || q
         |         ELSE text END AS text
         |  FROM (SELECT doc_id, text,
         |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS bkt,
         |          array_to_string(list_transform(range(0, 10),
         |            i -> substr(md5('tpl'), CAST(i*3+1 AS BIGINT), 3)), ' ') AS tpl,
         |          array_to_string(list_transform(range(0, 8),
         |            i -> substr(md5(CAST(doc_id % 3 AS VARCHAR)), CAST(i*4+1 AS BIGINT), 4)), ' ') AS q
         |        FROM documents) z),
         |${positionalShingleCtes("tdc")},
         |evp AS (SELECT pos.* FROM pos
         |        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90),
         |keeph AS (SELECT h FROM evp GROUP BY h HAVING count(*) <= 20),
         |evf AS (SELECT evp.* FROM evp JOIN keeph USING (h)),
         |co AS (SELECT a.doc_id AS inc_id, e.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - e.pos AS diag
         |       FROM pos a JOIN evf e ON a.h = e.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80),
         |runs AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY 1, 2, 3, 4),
         |pr AS (SELECT inc_id, ref_id, max(len) + 4 AS mr FROM runs GROUP BY 1, 2),
         |agg AS (SELECT inc_id, CAST(max(mr) AS BIGINT) AS mr,
         |               CAST(sum(CASE WHEN mr >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_hits
         |        FROM pr GROUP BY inc_id)
         |SELECT t.doc_id, coalesce(a.mr, 0) AS max_run_tokens,
         |       coalesce(a.n_eval_hits, 0) AS n_eval_hits,
         |       (coalesce(a.mr, 0) >= 8) AS contaminated
         |FROM tdc t LEFT JOIN agg a ON t.doc_id = a.inc_id
         |WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |ORDER BY t.doc_id""".stripMargin,

    // the indexed TREATMENT over the raw corpus: same islands->coverage->
    // anti-join->reassembly chain as decontaminate_trim, minRun 13, no
    // quote device — natural replicas carry the trims
    "decontaminate_trim_indexed" ->
      s"""WITH t0 AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
         |${positionalShingleCtes("documents")},
         |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90),
         |isl AS (SELECT inc_id, min(pa) AS p0, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag, pa,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY inc_id, ref_id, diag, grp
         |  HAVING count(*) + 4 >= 13),
         |cov AS (SELECT DISTINCT doc_id, CAST(u AS BIGINT) AS ti FROM (
         |  SELECT inc_id AS doc_id, unnest(range(p0, p0 + len + 4)) AS u FROM isl) q),
         |tok AS (SELECT doc_id, u.ti AS ti, u.w AS w FROM (
         |  SELECT doc_id, unnest(list_transform(range(0, len(t)), i -> {'ti': i, 'w': t[i+1]})) AS u
         |  FROM t0 WHERE len(t) >= 5
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80) q),
         |kept AS (SELECT tok.doc_id, string_agg(w, ' ' ORDER BY tok.ti) AS kept_text,
         |           count(*) AS n_kept
         |         FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ti = cov.ti
         |         WHERE cov.ti IS NULL GROUP BY tok.doc_id)
         |SELECT t0.doc_id,
         |  CASE WHEN len(t) < 5 THEN text ELSE coalesce(kept.kept_text, '') END AS kept_text,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN len(t) < 5 THEN 0
         |            ELSE len(t) - coalesce(kept.n_kept, 0) END AS BIGINT) AS n_removed,
         |  round((CASE WHEN len(t) < 5 THEN 0
         |              ELSE len(t) - coalesce(kept.n_kept, 0) END)::DOUBLE
         |        / greatest(len(t), 1), 6) AS removed_ratio
         |FROM t0 LEFT JOIN kept ON t0.doc_id = kept.doc_id
         |WHERE ('0x' || substr(md5(CAST(t0.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |ORDER BY t0.doc_id""".stripMargin,

    // the indexed eval-suite audit over the RAW corpus: the stored index
    // holds the eval slice's postings, so the inline re-derivation is the
    // same chain over documents directly (natural replicas straddling the
    // bucket split carry the >= 13-token runs)
    "decontaminate_runs_indexed" ->
      s"""WITH ${positionalShingleCtes("documents")},
         |co AS (SELECT a.doc_id AS inc_id, b.doc_id AS ref_id, a.pos AS pa,
         |              a.pos - b.pos AS diag
         |       FROM pos a JOIN pos b ON a.h = b.h
         |       WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |         AND ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 90),
         |runs AS (SELECT inc_id, ref_id, diag, grp, count(*) AS len FROM (
         |  SELECT inc_id, ref_id, diag,
         |         pa - row_number() OVER (PARTITION BY inc_id, ref_id, diag ORDER BY pa) AS grp
         |  FROM co) z GROUP BY 1, 2, 3, 4),
         |pr AS (SELECT inc_id, ref_id, max(len) + 4 AS mr FROM runs GROUP BY 1, 2),
         |agg AS (SELECT inc_id, CAST(max(mr) AS BIGINT) AS mr,
         |               CAST(sum(CASE WHEN mr >= 13 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_hits
         |        FROM pr GROUP BY inc_id)
         |SELECT d.doc_id, coalesce(a.mr, 0) AS max_run_tokens,
         |       coalesce(a.n_eval_hits, 0) AS n_eval_hits,
         |       (coalesce(a.mr, 0) >= 13) AS contaminated
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.inc_id
         |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80
         |ORDER BY d.doc_id""".stripMargin,

    // the flip side, keyed by the benchmark doc: same chain, sides
    // swapped — aggregation mirrors decontaminate_runs (max over ALL pair
    // runs, leaks counted at the rule), the r16 advice's asymmetry closed
    "eval_leak_report" -> evalLeakReportSql,

    // the indexed twin probes the STORED eval postings; ground truth is
    // engine-independent, so the same inline SQL proves it — plus
    // DedupSpec's indexed ≡ inline pin
    "eval_leak_report_indexed" -> evalLeakReportSql,

    // the sign-plane band-key audit over the saturating replica
    // embedding corpus — the image_key_audit device, embedding edition
    "simhash_key_audit" ->
      s"""WITH $simhashSaturatedBandCtes,
         |${bandAuditSql(3)}""".stripMargin,

    // the embedding-family escape: the fan-out rule gates the full
    // cosine-verified chain vs the full-bit-signature rep chain — this
    // corpus saturates, so the rep arm is the live one on both engines
    "simhash_near_auto" ->
      s"""WITH $simhashSaturatedBandCtes,
         |b AS (SELECT band, key, count(*) AS bn FROM bands GROUP BY 1, 2),
         |dec AS (SELECT CAST(sum(bn * bn) AS DOUBLE)
         |               > 16.0 * greatest(CAST(sum(bn) / 3 AS BIGINT), 1) AS hot FROM b),
         |rep AS MATERIALIZED (SELECT min(vec_id) AS vec_id FROM bits
         |       GROUP BY array_to_string(bs, '')),
         |cf AS (SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
         |       FROM bands a JOIN bands b2
         |         ON a.band = b2.band AND a.key = b2.key AND a.vec_id < b2.vec_id),
         |vf AS (SELECT c.a_id, c.b_id, ${cosSql("ea.v", "eb.v")} AS score
         |       FROM cf c JOIN esc ea ON ea.vec_id = c.a_id
         |                 JOIN esc eb ON eb.vec_id = c.b_id),
         |bandsr AS (SELECT b3.* FROM bands b3 JOIN rep r ON b3.vec_id = r.vec_id),
         |cr AS (SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
         |       FROM bandsr a JOIN bandsr b2
         |         ON a.band = b2.band AND a.key = b2.key AND a.vec_id < b2.vec_id),
         |vr AS (SELECT c.a_id, c.b_id, ${cosSql("ea.v", "eb.v")} AS score
         |       FROM cr c JOIN esc ea ON ea.vec_id = c.a_id
         |                 JOIN esc eb ON eb.vec_id = c.b_id)
         |SELECT a_id, b_id, score FROM vf
         |WHERE score >= 0.3 AND NOT (SELECT hot FROM dec)
         |UNION ALL
         |SELECT a_id, b_id, score FROM vr
         |WHERE score >= 0.3 AND (SELECT hot FROM dec)
         |ORDER BY a_id, b_id""".stripMargin,

    // the distinct-embedding group audit over the replica corpus —
    // Σ|group|² is the within-cell pair floor no hot-cell dial can cut
    "semantic_key_audit" ->
      s"""WITH $embeddingSaturatedCte,
         |g AS (SELECT v, count(*) AS gn FROM esc GROUP BY v)
         |SELECT CAST(sum(gn) AS BIGINT) AS n_vecs,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(max(gn) AS BIGINT) AS max_group,
         |  round(sum(gn)::DOUBLE / count(*), 6) AS mean_group,
         |  CAST(sum(gn * gn) AS DOUBLE) AS est_candidates
         |FROM g""".stripMargin,

    // the SemDeDup exact-collapse escape: the fan-out rule gates the
    // naive within-cell chain vs the rep-slice chain + member restore
    // (members share their rep's cell, lose to it, and inherit its
    // dup_of; the rep slice re-seeds from its own vec_id < 16 window)
    "dedup_semantic_auto_sat" ->
      s"""WITH $embeddingSaturatedCte,
         |g AS MATERIALIZED (SELECT v, min(vec_id) AS rep, count(*) AS gn
         |     FROM esc GROUP BY v),
         |dec AS (SELECT CAST(sum(gn * gn) AS DOUBLE)
         |               > 16.0 * greatest(sum(gn), 1) AS hot FROM g),
         |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM esc WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
         |    SELECT esc.vec_id, esc.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "esc.v")}) AS sc
         |    FROM esc, cents) t),
         |dups AS (
         |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.4
         |  GROUP BY b.vec_id),
         |naive AS (SELECT s.vec_id, s.cell, (d.dup_of IS NULL) AS keep, d.dup_of
         |          FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id),
         |escr AS (SELECT g.rep AS vec_id, g.v FROM g),
         |centsr AS (SELECT list(v ORDER BY vec_id) AS cl FROM escr WHERE vec_id < 16),
         |assignedr AS (
         |  SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
         |    SELECT escr.vec_id, escr.v,
         |           list_transform(range(1, len(cl) + 1), ci -> ${cosRawSql("cl[ci]", "escr.v")}) AS sc
         |    FROM escr, centsr) t),
         |dupsr AS (
         |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM assignedr a JOIN assignedr b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.4
         |  GROUP BY b.vec_id),
         |baser AS (SELECT s.vec_id, s.cell, (d.dup_of IS NULL) AS keep, d.dup_of
         |          FROM assignedr s LEFT JOIN dupsr d ON s.vec_id = d.vec_id),
         |rest AS (SELECT e2.vec_id, br.cell,
         |           (e2.vec_id = g.rep AND br.keep) AS keep,
         |           CASE WHEN e2.vec_id = g.rep THEN br.dup_of
         |                ELSE coalesce(br.dup_of, g.rep) END AS dup_of
         |         FROM esc e2 JOIN g ON e2.v = g.v
         |         JOIN baser br ON br.vec_id = g.rep)
         |SELECT vec_id, cell, keep, dup_of FROM naive
         |WHERE NOT (SELECT hot FROM dec)
         |UNION ALL
         |SELECT vec_id, cell, keep, dup_of FROM rest
         |WHERE (SELECT hot FROM dec)
         |ORDER BY vec_id""".stripMargin,

    // the fhash key-space audit: bucket sizes by exact frame hash over the
    // saturating intro-card corpus; Σ|bucket|² is the vote join's pre-cut
    // row count — the audio_key_audit device, video edition
    "video_key_audit" ->
      s"""WITH $videoSaturatedVcCtes,
         |$videoFrameHashCtes,
         |bkt AS (SELECT fhash, count(*) AS bn FROM fh GROUP BY 1)
         |SELECT CAST(sum(bn) AS BIGINT) AS n_frames,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(max(bn) AS BIGINT) AS max_bucket,
         |  round(sum(bn)::DOUBLE / count(*), 6) AS mean_bucket,
         |  CAST(sum(bn * bn) AS DOUBLE) AS est_candidates
         |FROM bkt""".stripMargin,

    // the self-dialing mine: the audit's fan-out (Σ|bucket|² / n_frames)
    // gates the brute-forced Hamming vote chain vs the consecutive-bigram
    // vote chain — the audio_auto_near branching device; this corpus
    // saturates, so the bigram arm is the live one on both engines
    "video_near_auto" ->
      s"""WITH $videoSaturatedVcCtes,
         |$videoFrameHashCtes,
         |bkt AS (SELECT fhash, count(*) AS bn FROM fh GROUP BY 1),
         |dec AS (SELECT sum(bn * bn)::DOUBLE > 16.0 * sum(bn)::DOUBLE AS hot FROM bkt),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |        a.frame_no - b.frame_no AS off
         |      FROM fh a JOIN fh b ON a.doc_id < b.doc_id
         |        AND bit_count(xor(a.fhash, b.fhash)) <= 3),
         |vv AS (SELECT a_id, b_id, off, count(*) AS v FROM p GROUP BY 1, 2, 3),
         |bg AS (SELECT doc_id, frame_no, fhash,
         |         lead(fhash) OVER (PARTITION BY doc_id ORDER BY frame_no) AS nhash
         |       FROM fh),
         |bgn AS (SELECT * FROM bg WHERE nhash IS NOT NULL),
         |p2 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |         a.frame_no - b.frame_no AS off
         |       FROM bgn a JOIN bgn b ON a.fhash = b.fhash AND a.nhash = b.nhash
         |         AND a.doc_id < b.doc_id),
         |vv2 AS (SELECT a_id, b_id, off, count(*) AS v FROM p2 GROUP BY 1, 2, 3)
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vv WHERE NOT (SELECT hot FROM dec)
         |GROUP BY a_id, b_id HAVING max(v) >= 3
         |UNION ALL
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vv2 WHERE (SELECT hot FROM dec)
         |GROUP BY a_id, b_id HAVING max(v) >= 3
         |ORDER BY a_id, b_id""".stripMargin,

    // the self-dialed TREATMENT form: fingerprint collapse first, then the
    // audit (fan-out over the REPS' frames) gates which rep vote chain
    // feeds the component walk — saturated here, so the bigram chain is
    // the live arm; verdicts inherit the rep's root as in video_dedup
    "video_dedup_auto" ->
      s"""WITH RECURSIVE $videoSaturatedVcCtes,
         |$videoFrameHashCtes,
         |fp AS (SELECT doc_id, string_agg(
         |         CAST(frame_no AS VARCHAR) || ':' || CAST(fhash AS VARCHAR),
         |         ' ' ORDER BY frame_no) AS fp
         |       FROM fh GROUP BY doc_id),
         |rp AS (SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY fp) AS rep FROM fp),
         |fhr AS (SELECT fh.* FROM fh JOIN rp ON fh.doc_id = rp.id AND rp.id = rp.rep),
         |bkt AS (SELECT fhash, count(*) AS bn FROM fhr GROUP BY 1),
         |dec AS (SELECT sum(bn * bn)::DOUBLE > 16.0 * sum(bn)::DOUBLE AS hot FROM bkt),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |        a.frame_no - b.frame_no AS off
         |      FROM fhr a JOIN fhr b ON a.fhash = b.fhash AND a.doc_id < b.doc_id),
         |vv AS (SELECT a_id, b_id, off, count(*) AS v FROM p GROUP BY 1, 2, 3),
         |bg AS (SELECT doc_id, frame_no, fhash,
         |         lead(fhash) OVER (PARTITION BY doc_id ORDER BY frame_no) AS nhash
         |       FROM fhr),
         |bgn AS (SELECT * FROM bg WHERE nhash IS NOT NULL),
         |p2 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |         a.frame_no - b.frame_no AS off
         |       FROM bgn a JOIN bgn b ON a.fhash = b.fhash AND a.nhash = b.nhash
         |         AND a.doc_id < b.doc_id),
         |vv2 AS (SELECT a_id, b_id, off, count(*) AS v FROM p2 GROUP BY 1, 2, 3),
         |pr AS (SELECT a_id AS pa, b_id AS pb FROM vv
         |       WHERE NOT (SELECT hot FROM dec)
         |       GROUP BY a_id, b_id HAVING max(v) >= 3
         |       UNION ALL
         |       SELECT a_id AS pa, b_id AS pb FROM vv2
         |       WHERE (SELECT hot FROM dec)
         |       GROUP BY a_id, b_id HAVING max(v) >= 3),
         |e AS (SELECT pa, pb FROM pr UNION SELECT pb, pa FROM pr),
         |walk(pa, pb) AS (SELECT pa, pb FROM e
         |                 UNION SELECT walk.pa, e.pb FROM walk JOIN e ON walk.pb = e.pa),
         |roots AS (SELECT pa AS id, least(pa, min(pb)) AS root FROM walk GROUP BY pa)
         |SELECT rp.id AS doc_id, coalesce(rt.root, rp.rep) AS group_id,
         |       rp.id = coalesce(rt.root, rp.rep) AS keep
         |FROM rp LEFT JOIN roots rt ON rt.id = rp.rep
         |ORDER BY doc_id""".stripMargin,

    "multimodal_video" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)),
        |g AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |        CASE WHEN i < strlen(text)
        |             THEN ascii(substr(text, CAST(i+1 AS BIGINT), 1)) ELSE 0 END) AS gr
        |      FROM d)
        |SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), k ->
        |        CASE WHEN gr[CAST((k//7)*8 + (k%7) + 2 AS BIGINT)]
        |                  > gr[CAST((k//7)*8 + (k%7) + 1 AS BIGINT)]
        |             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS phash
        |FROM g ORDER BY doc_id""".stripMargin,

    // envelope re-derivation from the same header-wrapped bytes as
    // multimodal_audio: 16-sample windows, level = count of quarter-octave
    // thresholds reached (the EXACT integer table Multimodal embeds — no
    // float log/pow on either engine), then the approx signature chain
    // over the level string with 4-level shingles
    "audio_near" -> {
      val thresholds = graft.operators.Multimodal.QuarterOctaveThresholds
        .mkString("[", ",", "]")
      val envSrc =
        s"""SELECT doc_id, array_to_string(list_transform(
          |    list_transform(range(0, n // 16), w -> list_sum(list_transform(
          |        range(w*16, w*16 + 16), j -> CAST(s[CAST(j+1 AS BIGINT)] AS BIGINT) * s[CAST(j+1 AS BIGINT)]))),
          |    ss -> CAST(len(list_filter($thresholds, t -> ss >= t)) AS VARCHAR)), ' ') AS text
          |  FROM sm""".stripMargin
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |  WHERE strlen(text) = length(text)
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 20),
         |p AS (SELECT doc_id, least(strlen(text), 512) // 2 AS n, text FROM d),
         |sm AS (SELECT doc_id, n, list_transform(range(0, n), i ->
         |     ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) * 256
         |   + ascii(substr(text, CAST(2*i+1 AS BIGINT), 1))) AS s FROM p),
         |${approxPairsSql(shingle = 4, sourceSql = envSrc)}
         |SELECT a_id, b_id, est_jaccard FROM pairs ORDER BY a_id, b_id""".stripMargin
    },

    // the full landmark pipeline re-derived in SQL: both arms' samples
    // (arm B = 12 zero samples ++ content truncated to the same 512-byte
    // payload budget), HOPPED windows (hop 4, window 16), quarter-octave
    // levels from the exact threshold table, strict-rise/non-strict-fall
    // peaks, anchor→next-≤3-peaks-within-8 landmark pairs, and the
    // (la, lb, dt)-key join with per-offset voting — one mis-derived
    // window boundary or peak rule and every vote count shifts
    "audio_shift_near" ->
      s"""$audioShiftLvCtes,
         |${audioLandmarkVoteCtes("lv")}
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vt GROUP BY a_id, b_id HAVING max(v) >= 5
         |ORDER BY a_id, b_id""".stripMargin,

    // the self-dialing mine: the pair-form audit's mean bucket gates
    // which vote chain produces rows — at this corpus 18.43 > 16 fires
    // the TRIPLE chain (its first oracle exercise; the operator
    // re-extracts triples exactly when the pair key space is saturated)
    "audio_auto_near" ->
      s"""$audioShiftLvCtes,
         |${audioLandmarkVoteCtes("lv")},
         |$audioLandmarkTripleCtes,
         |bkt AS (SELECT la, lb, dt, count(*) AS bn FROM lmr GROUP BY 1, 2, 3),
         |dec AS (SELECT round(sum(bn)::DOUBLE / count(*), 6) > 16.0 AS hot FROM bkt)
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vt WHERE NOT (SELECT hot FROM dec)
         |GROUP BY a_id, b_id HAVING max(v) >= 5
         |UNION ALL
         |SELECT a_id, b_id, CAST(max(v) AS BIGINT) AS votes
         |FROM vt3 WHERE (SELECT hot FROM dec)
         |GROUP BY a_id, b_id HAVING max(v) >= 5
         |ORDER BY a_id, b_id""".stripMargin,

    // the key-saturation audit over the same landmark rows: bucket sizes
    // by the (la, lb, dt) pair key (lc = dt2 = 0 under pairs, so the
    // 3-column grouping is the operator's 5-column one), Σ|bucket|² is the
    // vote join's pre-cut row count exactly
    "audio_key_audit" ->
      s"""$audioShiftLvCtes,
         |${audioLandmarkRowCtes("lv")},
         |b AS (SELECT la, lb, dt, count(*) AS bn FROM lmr GROUP BY 1, 2, 3)
         |SELECT CAST(sum(bn) AS BIGINT) AS n_landmarks,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(max(bn) AS BIGINT) AS max_bucket,
         |  round(sum(bn)::DOUBLE / count(*), 6) AS mean_bucket,
         |  CAST(sum(bn * bn) AS DOUBLE) AS est_candidates
         |FROM b""".stripMargin,

    // the treatment form's oracle: same corpus and landmark chain, but the
    // mine runs among ENVELOPE-distinct representatives (rep = min id per
    // level list — the exact-collapse discipline), pairs at max(v) >= 5
    // feed the dedup_image recursive component walk, and every doc
    // inherits its rep's root
    "audio_dedup" ->
      s"""$audioShiftLvCtes,
         |rp AS (SELECT id, min(id) OVER (PARTITION BY L) AS rep FROM lv),
         |lvr AS (SELECT lv.* FROM lv JOIN rp ON lv.id = rp.id AND rp.id = rp.rep),
         |${audioLandmarkVoteCtes("lvr")},
         |pr AS (SELECT a_id AS pa, b_id AS pb FROM vt
         |       GROUP BY a_id, b_id HAVING max(v) >= 5),
         |e AS (SELECT pa, pb FROM pr UNION SELECT pb, pa FROM pr),
         |walk(pa, pb) AS (SELECT pa, pb FROM e
         |                 UNION SELECT walk.pa, e.pb FROM walk JOIN e ON walk.pb = e.pa),
         |roots AS (SELECT pa AS id, least(pa, min(pb)) AS root FROM walk GROUP BY pa)
         |SELECT rp.id AS doc_id, coalesce(rt.root, rp.rep) AS group_id,
         |       rp.id = coalesce(rt.root, rp.rep) AS keep
         |FROM rp LEFT JOIN roots rt ON rt.id = rp.rep
         |ORDER BY doc_id""".stripMargin,

    // the self-dialed treatment form: the audit (mean pair-key bucket over
    // the REPS' landmark rows) gates the pair and triple vote chains — the
    // audio_auto_near branching device inside the audio_dedup component
    // walk; on this corpus the reps saturate the key space, so the triple
    // chain is the live arm on both engines
    "audio_dedup_auto" ->
      s"""$audioShiftLvCtes,
         |rp AS (SELECT id, min(id) OVER (PARTITION BY L) AS rep FROM lv),
         |lvr AS (SELECT lv.* FROM lv JOIN rp ON lv.id = rp.id AND rp.id = rp.rep),
         |${audioLandmarkVoteCtes("lvr")},
         |$audioLandmarkTripleCtes,
         |bkt AS (SELECT la, lb, dt, count(*) AS bn FROM lmr GROUP BY 1, 2, 3),
         |dec AS (SELECT round(sum(bn)::DOUBLE / count(*), 6) > 16.0 AS hot FROM bkt),
         |pr AS (SELECT a_id AS pa, b_id AS pb FROM vt
         |       WHERE NOT (SELECT hot FROM dec)
         |       GROUP BY a_id, b_id HAVING max(v) >= 5
         |       UNION ALL
         |       SELECT a_id AS pa, b_id AS pb FROM vt3
         |       WHERE (SELECT hot FROM dec)
         |       GROUP BY a_id, b_id HAVING max(v) >= 5),
         |e AS (SELECT pa, pb FROM pr UNION SELECT pb, pa FROM pr),
         |walk(pa, pb) AS (SELECT pa, pb FROM e
         |                 UNION SELECT walk.pa, e.pb FROM walk JOIN e ON walk.pb = e.pa),
         |roots AS (SELECT pa AS id, least(pa, min(pb)) AS root FROM walk GROUP BY pa)
         |SELECT rp.id AS doc_id, coalesce(rt.root, rp.rep) AS group_id,
         |       rp.id = coalesce(rt.root, rp.rep) AS keep
         |FROM rp LEFT JOIN roots rt ON rt.id = rp.rep
         |ORDER BY doc_id""".stripMargin,

    // the oracle rebuilds the 16-bit LE samples from the document bytes the
    // Spark side wrapped in a WAV header (ASCII-pure rows: bytes == chars,
    // so ascii() IS the byte — the multimodal_frames device); hi byte
    // <= 127 keeps every sample non-negative, matching the signed decode
    "multimodal_audio" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)),
        |p AS (SELECT doc_id, least(strlen(text), 512) // 2 AS n, text FROM d),
        |sm AS (SELECT doc_id, n, list_transform(range(0, n), i ->
        |     ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) * 256
        |   + ascii(substr(text, CAST(2*i+1 AS BIGINT), 1))) AS s FROM p)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(coalesce(list_max(list_transform(s, v -> abs(v))), 0) AS BIGINT) AS peak,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE round(sqrt(list_sum(list_transform(s, v -> CAST(v AS DOUBLE) * v)) / n), 6) END AS rms,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE round(len(list_filter(s, v -> abs(v) >= 32767)) / CAST(n AS DOUBLE), 6) END AS clipping_share,
        |  CAST(CASE WHEN n = 0 THEN 0
        |       ELSE list_min(list_transform(range(0, n), i ->
        |              CASE WHEN abs(s[CAST(i+1 AS BIGINT)]) > 327 THEN i ELSE n END)) * 1000 // 8000
        |       END AS BIGINT) AS leading_silence_ms
        |FROM sm ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """WITH f AS (SELECT doc_id, u.f AS frame_no,
        |    substr(text,
        |      CAST(1 + u.f * greatest(CAST(floor((length(text) - 32) / 3) AS BIGINT), 0) AS BIGINT),
        |      32) AS frame
        |  FROM (SELECT doc_id, text, unnest(list_transform(range(0, 4), x -> {'f': x})) AS u
        |        FROM documents WHERE length(text) >= 32 AND strlen(text) = length(text)) t)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  md5(frame) AS frame_fp,
        |  CAST(length(frame) AS BIGINT) AS frame_len
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,

    "ivf_topk_indexed" -> ivfTopkSql, // identical semantics: same centroids, same probe, same rerank

    "ivf_train_full" ->
      s"""WITH ${ivfTrainChainSql(10)}
         |SELECT cell, pos, m FROM c10 ORDER BY cell, pos""".stripMargin,

    // the trained-centroid probe: rank cells against the TRAINED centroids
    // (c10), assign the corpus with the same centroids, rerank exactly —
    // the ivfTopkSql shape with the seed centroids swapped for trained ones
    "ivf_topk_trained" ->
      s"""WITH ${ivfTrainChainSql(10)},
         |clF AS MATERIALIZED (SELECT list(cm ORDER BY cell) AS cl FROM (
         |  SELECT cell, list(m ORDER BY pos) AS cm FROM c10 GROUP BY cell) t),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |qcell AS (
         |  SELECT ci FROM (
         |    SELECT u.ci AS ci, u.s AS s FROM (
         |      SELECT unnest(list_transform(range(1, 17),
         |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
         |      FROM clF, q) z) t
         |  ORDER BY s DESC, ci ASC LIMIT 4),
         |assigned AS (
         |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
         |    SELECT e.vec_id, e.label, e.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
         |    FROM e, clF) t2)
         |SELECT a.vec_id, a.label, ${cosSql("a.v", "q.qv")} AS score
         |FROM assigned a, q
         |WHERE a.cell IN (SELECT ci FROM qcell)
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,
    "ivf_topk" -> ivfTopkSql,
    // two-level (hierarchical coarse quantizer) probe; the indexed variant
    // persists the same layers, so one oracle serves both
    // one PQ training step: per-subspace squared-L2 against the seeded
    // codebook (list ops in the SAME left-to-right accumulation order as
    // PqReconstruct.compute — bit-identical doubles before any rounding),
    // first-index argmin, then the 9-dp mean per (subspace, code, pos)
    "pq_train_step" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sl AS (SELECT list(v ORDER BY vec_id) AS sl FROM e WHERE vec_id < 16),
        |sc AS (SELECT t.vec_id, t.s,
        |    list_transform(range(0, 16), k -> list_sum(list_transform(range(0, 8), p ->
        |      (t.v[CAST(t.s*8+p+1 AS BIGINT)] - sl[CAST(k+1 AS BIGINT)][CAST(t.s*8+p+1 AS BIGINT)])
        |    * (t.v[CAST(t.s*8+p+1 AS BIGINT)] - sl[CAST(k+1 AS BIGINT)][CAST(t.s*8+p+1 AS BIGINT)])))) AS d
        |  FROM (SELECT vec_id, v, unnest(range(0, 8)) AS s FROM e) t, sl),
        |asg AS (SELECT vec_id, s, list_position(d, list_min(d)) - 1 AS code FROM sc)
        |SELECT CAST(a.s AS BIGINT) AS s, CAST(a.code AS BIGINT) AS code,
        |  CAST(pp.p AS BIGINT) AS p,
        |  round(avg(e.v[CAST(a.s*8 + pp.p + 1 AS BIGINT)]), 9) AS mv,
        |  count(*) AS members
        |FROM asg a JOIN e ON e.vec_id = a.vec_id,
        |     (SELECT unnest(range(0, 8)) AS p) pp
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // full PQ training, 3 unrolled Lloyd iterations (exact by the fixpoint
    // argument — see the query registration); empty-code fallback = the
    // per-step coalesce against the previous codebook
    "pq_train_full" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cb0 AS (SELECT CAST(u.s AS BIGINT) AS s, CAST(e.vec_id AS BIGINT) AS code,
         |          CAST(u2.p AS BIGINT) AS p,
         |          e.v[CAST(u.s*8 + u2.p + 1 AS BIGINT)] AS mv
         |        FROM e, (SELECT unnest(range(0, 8)) AS s) u,
         |             (SELECT unnest(range(0, 8)) AS p) u2
         |        WHERE e.vec_id < 16),
         |${pqTrainChainSql(3)}
         |SELECT s, code, p, mv FROM cb3 ORDER BY s, code, p""".stripMargin,

    "ivf_topk2" -> ivfTopk2Sql(),
    "ivf_topk2_indexed" -> ivfTopk2Sql(),
    // rung-picker auto twins: flat side shares ivf_topk's oracle verbatim;
    // the forced two-level side is the same generator at the derived
    // params (nCoarse = wCoarse = ⌈√16⌉ = 4 — coarse full-open)
    "ivf_topk_auto" -> ivfTopkSql,
    "ivf_topk_auto2" -> ivfTopk2Sql(16, 4, 4, 4),
    // stored-index rung picker: identical semantics to the inline rungs
    // (same centroids, same assignment, same rerank — the layout only
    // changes WHERE the cells live)
    "ivf_topk_auto_indexed" -> ivfTopkSql,
    "ivf_topk_auto_indexed2" -> ivfTopk2Sql(16, 4, 4, 4),
    // the recall-drop → rebuild loop: the decision (integer hit threshold)
    // and the served arm are both part of the compared result
    "ivf_retrain_on_recall" -> ivfRetrainOnRecallSql(),

    // mirrors Ann.ivfDeltaTopk: centroids Lloyd-trained on the BASE slice
    // only (vec_id < 250, the corpus at index-build time); the whole
    // corpus — base plus un-retrained delta — is assigned with those
    // frozen centroids and probed
    "ivf_delta_topk" ->
      s"""WITH ${ivfTrainChainSql(10, sourceSql =
            "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 250")},
         |clF AS MATERIALIZED (SELECT list(cm ORDER BY cell) AS cl FROM (
         |  SELECT cell, list(m ORDER BY pos) AS cm FROM c10 GROUP BY cell) t),
         |eAll AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM eAll WHERE vec_id = 0),
         |qcell AS (
         |  SELECT ci FROM (
         |    SELECT u.ci AS ci, u.s AS s FROM (
         |      SELECT unnest(list_transform(range(1, 17),
         |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
         |      FROM clF, q) z) t
         |  ORDER BY s DESC, ci ASC LIMIT 4),
         |assigned AS (
         |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
         |    SELECT eAll.vec_id, eAll.label, eAll.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "eAll.v")}) AS sc
         |    FROM eAll, clF) t2)
         |SELECT a.vec_id, a.label, ${cosSql("a.v", "q.qv")} AS score
         |FROM assigned a, q
         |WHERE a.cell IN (SELECT ci FROM qcell)
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "ivf_train_step" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, v, list_position(sc, list_max(sc)) AS cell FROM (
         |    SELECT e.vec_id, e.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
         |    FROM e, cents) t2),
         |ex AS (SELECT cell, u.pos AS pos, u.val AS val FROM (
         |  SELECT cell, unnest(list_transform(range(0, 64), i -> {'pos': i, 'val': v[i+1]})) AS u
         |  FROM assigned) t)
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
         |  round(avg(val), 9) AS m, count(*) AS members
         |FROM ex GROUP BY cell, pos ORDER BY cell, pos""".stripMargin,

    // Residual IVF-PQ (FAISS layout): encode v − centroid(cell) against the
    // residual codebook (seeds vec_id 16..31, each minus ITS assigned
    // centroid), reconstruct as centroid + decoded residual. MATERIALIZED
    // keeps the deep CTE chain from inlining exponentially.
    "ivfpq_topk" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS MATERIALIZED (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |qcell AS (
         |  SELECT ci FROM (
         |    SELECT u.ci AS ci, u.s AS s FROM (
         |      SELECT unnest(list_transform(range(1, 17),
         |        ci -> {'ci': ci, 's': round(${cosRawSql("cl[ci]", "q.qv")}, 6)})) AS u
         |      FROM cents, q) z) t
         |  ORDER BY s DESC, ci ASC LIMIT 4),
         |assigned AS MATERIALIZED (
         |  SELECT vec_id, label, v, list_position(sc, list_max(sc)) AS cell FROM (
         |    SELECT e.vec_id, e.label, e.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
         |    FROM e, cents) t2),
         |rcbl AS MATERIALIZED (
         |  SELECT list(r ORDER BY vec_id) AS rl FROM (
         |    SELECT a.vec_id, list_transform(range(1, 65), i -> a.v[i] - cl[a.cell][i]) AS r
         |    FROM assigned a, cents WHERE a.vec_id >= 16 AND a.vec_id < 32) s0),
         |resid AS MATERIALIZED (
         |  SELECT a.vec_id, a.cell, list_transform(range(1, 65), i -> a.v[i] - cl[a.cell][i]) AS r
         |  FROM assigned a, cents),
         |scs AS MATERIALIZED (SELECT vec_id,
         |    list_transform(range(0, 8), s ->
         |      list_transform(range(1, 17), j ->
         |        list_sum(list_transform(range(1, 9), i ->
         |          (r[s*8+i] - rl[j][s*8+i]) * (r[s*8+i] - rl[j][s*8+i]))))) AS scs
         |  FROM resid, rcbl),
         |rec AS MATERIALIZED (SELECT vec_id,
         |    flatten(list_transform(range(0, 8), s ->
         |      rl[list_position(scs[s+1], list_min(scs[s+1]))][s*8+1:s*8+8])) AS rr
         |  FROM scs, rcbl),
         |recon AS MATERIALIZED (
         |  SELECT r2.vec_id, list_transform(range(1, 65), i -> rec.rr[i] + cl[r2.cell][i]) AS rv
         |  FROM rec JOIN resid r2 USING (vec_id), cents)
         |SELECT a.vec_id, a.label, ${cosSql("recon.rv", "q.qv")} AS score
         |FROM assigned a, recon, q
         |WHERE a.vec_id = recon.vec_id AND a.cell IN (SELECT ci FROM qcell)
         |ORDER BY score DESC, a.vec_id ASC
         |LIMIT 10""".stripMargin,

    "ivfpq_recall" -> ivfPqRecallSql(),

    "ann_topk" -> annTopkSql,
    "ann_topk_indexed" -> annTopkSql, // identical semantics: same planes, same keys, same rerank
    "ann_recall" -> annRecallSql(),
    "ivf_recall" -> ivfRecallSql(),

    // mirrors Sessionize.userSequences: latest-256 cap (not binding at sf
    // scale but part of the contract), (ts, event_id) total order
    "user_sequences" ->
      """WITH recent AS (SELECT * FROM (
        |  SELECT user_id, ts, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn <= 256)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  md5(string_agg(event_type, '|' ORDER BY ts, event_id)) AS seq_fp,
        |  array_to_string((list(event_type ORDER BY ts, event_id))[1:8], '|') AS head
        |FROM recent GROUP BY user_id ORDER BY user_id""".stripMargin,

    // mirrors Sampling.weightedSample: Efraimidis-Spirakis keys from the
    // deterministic hash56 uniform, top-200 by (key DESC, doc_id)
    "weighted_sample" ->
      """WITH ks AS (SELECT doc_id,
        |    CAST(greatest(n_chars, 1) AS BIGINT) AS w,
        |    round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT + 1.0)
        |             / 72057594037927936.0)
        |          / greatest(n_chars, 1), 9) AS key
        |  FROM documents)
        |SELECT doc_id, w, key FROM ks
        |ORDER BY key DESC, doc_id ASC LIMIT 200""".stripMargin,

    // mirrors Sampling.qualitySample: TextAnalysis.quality's composite
    // score, quantile_cont == Spark exact percentile (6 dp), hash56 keep
    "quality_sample" ->
      """WITH qraw AS (
        | SELECT doc_id,
        |   len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','is')))
        |     + len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','que','y','en')))
        |     + len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist','ein'))) AS stop_hits,
        |   CASE WHEN length(text) > 0
        |        THEN length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)
        |        ELSE 0.0 END AS punct_raw
        | FROM documents),
        |qual AS (SELECT doc_id,
        |   round(least(1.0, n_tokens::DOUBLE / 100.0) * (1.0 - punct_raw)
        |         * (0.5 + 0.5 * CASE WHEN n_tokens > 0
        |                             THEN stop_hits::DOUBLE / n_tokens
        |                             ELSE 0.0 END), 6) AS quality
        | FROM qraw),
        |th AS (SELECT round(quantile_cont(quality, 0.25), 6) AS q1,
        |              round(quantile_cont(quality, 0.50), 6) AS q2,
        |              round(quantile_cont(quality, 0.75), 6) AS q3 FROM qual)
        |SELECT doc_id, quality, CAST(bin AS BIGINT) AS bin,
        |       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100
        |         < ([10, 25, 50, 100])[CAST(bin AS INT) + 1] AS keep
        |FROM (SELECT doc_id, quality,
        |        CASE WHEN quality < q1 THEN 0 WHEN quality < q2 THEN 1
        |             WHEN quality < q3 THEN 2 ELSE 3 END AS bin
        |      FROM qual, th) b
        |ORDER BY doc_id""".stripMargin,

    // temperature-scaled mixture: weight ∝ tokens^0.5, epochs at a 10M
    // token budget; token counts are the token_counts whitespace convention
    "source_mix" -> sourceMixSql,
    // the indexed rung re-derives the same weights from raw documents —
    // index identity is the claim
    "source_mix_indexed" -> sourceMixSql,

    // running evidence with state = the rest of the corpus IS the whole-
    // corpus mixture; the draw is restricted to the incoming slice
    "mixture_draw_incremental" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(pow(tokens, 0.5)) AS denom FROM per),
        |mix AS (SELECT source,
        |    round(pow(tokens, 0.5) / denom * 10000000.0 / tokens, 6) AS epochs
        |  FROM per, tot)
        |SELECT d.doc_id, d.source,
        |  CAST(floor(epochs) +
        |    CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT
        |              < CAST(floor((epochs - floor(epochs)) * 72057594037927936.0) AS BIGINT)
        |         THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
        |FROM documents d JOIN mix USING (source)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 >= 50
        |ORDER BY d.doc_id""".stripMargin,

    // achieved repeated-token volume vs the plan's target, per source
    "mixture_audit" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(pow(tokens, 0.5)) AS denom FROM per),
        |mix AS (SELECT source,
        |    round(pow(tokens, 0.5) / denom, 6) AS weight,
        |    round(pow(tokens, 0.5) / denom * 10000000.0 / tokens, 6) AS epochs
        |  FROM per, tot),
        |draw AS (SELECT d.doc_id, d.source,
        |    CAST(len(list_filter(string_split(d.text, ' '), x -> x != '')) AS BIGINT) AS n_tok,
        |    CAST(floor(epochs) +
        |      CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT
        |                < CAST(floor((epochs - floor(epochs)) * 72057594037927936.0) AS BIGINT)
        |           THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
        |  FROM documents d JOIN mix USING (source))
        |SELECT draw.source,
        |  CAST(sum(draw.n_repeats * draw.n_tok) AS BIGINT) AS achieved_tokens,
        |  round(mix.weight * 10000000.0, 6) AS target_tokens,
        |  round(sum(draw.n_repeats * draw.n_tok)::DOUBLE
        |    / (mix.weight * 10000000.0), 6) AS fill_ratio
        |FROM draw JOIN mix ON draw.source = mix.source
        |GROUP BY draw.source, mix.weight
        |ORDER BY draw.source""".stripMargin,

    // recrawl diff over the constructed two-snapshot pair (old = buckets
    // <90, new = >=10 with [40,50) rewritten): full-outer join of the two
    // md5 projections, four statuses each non-empty by construction
    "snapshot_diff" ->
      s"""WITH $snapshotPairCtes
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.old_hash = n.new_hash THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  o.old_hash, n.new_hash
         |FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin,
    // the indexed rung's old side is the FULL stored corpus (the dir's
    // documents table backs the content-hash index), so: removed = [0,10),
    // changed = [40,50), unchanged = the rest, no added — the oracle
    // re-derives every hash from raw text; index identity is the claim
    "snapshot_diff_indexed" ->
      s"""WITH $snapshotPairCtes
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.old_hash = n.new_hash THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  o.old_hash, n.new_hash
         |FROM (SELECT doc_id, md5(text) AS old_hash FROM documents) o
         |FULL OUTER JOIN news n ON o.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin,
    // the delta frame: new-side rows whose content the old snapshot does
    // not hold (added ∪ changed) — the rows a curate pass re-gates
    "snapshot_delta" ->
      s"""WITH $snapshotPairCtes
         |SELECT n.doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added' ELSE 'changed' END AS status
         |FROM news n LEFT JOIN olds o ON o.doc_id = n.doc_id
         |WHERE o.doc_id IS NULL OR o.old_hash != n.new_hash
         |ORDER BY n.doc_id""".stripMargin,
    // per-source turnover: status counts + churn share, source attributed
    // to the surviving row (new side where one exists)
    "snapshot_diff_stats" ->
      s"""WITH $snapshotPairCtes,
         |st AS (SELECT COALESCE(n.source, o.source) AS source,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.old_hash = n.new_hash THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id)
         |SELECT source,
         |  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         |  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |  CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         |  round(sum(CASE WHEN status != 'unchanged' THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*), 6) AS churn
         |FROM st GROUP BY source ORDER BY source""".stripMargin,

    // delta re-curation ≡ the full corpus-filter decisions chain over the
    // NEW snapshot (shadowing CTE; main.documents is the stored table) —
    // the delta path's claim is byte-identity at O(|delta|) text cost
    "gate_delta" ->
      s"""WITH documents AS (
         |  SELECT doc_id,
         |    CASE WHEN b >= 40 AND b < 50 THEN text || ' v2' ELSE text END AS text
         |  FROM (SELECT doc_id, text,
         |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::UBIGINT % 100 AS b
         |        FROM main.documents) t0
         |  WHERE b >= 10),
         |$corpusFilterCtes
         |SELECT doc_id, quality_ok, repetition_ok, pii_ok, dedup_ok,
         |  cf_kept AS kept
         |FROM cfd ORDER BY doc_id""".stripMargin,

    // mirrors Sampling.tokenShards: shard = tokens-before div budget over
    // the PLAIN doc_id-ordered running sum (the two-level-scan proof,
    // pack_sequences' shape without the lang key)
    "shard_assign" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT doc_id, n_tok, CAST(before // 10000 AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.gopherRules: integer tallies per rule, the pass
    // conjunction uses only integer comparisons (x10/x5 scalings)
    "gopher_rules" ->
      """WITH g AS (SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS w,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS nh,
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS ne
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sl,
        |    nh, ne,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS na,
        |    CAST(len(list_filter(w, x -> lower(x) IN ('the','a','of','and','to','is',
        |      'el','la','de','que','y','en','der','die','das','und','ist','ein'))) AS BIGINT) AS n_stop_hits,
        |    (text LIKE '- %' OR text LIKE '* %') AS bullet_start,
        |    (text LIKE '%...') AS ellipsis_end
        |  FROM g)
        |SELECT doc_id, n_words,
        |  round(CASE WHEN n_words > 0 THEN coalesce(sl, 0)::DOUBLE / n_words ELSE 0.0 END, 6) AS mean_word_len,
        |  round(CASE WHEN n_words > 0 THEN (nh + ne)::DOUBLE / n_words ELSE 0.0 END, 6) AS symbol_ratio,
        |  round(CASE WHEN n_words > 0 THEN na::DOUBLE / n_words ELSE 0.0 END, 6) AS alpha_word_ratio,
        |  n_stop_hits, bullet_start, ellipsis_end,
        |  (n_words >= 20 AND n_words <= 100000 AND n_words > 0
        |   AND coalesce(sl, 0) >= 3 * n_words AND coalesce(sl, 0) <= 10 * n_words
        |   AND (nh + ne) * 10 <= n_words
        |   AND na * 5 >= n_words * 4
        |   AND n_stop_hits >= 2
        |   AND NOT bullet_start AND NOT ellipsis_end) AS pass
        |FROM r ORDER BY doc_id""".stripMargin,

    // mirrors Sampling.mixtureDraw: floor(epochs) + a deterministic
    // hash-threshold extra draw; epochs is the 6-dp source_mix value so
    // both engines threshold identical doubles
    "mixture_draw" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(pow(tokens, 0.5)) AS denom FROM per),
        |mix AS (SELECT source,
        |    round(pow(tokens, 0.5) / denom * 10000000.0 / tokens, 6) AS epochs
        |  FROM per, tot)
        |SELECT d.doc_id, d.source,
        |  CAST(floor(epochs) +
        |    CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::UBIGINT
        |              < CAST(floor((epochs - floor(epochs)) * 72057594037927936.0) AS BIGINT)
        |         THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
        |FROM documents d JOIN mix USING (source)
        |ORDER BY d.doc_id""".stripMargin,

    // the oracle is the PLAIN per-lang running sum — proving the sharded
    // two-level scan computes the same global offsets
    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tok AS BIGINT) AS start
        |  FROM d)
        |SELECT doc_id, lang, n_tok, start,
        |  start // 1024 AS seq_first,
        |  (start + greatest(n_tok, 1) - 1) // 1024 AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,

    // cluster-balanced sampling: the IVF cell assignment + a per-cell
    // deterministic hash-order rank, keep <= 20 per cell
    "cell_sample" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT list(v ORDER BY vec_id) AS cl FROM e WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM (
         |    SELECT e.vec_id, e.v,
         |           list_transform(range(1, 17), ci -> ${cosRawSql("cl[ci]", "e.v")}) AS sc
         |    FROM e, cents) t)
         |SELECT vec_id, cell,
         |  CAST(row_number() OVER (PARTITION BY cell
         |    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT % 1000000,
         |             vec_id) AS BIGINT) AS cell_rank,
         |  row_number() OVER (PARTITION BY cell
         |    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT % 1000000,
         |             vec_id) <= 20 AS keep
         |FROM assigned ORDER BY vec_id""".stripMargin,

    // mirrors EmbeddingStats.embedDrift: hash56 split tag, 9 dp centroid
    // elements (the embed_label_stats centroid idiom), 6 dp cosine
    "embed_drift" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
         |    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14))::UBIGINT % 100 < 80 AS train
         |  FROM embeddings),
         |ex AS (SELECT train, label, u.i AS pos, u.v AS val FROM (
         |  SELECT train, label, unnest(list_transform(range(0, 64), i -> {'i': i, 'v': v[i+1]})) AS u
         |  FROM e) t),
         |cent0 AS (SELECT train, label, pos, round(avg(val), 9) AS m
         |          FROM ex GROUP BY train, label, pos),
         |cent AS (SELECT train, label, list(m ORDER BY pos) AS c
         |         FROM cent0 GROUP BY train, label),
         |counts AS (SELECT label,
         |    CAST(sum(CASE WHEN train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |    CAST(sum(CASE WHEN train THEN 0 ELSE 1 END) AS BIGINT) AS n_test
         |  FROM e GROUP BY label)
         |SELECT counts.label, n_train, n_test,
         |       round(${cosRawSql("tr.c", "te.c")}, 6) AS centroid_cos
         |FROM counts
         |JOIN cent tr ON tr.label = counts.label AND tr.train
         |JOIN cent te ON te.label = counts.label AND NOT te.train
         |ORDER BY counts.label""".stripMargin,

    // mirrors EmbeddingStats.dimRecall: truncated arm ranks on the first
    // 16 components; same rounded-score ranking + vec_id tie-break
    "dim_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |fullarm AS (SELECT query_id, vec_id FROM (
         |  SELECT q.query_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.query_id
         |                       ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id ASC) AS rnk
         |  FROM e, q) t WHERE rnk <= 10),
         |truncarm AS (SELECT query_id, vec_id FROM (
         |  SELECT q.query_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.query_id
         |                       ORDER BY ${cosSql("e.v[1:16]", "q.qv[1:16]")} DESC, e.vec_id ASC) AS rnk
         |  FROM e, q) t WHERE rnk <= 10),
         |h AS (SELECT f.query_id, count(*)::BIGINT AS hits
         |      FROM fullarm f JOIN truncarm tr
         |        ON tr.query_id = f.query_id AND tr.vec_id = f.vec_id
         |      GROUP BY f.query_id)
         |SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |       round(coalesce(h.hits, 0) / 10.0, 6) AS recall
         |FROM q LEFT JOIN h ON h.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin,

    // mirrors EmbeddingStats.knnLabelAudit: anchors = vec_id % 7 = 0,
    // majority vote with (count DESC, label ASC) tie-break in both engines
    "knn_label_audit" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
         |      FROM e WHERE vec_id % 7 = 0),
         |scored AS (
         |  SELECT q.query_id, q.query_label, e.vec_id, e.label,
         |         ${cosSql("e.v", "q.qv")} AS score
         |  FROM e, q WHERE e.vec_id != q.query_id),
         |top AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored) t WHERE rnk <= 10),
         |votes AS (SELECT query_id, query_label, label, count(*)::BIGINT AS cnt
         |          FROM top GROUP BY query_id, query_label, label),
         |pred AS (SELECT query_label, CASE WHEN label = query_label THEN 1 ELSE 0 END AS ok
         |         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |                                            ORDER BY cnt DESC, label ASC) AS r
         |               FROM votes) t WHERE r = 1)
         |SELECT query_label AS label, count(*)::BIGINT AS n,
         |       CAST(sum(ok) AS BIGINT) AS correct,
         |       round(CAST(sum(ok) AS BIGINT) / count(*), 6) AS acc
         |FROM pred GROUP BY query_label
         |ORDER BY label""".stripMargin,

    // mirrors EmbeddingStats.retrievalEval: same rounded-score ranking,
    // binary label relevance, IDCG over min(label_n - 1, k)
    "retrieval_eval" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
         |      FROM e WHERE vec_id % 7 = 0),
         |lc AS (SELECT label AS query_label, count(*)::BIGINT AS label_n FROM e GROUP BY label),
         |scored AS (
         |  SELECT q.query_id, q.query_label, e.vec_id,
         |         CASE WHEN e.label = q.query_label THEN 1 ELSE 0 END AS rel,
         |         ${cosSql("e.v", "q.qv")} AS score
         |  FROM e, q WHERE e.vec_id != q.query_id),
         |top AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored) t WHERE rnk <= 10),
         |per AS (SELECT query_id, query_label,
         |  max(CASE WHEN rel = 1 THEN 1.0 / rnk ELSE 0.0 END) AS mrr,
         |  sum(CASE WHEN rel = 1 THEN 1.0 / log2(rnk + 1.0) ELSE 0.0 END) AS dcg
         |  FROM top GROUP BY query_id, query_label),
         |ideal AS (SELECT per.*,
         |  CASE WHEN least(lc.label_n - 1, 10) >= 1
         |    THEN list_sum(list_transform(range(1, least(lc.label_n - 1, 10) + 1),
         |                                 i -> 1.0 / log2(i + 1.0)))
         |    ELSE 0.0 END AS idcg
         |  FROM per JOIN lc USING (query_label))
         |SELECT query_label AS label, count(*)::BIGINT AS n_queries,
         |  round(avg(mrr), 6) AS mrr,
         |  round(avg(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END), 6) AS ndcg
         |FROM ideal GROUP BY query_label
         |ORDER BY label""".stripMargin,

    // mirrors Mining.hardNegatives: same rounded-score ranking + vec_id
    // tie-break in both arms
    "hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv FROM e WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, q.query_label, e.vec_id, e.label,
         |         ${cosSql("e.v", "q.qv")} AS score
         |  FROM e, q),
         |pos AS (SELECT query_id, vec_id AS pos_id, score AS pos_score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored WHERE label = query_label AND vec_id != query_id) t WHERE rnk = 1),
         |neg AS (SELECT query_id, vec_id AS neg_id, score AS neg_score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored WHERE label != query_label) t WHERE rnk = 1)
         |SELECT p.query_id, p.pos_id, p.pos_score, n.neg_id, n.neg_score,
         |       round(p.pos_score - n.neg_score, 6) AS margin
         |FROM pos p JOIN neg n ON n.query_id = p.query_id
         |ORDER BY p.query_id""".stripMargin,

    "ann_range" ->
      s"""$annProbeSql
         |SELECT vec_id, label, score FROM scored
         |WHERE score >= 0.2
         |ORDER BY score DESC, vec_id ASC""".stripMargin,

    // mirrors Centrality.similarityPageRank: exact kNN (k=5) cosine edges,
    // 5 unrolled PageRank steps (d=0.85, leaked-mass variant), per-step
    // 12-dp rounding — the cross-engine determinization grid
    "page_rank" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |sc AS (SELECT q.vec_id AS src, e.vec_id AS dst,
         |    ${cosSql("e.v", "q.qv")} AS score
         |  FROM e, (SELECT vec_id, v AS qv FROM e) q
         |  WHERE e.vec_id != q.vec_id),
         |ed AS MATERIALIZED (SELECT src, dst FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src
         |      ORDER BY score DESC, dst ASC) AS rnk FROM sc)
         |  WHERE rnk <= 5),
         |${pageRankTailSql(5)}""".stripMargin,

    // the ANN-edge variant: same PageRank tail over IVF-probed kNN edges —
    // the qcell/assigned CTEs are the ivf_recall contract with EVERY vector
    // as a query (seed centroids vec_id < 16, 6-dp probe ranking, raw
    // argmax assignment)
    "page_rank_ann" -> pageRankAnnSql,
    // the rung-picker twin below the literal threshold IS the flat ANN
    // edge build — same oracle verbatim
    "page_rank_ann_auto" -> pageRankAnnSql,

    // the two-level-quantizer variant: same PageRank tail over edges from
    // the hierarchical probe — coarse top-wCoarse (6-dp, ci asc) per src,
    // fine top-nProbe among the opened cells' children (6-dp, fcell asc),
    // candidates from the two-level assignment (the ivf2Ctes `af` CTE)
    "page_rank_ann2" -> pageRankAnn2Sql(),
    // the forced two-level rung at the derived params: same generator,
    // coarse window full-open (wCoarse = nCoarse = 4)
    "page_rank_ann_auto2" -> pageRankAnn2Sql(wCoarse = 4),

    "sim_join_topk" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, e.vec_id, e.label, ${cosSql("e.v", "q.qv")} AS score
         |  FROM e, q),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, label, score
         |FROM ranked WHERE rnk <= 5
         |ORDER BY query_id ASC, rnk ASC""".stripMargin,

    // brute-force ratio-margin mining (full probe ⇒ candidates = all
    // pairs): integer micro-unit cosines so the k-NN means are exact
    // integer sums; margin = one IEEE division over integer operands,
    // 6-dp rounded; mutual argmax with (margin desc, id asc) ties
    "bitext_mine" -> bitextMineSql,
    // the two-level candidate generator at FULL-OPEN settings is exact —
    // same brute-force margin oracle verbatim (the dedup_image_auto
    // shared-oracle device)
    "bitext_mine2" -> bitextMineSql,
    // rung-picker auto twins: the registered dial is full-open on both
    // rungs, so the brute-force oracle serves either side of the threshold
    "bitext_mine_auto" -> bitextMineSql,
    "bitext_mine_auto2" -> bitextMineSql,
    // incremental mining: the NEW src batch (hash bucket >= 50 of the even
    // half) against the stored odd-half target corpus, full probe ⇒ the
    // same brute-force margin SQL over the sliced src side; the indexed
    // twin must be byte-identical (stored assignment + pinned centroids)
    "bitext_mine_incremental" -> bitextMineIncrementalSql,
    "bitext_mine_incremental_indexed" -> bitextMineIncrementalSql,
    // the two-level incremental rung at full-open is exact — same
    // incremental brute-force oracle for the inline and indexed forms
    "bitext_mine_incremental2" -> bitextMineIncrementalSql,
    "bitext_mine_incremental_indexed2" -> bitextMineIncrementalSql,
    // stored-index rung picker: full-open on both rungs ⇒ exact candidates
    // ⇒ one brute-force incremental oracle serves both sides
    "bitext_mine_incr_indexed_auto" -> bitextMineIncrementalSql,
    "bitext_mine_incr_indexed_auto2" -> bitextMineIncrementalSql,

    // the forward-kNN pass of bitext_mine re-aggregated by target: hub
    // count = how many sources hold the target in their k-NN
    "bitext_hubness" -> bitextHubnessSql,
    // the two-level audit rung at full-open is exact — same brute-force
    // hub-count oracle verbatim
    "bitext_hubness2" -> bitextHubnessSql,
  )

  /** Brute-force hub-count oracle — shared verbatim by `bitext_hubness`
    * and the two-level rung `bitext_hubness2` (full-open ⇒ exact). */
  private def bitextHubnessSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |xs AS (SELECT vec_id AS src_id, v FROM e WHERE vec_id % 2 = 0),
       |ys AS (SELECT vec_id AS tgt_id, v FROM e WHERE vec_id % 2 = 1),
       |p AS (SELECT src_id, tgt_id,
       |        CAST(round((${cosRawSql("x.v", "y.v")}) * 1e6, 0) AS BIGINT) AS c6
       |      FROM xs x, ys y),
       |knn AS (SELECT src_id, tgt_id FROM (
       |    SELECT src_id, tgt_id,
       |      row_number() OVER (PARTITION BY src_id ORDER BY c6 DESC, tgt_id ASC) AS r
       |    FROM p) t WHERE r <= 4),
       |h AS (SELECT tgt_id, count(*) AS hub_count FROM knn GROUP BY tgt_id)
       |SELECT row_number() OVER (ORDER BY hub_count DESC, tgt_id ASC) AS rnk,
       |       tgt_id, hub_count
       |FROM h ORDER BY hub_count DESC, tgt_id ASC LIMIT 20""".stripMargin
}
