package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.LshFunctions
import graft.functions.VectorFunctions.cosine_sim

/** Benchmark decontamination — the train/eval n-gram overlap check every
  * LLM training pipeline runs before a corpus ships (an eval example whose
  * n-grams appear in the training set silently inflates benchmark scores).
  *
  * The eval side is the deterministic hash-test split ([[Sampling]]'s
  * bucket ≥ benchFromPct), so the check is self-contained over one corpus
  * and reproducible across engines/runs; swapping in an external benchmark
  * table changes nothing structurally.
  *
  * Scale shape: eval benchmarks are MBs while the train corpus is the
  * 100 TB side, so the distinct eval shingle-hash set is broadcast — the
  * train side streams through a broadcast hash join with NO shuffle of
  * train data; the only shuffle is the per-document hit aggregation
  * (keyed by doc_id, map-side combined). Shingles ride the fused
  * [[graft.functions.WordShingleHash56]] (one md5 per n-gram, digested in
  * place from the text bytes).
  */
object Decontaminate {

  /** Per-train-document contamination report: how many of the document's
    * distinct word `n`-gram shingles also occur anywhere in the eval
    * split, as a count, a ratio, and a flag.
    *
    * Documents with fewer than `n` tokens have no shingles and report
    * ratio 0.0 (never NULL) — vacuously clean, kept in the output so the
    * report covers the full train split.
    */
  def contamination(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 5,
                    trainPct: Int = 80, benchFromPct: Int = 90): DataFrame =
    contaminationAgainst(docs,
      docs.where(Sampling.hashBucket(col(idCol)) >= benchFromPct),
      idCol, textCol, n, trainPct)

  /** [[contamination]] with an EXPLICIT eval corpus: the train slice of
    * `docs` (id-hash bucket < trainPct) is checked against the distinct
    * shingles of `evalDocs` — the form a STREAMING pipeline needs, where
    * the benchmark suite is a fixed reference rather than a slice of the
    * (unbounded) stream, and the form [[contamination]] itself reduces to
    * with `evalDocs` = its own bench slice. */
  def contaminationAgainst(docs: DataFrame, evalDocs: DataFrame,
                           idCol: String = "doc_id", textCol: String = "text",
                           n: Int = 5, trainPct: Int = 80): DataFrame = {
    val hs = docs.select(
      col(idCol).as("doc_id"),
      Sampling.hashBucket(col(idCol)).as("bucket"),
      LshFunctions.word_shingle_hash56(col(textCol), n).as("hs"))

    val bench = evalDocs
      .select(explode_outer(LshFunctions.word_shingle_hash56(col(textCol), n)).as("g"))
      .where(col("g").isNotNull).distinct()

    val train = hs.where(col("bucket") < trainPct)

    // hs is already distinct per document, so one joined row = one
    // distinct contaminated shingle
    val hits = train
      .select(col("doc_id"), explode_outer(col("hs")).as("g"))
      .where(col("g").isNotNull)
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))

    train
      .select(col("doc_id"), size(col("hs")).cast("bigint").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(when(col("n_shingles") > 0,
          coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_shingles"))
          .otherwise(lit(0.0)), 6).as("contamination"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Semantic (embedding-space) decontamination — the complement of the
    * shingle check above: an eval example paraphrased into the training set
    * shares no n-grams, but still sits next to it in embedding space (the
    * check GPT-4/Llama-style data cards report alongside n-gram overlap).
    * For each train-split vector, the max cosine against ANY eval-split
    * vector; contaminated when it clears `tau`. Splits are the same
    * deterministic id-hash buckets as [[contamination]].
    *
    * Scale shape: identical reasoning to the shingle check — eval
    * benchmarks are MBs while train is the 100 TB side, so the eval
    * vectors broadcast and the train corpus streams through a broadcast
    * nested-loop with NO shuffle of train data; the only shuffle is the
    * per-vector max aggregation (keyed on vec_id, map-side combined).
    * The residual O(train·eval·d) compute is the exact-audit price;
    * [[Ann]]'s bucketed probes are the pre-filter once the eval side
    * outgrows a broadcast.
    */
  def semanticContamination(embeds: DataFrame, tau: Double = 0.35,
                            trainPct: Int = 80, benchFromPct: Int = 90): DataFrame = {
    val b = embeds.select(col("vec_id"), col("embedding"),
      Sampling.hashBucket(col("vec_id")).as("bucket"))
    val bench = b.where(col("bucket") >= benchFromPct)
      .select(col("embedding").as("bench_vec"))
    val train = b.where(col("bucket") < trainPct)

    // LEFT outer against the broadcast eval side (join condition `true` =
    // a train-row-preserving cross join): an EMPTY eval bucket must
    // report every train vector as clean (max_sim 0.0), never an empty
    // audit — an empty report is indistinguishable from "no train data"
    // to a gating pipeline. With a non-empty bench this is the exact
    // same broadcast nested loop + one max aggregation as an inner cross
    // join — no second join, no extra exchange.
    train.join(broadcast(bench), lit(true), "left")
      .select(col("vec_id"),
        coalesce(round(cosine_sim(col("embedding"), col("bench_vec")), 6), lit(0.0))
          .as("sc"))
      .groupBy(col("vec_id"))
      .agg(max(col("sc")).as("max_sim"))
      .select(col("vec_id"), col("max_sim"),
        (col("max_sim") >= tau).as("contaminated"))
      .orderBy(col("vec_id"))
  }
}
