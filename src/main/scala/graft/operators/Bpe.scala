package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction over the corpus — the
  * vocabulary-training step of an LLM data pipeline (Sennrich et al. 2016,
  * arXiv:1508.07909).
  *
  * The Spark shape is the paper's own optimization taken seriously at
  * warehouse scale: the corpus is touched ONCE (token explode → word-count
  * aggregation), and every merge step operates on the VOCABULARY-sized
  * weighted word table — pair statistics are one (a, b)-keyed aggregation
  * with map-side partials over a table bounded by corpus entropy, never by
  * corpus size, and the argmax transfers ONE row to the driver per step
  * (the [[Ann.trainCentroids]] bounded-driver-state contract: fixed step
  * count, no RNG, deterministic `(count DESC, pair ASC)` tie-break).
  *
  * Symbol sequences are double-space-joined strings (`"up" → "  u  p  "`),
  * which makes a merge ONE leftmost-non-overlapping `replace` of
  * `" a  b "` with `" ab "` — a single codegen'd string op per step whose
  * sequential-scan semantics are identical in the JVM and DuckDB (checked
  * on the overlap cases `a a a` → `[aa, a]` and `a b a b` → `[ab, ab]`,
  * and the prefix case `a | bc` which must NOT match), so the whole
  * training loop is reproducible bit-for-bit by the SQL oracle. Symbols
  * never contain spaces because words are whitespace tokens by
  * construction.
  */
object Bpe {

  private[graft] def symbolized(docs: DataFrame): DataFrame =
    TextAnalysis.lowerTok(docs)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("sym"),
        col("cnt"))

  private[graft] def pairCounts(syms: DataFrame): DataFrame =
    syms.select(col("cnt"),
        expr("filter(split(sym, '  '), x -> x != '')").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("cnt"), explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |         (a, b) -> named_struct('a', a, 'b', b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("pc"))

  /** Run the merge loop, hand `f` the learned merges and the final
    * symbolized table while its cache is live, release, and return `f`'s
    * result — which must therefore not reference the table lazily.
    *
    * Each step's word table is cached and EAGERLY materialized, then its
    * predecessor released — per-step cost stays flat (one replace over the
    * cached predecessor) instead of cumulative (step k re-applying k−1
    * replaces to the raw vocabulary). At 8 merges / 250k docs the win is
    * modest (72 s → 60 s: the per-step pair aggregation over the vocab
    * dominates, not the chain) but the chain gap is O(merges²) — at a
    * real vocabulary budget of thousands of merges it is the difference
    * between usable and not. */
  private def withTrained[T](docs: DataFrame, merges: Int)
      (f: (Seq[(Long, String, String, String, Long)], DataFrame) => T): T = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words0 = symbolized(docs).persist(level)
    var cur = words0
    try {
      val learned = Seq.newBuilder[(Long, String, String, String, Long)]
      var step = 1
      var dry = false
      while (step <= merges && !dry) {
        val top = pairCounts(cur)
          .orderBy(desc("pc"), asc("a"), asc("b")).limit(1).collect()
        if (top.isEmpty) dry = true // vocabulary fully merged — stop early
        else {
          val (a, b, pc) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          learned += ((step.toLong, a, b, a + b, pc))
          val next = cur.select(
            replace(col("sym"), lit(s" $a  $b "), lit(s" $a$b ")).as("sym"),
            col("cnt")).persist(level)
          next.queryExecution.toRdd.count() // fill from cur's cache, then drop it
          if (cur ne words0) cur.unpersist(false)
          cur = next
          step += 1
        }
      }
      f(learned.result(), cur)
    } finally {
      if (cur ne words0) cur.unpersist(false)
      words0.unpersist(false)
    }
  }

  /** Learned merge table: `(step, lhs, rhs, merged, pair_count)` — the
    * artifact a tokenizer ships, in merge order. `pair_count` is the
    * weighted occurrence count that won the step. */
  def train(docs: DataFrame, merges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withTrained(docs, merges) { (learned, _) =>
      learned.toDF("step", "lhs", "rhs", "merged", "pair_count")
        .orderBy(col("step"))
    }
  }

  /** Corpus fertility under the trained vocabulary: ONE row —
    * `(n_words, n_symbols, fertility)` where fertility = weighted mean
    * symbols per word occurrence after `merges` merges (chars per word
    * before any merge; 1.0 when every word collapses to a single token).
    * The number a tokenizer team tracks per language/domain slice. */
  def fertility(docs: DataFrame, merges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withTrained(docs, merges) { (_, syms) =>
      val Array(row) = syms.select(col("cnt"),
          size(expr("filter(split(sym, '  '), x -> x != '')")).cast("bigint")
            .as("ns"))
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("ns")).as("n_symbols"))
        .collect() // one row, materialized while the loop cache is live
      // empty corpus: both sums are NULL — report zeros, not an NPE
      val (nw, ns) =
        if (row.isNullAt(0)) (0L, 0L) else (row.getLong(0), row.getLong(1))
      Seq((nw, ns)).toDF("n_words", "n_symbols")
        .select(col("n_words"), col("n_symbols"),
          when(col("n_words") === 0, lit(0.0))
            .otherwise(round(col("n_symbols").cast("double") / col("n_words"), 6))
            .as("fertility"))
    }
  }

  /** Segment the corpus with an already-learned merge list (the `train`
    * output's `(lhs, rhs)` pairs, in order): per document, the token count
    * under the BPE vocabulary — the budget that sequence packing
    * ([[Sampling.packSequences]]) consumes. The merge list folds into ONE
    * narrow replace chain, so segmentation is a pure codegen'd map over
    * the corpus — no joins, no driver state beyond the merges. */
  def segmentCounts(docs: DataFrame,
                    merges: Seq[(String, String)]): DataFrame = {
    val sym0: Column = concat(lit("  "),
      regexp_replace(col("w"), "(.)", "$1  "))
    val folded = merges.foldLeft(sym0) { case (c, (a, b)) =>
      replace(c, lit(s" $a  $b "), lit(s" $a$b "))
    }
    val nSyms = size(filter(split(folded, "  "), x => x =!= lit("")))
    val per = TextAnalysis.lowerTok(docs)
      .select(col("doc_id"), nSyms.cast("bigint").as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("bigint").as("bpe_tokens"))
    // tokenless documents have a 0 budget, not a missing row — the same
    // restore contract as every per-doc operator here
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }
}
