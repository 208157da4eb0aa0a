package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The assembled pipeline is a pure composition — each column must equal
  * its standalone operator's verdict, and the split/shard columns must
  * respect the keep decision.
  */
class CurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curate: flags equal the standalone arms; split/shard respect kept") {
    val docs = Tables.documents(spark, dir)
    val out = Curate.pipeline(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)

    val gates = CorpusFilter.decisions(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val near = Dedup.resolveKeepers(docs, Dedup.ngramNear(docs)).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val deco = Decontaminate.contamination(docs).collect()
      .map(r => r.getLong(0) -> !r.getBoolean(4)).toMap
    val bucket = Sampling.hashBucket(col("doc_id"))
    val buckets = docs.select(col("doc_id"), bucket.as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    out.foreach { case (id, r) =>
      val (q, rep, pii, dd) = gates(id)
      assert((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)) == ((q, rep, pii, dd)))
      assert(r.getBoolean(5) == near(id))
      assert(r.getBoolean(6) == deco.getOrElse(id, true)) // val/bench vacuously clean
      val kept = q && rep && pii && dd && near(id) && deco.getOrElse(id, true)
      assert(r.getBoolean(7) == kept)
      if (!kept) assert(r.isNullAt(8) && r.isNullAt(9))
      else {
        val split = r.getString(8)
        val b = buckets(id)
        assert(split == (if (b < 80) "train" else if (b < 90) "val" else "bench"))
        assert((split == "train") == !r.isNullAt(9)) // shard iff kept train
      }
    }
    // shards over kept train docs equal the standalone assignment
    val keptTrain = out.collect {
      case (id, r) if r.getBoolean(7) && !r.isNullAt(9) => id -> r.getLong(9)
    }.toMap
    assert(keptTrain.nonEmpty)
    val expect = Sampling.tokenShards(
        docs.where(col("doc_id").isin(keptTrain.keys.toSeq: _*)), 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keptTrain == expect)
  }

  test("curate export: train shards + quarantine + dataset card materialize consistently") {
    val docs = Tables.documents(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-curate-").toString
    val decisions = Curate.export(spark, docs, path)
    val kept = decisions.where(col("kept")).count()
    val keptTrain = decisions
      .where(col("kept") && col("split") === "train").count()
    // the shard export carries exactly the kept train docs
    val shards = spark.read.json(s"$path/train")
    assert(shards.count() == keptTrain)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "train", "manifest.json")))
    // the quarantine holds every rejected doc with its gate attribution
    val quarantine = spark.read.parquet(s"$path/quarantine")
    assert(quarantine.count() == docs.count() - kept)
    assert(quarantine.columns.contains("quality_ok"))
    assert(quarantine.where(col("kept")).count() == 0)
    // the card aggregates the KEPT corpus only
    val card = spark.read.parquet(s"$path/card")
    assert(card.agg(sum(col("n_docs"))).head().getLong(0) == kept)
  }
}
