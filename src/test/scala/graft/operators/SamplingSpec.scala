package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Deterministic sampling: stability across evaluations, partition-count
  * independence, and split exhaustiveness/disjointness — the properties
  * that make hash-based selection safe for train/test hygiene.
  */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sample is identical across evaluations and repartitionings") {
    val docs = Tables.documents(spark, dir)
    val a = Sampling.sampleByPercent(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByPercent(docs.repartition(7), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("splits are exhaustive, disjoint, and roughly proportioned") {
    val docs = Tables.documents(spark, dir)
    val splits = docs.select(col("doc_id"), Sampling.splitColumn("doc_id").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(splits.length == docs.count())
    val bySplit = splits.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val n = splits.length.toDouble
    assert(bySplit("train") / n > 0.6, s"train fraction off: $bySplit")
    // growing the sample never reassigns a record (no train/test leakage)
    val small = Sampling.sampleByPercent(docs, "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleByPercent(docs, "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }
}
