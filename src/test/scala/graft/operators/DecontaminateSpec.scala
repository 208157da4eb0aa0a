package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Train/eval contamination check: a train document sharing text with an
  * eval-split document must be flagged, clean and sub-shingle-length
  * documents must report ratio 0.0 (never NULL), and the eval set must be
  * the broadcast side of the join (the train corpus never shuffles).
  */
class DecontaminateSpec extends SparkSpec {

  // ids land in buckets by md5; probe for one train-split id (<80) and one
  // eval-split id (>=90) instead of hard-coding magic numbers
  private lazy val bucketOf: Map[Long, Int] = {
    import spark.implicits._
    (0L until 50L).toDF("id")
      .select(col("id"), Sampling.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
  }

  test("duplicated eval text is flagged; unique and short texts are clean") {
    import spark.implicits._
    val trainId = bucketOf.collectFirst { case (id, b) if b < 80 => id }.get
    val cleanId = bucketOf.collectFirst { case (id, b) if b < 80 && id != trainId => id }.get
    val shortId = bucketOf.collectFirst { case (id, b) if b < 80 && id != trainId && id != cleanId => id }.get
    val benchId = bucketOf.collectFirst { case (id, b) if b >= 90 => id }.get

    val leaked = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (trainId, leaked),                                   // verbatim eval dup
      (cleanId, "completely different words with no overlap whatsoever here"),
      (shortId, "too few tokens"),                         // < n tokens: no shingles
      (benchId, leaked)
    ).toDF("doc_id", "text")

    val out = Decontaminate.contamination(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

    assert(out.keySet == Set(trainId, cleanId, shortId)) // train split only
    val (nSh, nHit, ratio, flag) = out(trainId)
    assert(nSh > 0 && nHit == nSh && ratio == 1.0 && flag)
    assert(out(cleanId) == ((out(cleanId)._1, 0L, 0.0, false)))
    assert(out(shortId) == ((0L, 0L, 0.0, false)))
  }

  test("semantic: an eval-identical train vector is flagged, an orthogonal one is clean") {
    import spark.implicits._
    val trainId = bucketOf.collectFirst { case (id, b) if b < 80 => id }.get
    val cleanId = bucketOf.collectFirst { case (id, b) if b < 80 && id != trainId => id }.get
    val benchId = bucketOf.collectFirst { case (id, b) if b >= 90 => id }.get

    val v = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val orth = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val embeds = Seq((trainId, v), (cleanId, orth), (benchId, v))
      .toDF("vec_id", "embedding")

    val out = Decontaminate.semanticContamination(embeds)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(trainId, cleanId)) // train split only
    assert(out(trainId) == ((1.0, true)))      // paraphrase-identical: max cos 1.0
    assert(out(cleanId) == ((0.0, false)))     // orthogonal: clean
  }

  test("semantic: an empty eval bucket reports every train vector clean, not an empty audit") {
    import spark.implicits._
    val trainIds = bucketOf.collect { case (id, b) if b < 80 => id }.take(3).toSeq
    val embeds = trainIds.map(id => (id, Array(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "embedding") // no vec hashes into bucket >= 90
    val out = Decontaminate.semanticContamination(embeds)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.map(_._1).toSet == trainIds.toSet)
    assert(out.forall(r => r._2 == 0.0 && !r._3))
  }

  test("semantic: eval vectors are the broadcast side (train corpus never shuffles pre-agg)") {
    import spark.implicits._
    val embeds = (0L until 40L).map(i => (i, Array.fill(4)(i.toFloat + 1)))
      .toDF("vec_id", "embedding")
    val plan = Decontaminate.semanticContamination(embeds)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected broadcast NL join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("eval shingle set is broadcast; train side joins without shuffling") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"tok$i a b c d e f g")).toDF("doc_id", "text")
    val plan = Decontaminate.contamination(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
