package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located-join contract of [[CollectionIO.writeBucketed]]: joining
  * two tables bucketed by the same key into the same bucket count must not
  * shuffle either side — the exchange was paid once at write time.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two same-bucketed tables plans with no Exchange") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("graft-bucket-a-").toString
    val dirB = Files.createTempDirectory("graft-bucket-b-").toString
    val a = (1L to 1000L).map(i => (i, s"left-$i")).toDF("id", "payload")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "score")
    CollectionIO.writeBucketed(a, "graft_bucketed_a", dirA, "id", 8)
    CollectionIO.writeBucketed(b, "graft_bucketed_b", dirB, "id", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
      // sanity: the same join over plain (non-bucketed) data DOES shuffle
      val plain = a.join(b, "id").queryExecution.executedPlan.toString
      assert(plain.contains("Exchange"), plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
