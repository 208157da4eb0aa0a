package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.core.Tables
import graft.operators.{Dedup, Sampling}

/** Dev-only stage profiler for the inline near-incremental dedup path.
  * Not part of the shipped surface — run via Test/runMain. */
object ProfileNearInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = if (args.nonEmpty) args(0) else "ngram"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime, si.numTasks))
      }
    })
    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").groupBy("lang").count().collect()

    def query() = {
      val d = Tables.documents(spark, sfDir)
      val bucket = Sampling.hashBucket(col("doc_id"))
      which match {
        case "lmbigram" => graft.operators.TextAnalysis.lmCrossEntropyBigram(d)
        case "qc"       => graft.operators.TextAnalysis.qualityClassifier(d)
        case "ngram"   => Dedup.ngramNearIncremental(d.where(bucket >= 50), d.where(bucket < 50))
        case "minhash" => Dedup.minhashNearIncremental(d.where(bucket >= 50), d.where(bucket < 50))
        case "indexed" => Dedup.ngramNearIncrementalIndexed(spark, sfDir, d.where(bucket >= 50))
        case "mine"    => Dedup.ngramNear(d)
        case "minemh"  => Dedup.minhashNear(d)
        case "spans"   => Dedup.spanDedup(d)
      }
    }
    for (i <- 1 to 2) {
      stages.clear()
      val t0 = System.nanoTime()
      val n = query().queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== run $i: rows=$n wall=$wall%.2f s ==")
      stages.sortBy(-_._3).take(12).foreach { case (id, name, run, gc, tasks) =>
        println(f"  stage $id%4d $name%-60s run=${run / 1000.0}%8.2f s gc=${gc / 1000.0}%6.2f s tasks=$tasks%4d")
      }
    }
    println(query().queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
