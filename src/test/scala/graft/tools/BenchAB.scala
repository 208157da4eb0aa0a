package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only A/B bench harness — the generalization of [[ProfileNearInc]]
  * the round-10 verdict asked for. Runs any named `SparkEntry.queries`
  * entries in ISOLATION (own session, own warmup) with a stage-level
  * listener, so a suspicious full-suite median can be adjudicated in
  * minutes instead of a verdict cycle.
  *
  * Usage (current tree):
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.tools.BenchAB retrieval_eval,salted_priority_revenue [repeats]"
  *
  * Commit-vs-commit protocol (PLANS.md "bench A/B protocol"):
  *   git worktree add /tmp/ab_<sha> <sha>
  *   (cp this file into the worktree if the old commit predates it)
  *   run the SAME command in both trees, identical env, and diff the
  *   medians + top-stage tables. A real regression shows up as a stage
  *   whose executorRunTime moved; context noise shows up as matching
  *   stage profiles with wall-clock spread inside max/median.
  *
  * Not part of the shipped surface — lives in the test tree.
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchAB <query,query,...> [repeats]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val repeats = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    // per-stage (id, name, executorRunTime ms, jvmGCTime ms, cpu ns, tasks)
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime,
            si.taskMetrics.executorCpuTime, si.numTasks))
        }
      }
    })

    // same warmup discipline as graft.Bench (JVM, parquet, codegen, shuffle)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("sum(crc32(cast(vec_id as string)))").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").groupBy("lang").count().collect()
    graft.SparkEntry.prepareShared(spark, sfDir)
    System.gc()

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      println(s"\n==== $name (repeats=$repeats, cpus=$cpus, sf=$sfDir) ====")
      val walls = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 1 to repeats) {
        System.gc()
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        walls += wall
        val (run, gc, cpu) = stages.synchronized(
          (stages.map(_._3).sum, stages.map(_._4).sum, stages.map(_._5).sum))
        // cpu vs run separates real work from task-wall inflation by
        // co-resident threads (the round-13 curate adjudication lesson)
        println(f"  run $i: rows=$n wall=$wall%.2f s executorRun=${run / 1000.0}%.2f s cpu=${cpu / 1e9}%.2f s gc=${gc / 1000.0}%.2f s")
        if (i == repeats) stages.synchronized {
          stages.sortBy(-_._3).take(10).foreach { case (id, nm, r, g, c, t) =>
            println(f"    stage $id%5d $nm%-60s run=${r / 1000.0}%8.2f s cpu=${c / 1e9}%6.2f s gc=${g / 1000.0}%6.2f s tasks=$t%4d")
          }
        }
      }
      val sorted = walls.sorted
      val median = sorted(sorted.length / 2)
      println(f"  median=$median%.2f s  min=${sorted.head}%.2f  max=${sorted.last}%.2f  max/median=${sorted.last / median}%.2f")
      println("  -- executedPlan head --")
      println(fn(spark, sfDir).queryExecution.executedPlan.toString.linesIterator
        .take(30).mkString("\n"))
    }
    spark.stop()
  }
}
