package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only diagnosis for the round-16 curate adjudication: run every
  * suite query alphabetically before `curate` (the driver bench's order),
  * then compile `curate`'s physical plan in that contaminated session and
  * report whether the CacheManager substituted InMemoryRelations into it —
  * distinguishing plan-substitution from plain storage-memory pressure.
  * Not part of the shipped surface.
  */
object DiagnoseCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.prepareShared(spark, sfDir)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != "curate")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"  [$n FAILED: ${e.getMessage.take(80)}]") }
    }
    println(s"ran ${names.size} predecessor queries")
    println(s"cacheManager empty: ${spark.sharedState.cacheManager.isEmpty}")
    // suite-context stage profile of curate itself, 3 repeats — if the
    // shingle/join stages appear with multiplied run time vs the isolated
    // BenchAB table, the mine is re-executing per consumer (exchange
    // reuse lost); if a stage NOT in curate's plan completes here, the
    // cost is zombie work from predecessors
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages += ((sc.stageInfo.stageId,
            sc.stageInfo.name.takeWhile(_ != '\n').take(60),
            sc.stageInfo.taskMetrics.executorRunTime,
            sc.stageInfo.taskMetrics.executorCpuTime / 1000000L))
        }
    })
    for (i <- 1 to 3) {
      System.gc()
      org.apache.spark.graft.CoreBridge.flushListenerBus(spark.sparkContext)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val qe = graft.SparkEntry.queries("curate")(spark, sfDir).queryExecution
      qe.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.CoreBridge.flushListenerBus(spark.sparkContext)
      val (r, c) = stages.synchronized((stages.map(_._3).sum, stages.map(_._4).sum))
      println(f"curate run $i: wall=$wall%.2f run=${r / 1000.0}%.1f cpu=${c / 1000.0}%.1f nStages=${stages.size}")
      stages.synchronized(stages.sortBy(-_._3).take(12).foreach { case (id, nm, rr, cc) =>
        println(f"    stage $id%6d run=${rr / 1000.0}%7.2f cpu=${cc / 1000.0}%6.2f  $nm")
      })
      if (i == 3) {
        val plan = qe.executedPlan.toString
        println(s"  final plan: ReusedExchange=${"ReusedExchange".r.findAllIn(plan).size} " +
          s"InMemory=${plan.linesIterator.count(_.contains("InMemoryTableScan"))} " +
          s"Exchange=${"(?<!Reused)Exchange".r.findAllIn(plan).size}")
      }
    }
    // storage snapshot: what the block manager is holding by now
    val st = spark.sparkContext.getRDDStorageInfo
    println(s"persisted RDDs: ${st.length}, memSize=${st.map(_.memSize).sum / 1048576} MB, diskSize=${st.map(_.diskSize).sum / 1048576} MB")
    st.sortBy(-_.memSize).take(10).foreach(i =>
      println(f"  rdd ${i.id}%5d mem=${i.memSize / 1048576}%6d MB disk=${i.diskSize / 1048576}%5d MB ${i.name.toString.take(90)}"))
    spark.stop()
  }
}
