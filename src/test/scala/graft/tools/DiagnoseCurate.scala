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
    val plan = graft.SparkEntry.queries("curate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val imrs = plan.linesIterator.filter(l =>
      l.contains("InMemoryTableScan") || l.contains("InMemoryRelation")).toSeq
    println(s"curate plan InMemory lines: ${imrs.size}")
    imrs.take(12).foreach(l => println("  " + l.trim.take(160)))
    // storage snapshot: what the block manager is holding by now
    val st = spark.sparkContext.getRDDStorageInfo
    println(s"persisted RDDs: ${st.length}, memSize=${st.map(_.memSize).sum / 1048576} MB, diskSize=${st.map(_.diskSize).sum / 1048576} MB")
    st.sortBy(-_.memSize).take(10).foreach(i =>
      println(f"  rdd ${i.id}%5d mem=${i.memSize / 1048576}%6d MB disk=${i.diskSize / 1048576}%5d MB ${i.name.toString.take(90)}"))
    spark.stop()
  }
}
