package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for one or all SparkEntry
  * queries. Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (name == "all") SparkEntry.queries
      else SparkEntry.queries.filter(_._1 == name)
    targets.foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
