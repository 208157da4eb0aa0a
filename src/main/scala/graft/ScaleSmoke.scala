package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured scale-up evidence for the flagship operators.
  *
  * Replicates the sf embedding corpus `factor`× (ids re-keyed, vectors
  * perturbed per replica so near-dup structure survives but exact-dup
  * collapse doesn't trivialize the work) into a MULTI-FILE parquet table
  * — restoring the split-count parallelism the single-file testdata
  * lacks — then times exact top-k, LSH probe, IVF probe, and SimHash
  * near-dup candidate generation at the inflated size. The point is the
  * SHAPE of the growth: per-row cost must stay flat (linear total) and
  * no operator may degenerate to a single task or an all-pairs join.
  *
  * Usage: runMain graft.ScaleSmoke [factor] [sfDir]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(500)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val big = s"${sys.props("java.io.tmpdir")}/graft-scale-$dirHash-$factor"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(big, "_SUCCESS"))) {
      val base = Tables.embeddings(spark, dir)
      val n = base.count()
      base
        .crossJoin(spark.range(factor).toDF("rep"))
        .select(
          (col("vec_id") + col("rep") * n).as("vec_id"),
          // perturb one component per replica: vectors stay near their
          // original (near-dup structure intact) without being identical
          expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN x + rep * 1e-9 ELSE x END)")
            .as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(big)
    }

    val e = spark.read.parquet(big)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"## $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    println(s"## corpus: ${e.count()} vectors x 64 dims, " +
      s"${e.rdd.getNumPartitions} scan partitions")

    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY").map(_.split(",").toSet)
    def stage(label: String)(f: => Long): Unit =
      if (only.forall(_.exists(label.startsWith))) time(label)(f)

    val qv = Similarity.queryVector(spark, dir, 0L)
    import graft.functions.VectorFunctions.cosine_sim
    stage("exact top-k") {
      e.select(col("vec_id"), round(cosine_sim(col("embedding"), typedLit(qv)), 6).as("s"))
        .orderBy(desc("s"), asc("vec_id")).limit(10)
        .queryExecution.toRdd.count()
    }
    stage("batch sim join (8q)") {
      Similarity.similarityJoin(e,
        e.where(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
        k = 5).queryExecution.toRdd.count()
    }
    // centroid lookup hoisted out of the timed block — it is a separate
    // driver-side point scan, not the operator under measurement
    val cents = Tables.embeddings(spark, dir).where(col("vec_id") < 16)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    stage("ivf cell assignment") {
      graft.operators.Ann.assignCells(e, cents)
        .groupBy(col("cell")).agg(count(lit(1)))
        .queryExecution.toRdd.count()
    }
    stage("pq adc top-k") {
      import org.apache.spark.sql.graft.Bridge
      val dsub = 8
      val cb = (0 until 8).map(s => cents.map(_.slice(s * dsub, (s + 1) * dsub)))
      e.select(col("vec_id"),
          round(cosine_sim(Bridge.column(graft.functions.PqReconstruct(
            Bridge.expression(col("embedding").cast("array<double>")), cb)),
            typedLit(qv)), 6).as("s"))
        .orderBy(desc("s"), asc("vec_id")).limit(10)
        .queryExecution.toRdd.count()
    }
    stage("hard negatives (8a)") {
      graft.operators.Mining.hardNegatives(e, 8)
        .queryExecution.toRdd.count()
    }
    stage("knn label audit (16a)") {
      // fixed ~16-anchor budget regardless of corpus size — the production
      // posture: the audit samples a constant anchor count, so its cost is
      // one corpus scan (scored pairs = anchors × corpus, not a fraction²)
      // Long end-to-end: a .toInt here goes negative past ~34B rows and
      // pmod then selects wrong/no anchors — the exact regime this smoke
      // test exists to model.
      val anchorMod = math.max(1L, e.count() / 16L)
      graft.operators.EmbeddingStats.knnLabelAudit(e, k = 10, anchorMod = anchorMod)
        .queryExecution.toRdd.count()
    }
    stage("simhash candidates") {
      import graft.functions.LshFunctions
      val withBits = e.select(col("vec_id"),
        LshFunctions.simhash_bits(col("embedding"), 24, 64).as("bs"))
      withBits.select(col("vec_id"),
          posexplode(LshFunctions.band_keys(col("bs"), 3, 8)).as(Seq("band", "key")))
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
        .queryExecution.toRdd.count()
    }

    // Round-7 incremental-dedup family: replicate the documents table
    // (ids re-keyed, texts salted with the replica id so exact dups don't
    // trivialize the shingling while near-dup structure survives) and run
    // the batch-vs-reference-index paths at the inflated size. factor/10
    // keeps the text volume comparable to the embedding corpus above.
    val docFactor = math.max(1, factor / 10)
    val bigDocs = s"${sys.props("java.io.tmpdir")}/graft-scale-docs-$dirHash-$docFactor"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(bigDocs, "_SUCCESS"))) {
      val base = Tables.documents(spark, dir)
      val n = base.count()
      base.crossJoin(spark.range(docFactor).toDF("rep"))
        .select((col("doc_id") + col("rep") * n).as("doc_id"),
          concat(col("text"), lit(" r"), col("rep")).as("text"))
        .repartition(32)
        .write.mode("overwrite").parquet(bigDocs)
    }
    val docs = spark.read.parquet(bigDocs)
    val half = docs.count() / 2
    stage("incr exact dedup") {
      graft.operators.Dedup.exactIncremental(
          docs.where(col("doc_id") >= half), docs.where(col("doc_id") < half))
        .queryExecution.toRdd.count()
    }
    stage("incr near dedup") {
      graft.operators.Dedup.ngramNearIncremental(
          docs.where(col("doc_id") >= half), docs.where(col("doc_id") < half))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }

  private val Similarity = graft.operators.Similarity
}
