package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions
import graft.functions.VectorFunctions.cosine_sim

/** The opt-in LSH similarity-join rewrite: disabled it must not touch the
  * plan; enabled it must replace the cartesian candidate space with a
  * banded equi-join while re-applying the exact predicate (precision 1 by
  * construction; identical vectors share all bands, so exact-duplicate
  * recall is 1 as well).
  */
class RewriteSimilarityJoinSpec extends AnyFunSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try f(spark)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }

  /** 4-dim corpus: ids 1/2 identical, 3 close to them, 4 orthogonal. */
  private def corpus(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val a = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0, 0.0)),
      (3L, Seq(0.9, 0.1, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("a_id", "va")
    val b = Seq(
      (11L, Seq(1.0, 0.0, 0.0, 0.0)),
      (14L, Seq(0.0, 0.0, 0.9, 0.1))).toDF("b_id", "vb")
    (a, b)
  }

  private def simJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.crossJoin(b).where(cosine_sim(col("va"), col("vb")) >= lit(0.9))
      .select(col("a_id"), col("b_id"))

  test("disabled (default): plan keeps the brute-force join, no Generate") {
    withExtendedSession { spark =>
      val (a, b) = corpus(spark)
      val plan = simJoin(a, b).queryExecution.optimizedPlan.toString
      assert(!plan.contains("Generate"), plan)
    }
  }

  test("enabled: banded equi-join plan — no cartesian, exact predicate kept") {
    withExtendedSession { spark =>
      spark.conf.set("spark.graft.similarityJoin.rewrite", "true")
      spark.conf.set("spark.graft.similarityJoin.dim", "4")
      val (a, b) = corpus(spark)
      val df = simJoin(a, b)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Generate"), s"rewrite did not fire:\n$optimized")
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct") &&
        !physical.contains("BroadcastNestedLoopJoin"),
        s"still a brute-force join:\n$physical")

      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // identical vectors always collide in every band: (1,11), (2,11)
      assert(got.contains((1L, 11L)) && got.contains((2L, 11L)))
      // every surviving pair truly satisfies the exact predicate
      // (4-dim brute force is tiny, compute directly)
      def cos(x: Seq[Double], y: Seq[Double]): Double = {
        val dot = x.zip(y).map(p => p._1 * p._2).sum
        dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      }
      val va = Map(1L -> Seq(1.0, 0.0, 0.0, 0.0), 2L -> Seq(1.0, 0.0, 0.0, 0.0),
        3L -> Seq(0.9, 0.1, 0.0, 0.0), 4L -> Seq(0.0, 0.0, 1.0, 0.0))
      val vb = Map(11L -> Seq(1.0, 0.0, 0.0, 0.0), 14L -> Seq(0.0, 0.0, 0.9, 0.1))
      got.foreach { case (ai, bi) => assert(cos(va(ai), vb(bi)) >= 0.9) }
      // pairs from the brute-force result that the LSH candidates keep must
      // be a subset relationship the other way: rewrite ⊆ brute force
      spark.conf.set("spark.graft.similarityJoin.rewrite", "false")
      val brute = simJoin(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(brute))
    }
  }

  test("64-dim corpus: rewrite result is a non-empty subset of brute force") {
    withExtendedSession { spark =>
      val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
      // τ=0.4: the corpus's max pairwise cosine is ~0.479 (no exact dups),
      // so this threshold yields a real (66-pair) brute-force result
      def simJoin64 = a.crossJoin(b)
        .where(cosine_sim(col("va"), col("vb")) >= lit(0.4) &&
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))

      val brute = simJoin64.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set("spark.graft.similarityJoin.rewrite", "true")
      spark.conf.set("spark.graft.similarityJoin.dim", "64")
      val rewritten = simJoin64
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire on the 64-dim corpus:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set("spark.graft.similarityJoin.rewrite", "false")

      assert(got.subsetOf(brute), s"rewrite invented pairs: ${got -- brute}")
      // structural guarantee: EXACTLY identical vectors share every band
      // (cosine 0.999 alone does not force identical sign patterns —
      // recall on merely-close pairs is the documented banding tradeoff)
      val identical = a.join(b, col("va") === col("vb"))
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(identical.subsetOf(got),
        s"missed identical-vector pairs: ${identical -- got}")
      assert(got.nonEmpty)
    }
  }

  test("join with an explicit condition is left untouched") {
    withExtendedSession { spark =>
      spark.conf.set("spark.graft.similarityJoin.rewrite", "true")
      spark.conf.set("spark.graft.similarityJoin.dim", "4")
      val (a, b) = corpus(spark)
      val keyed = a.join(b, col("a_id") === col("b_id") - 10)
        .where(cosine_sim(col("va"), col("vb")) >= lit(0.9))
      val plan = keyed.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Generate"), plan)
      assert(keyed.count() == 2) // (1,11) cos 1.0; (4,14) cos ≈ 0.994
    }
  }
}
