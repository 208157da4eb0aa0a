package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make `cosine_sim` available to pure-SQL
  * sessions (the spark.sql.extensions deployment path).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** getOrCreate reuses the default session (ignoring new extensions), so
    * build a fresh SparkSession over the shared context and restore the
    * previous default afterwards. */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
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

  test("withExtensions injects cosine_sim into the session function registry") {
    withExtendedSession { spark =>
      val r = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head()
      assert(math.abs(r.getDouble(0)) < 1e-12)
      val self = spark.sql(
        "SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c").head()
      assert(math.abs(self.getDouble(0) - 1.0) < 1e-12)
    }
  }

  test("withExtensions injects jaccard_sim, with element-type validation") {
    withExtendedSession { spark =>
      val r = spark.sql(
        "SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j").head()
      assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
      val e = intercept[Exception] {
        spark.sql("SELECT jaccard_sim(array('a'), array(1.5d))").collect()
      }
      assert(e.getMessage.contains("jaccard_sim") || e.getMessage.contains("DATATYPE"))
    }
  }

  test("withExtensions injects hash56, matching the library fingerprint") {
    withExtendedSession { spark =>
      val viaSql = spark.sql("SELECT hash56('hello') AS h").head().getLong(0)
      // first 14 hex digits of md5('hello') as an integer
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("hello".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(viaSql == java.lang.Long.parseLong(hex.substring(0, 14), 16))
    }
  }

  test("hash56 of a numeric digests its decimal string, not its binary encoding") {
    withExtendedSession { spark =>
      val viaSqlNum = spark.sql("SELECT hash56(42) AS h").head().getLong(0)
      val viaSqlStr = spark.sql("SELECT hash56('42') AS h").head().getLong(0)
      assert(viaSqlNum == viaSqlStr)
      // and both agree with the DataFrame-side bucket hash path
      import spark.implicits._
      val viaDf = Seq(42L).toDF("id")
        .select(graft.functions.LshFunctions.hash56($"id".cast("string")))
        .head().getLong(0)
      assert(viaSqlNum == viaDf)
    }
  }

  test("wrong arity through the extension is an analysis error") {
    withExtendedSession { spark =>
      val e = intercept[Exception] { spark.sql("SELECT cosine_sim(array(1.0d))").collect() }
      assert(!e.isInstanceOf[IndexOutOfBoundsException])
    }
  }
}
