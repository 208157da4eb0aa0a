package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.core.{Embedders, GraftDatabase, GraftException}

/** Round-trip every supported storage format through executors. */
class CollectionIOSpec extends SparkSpec {

  import spark.implicits._

  private def freshDb(): GraftDatabase =
    GraftDatabase.make(spark, Files.createTempDirectory("graft-cio-").toString)

  private def seeded(): GraftDatabase = {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-8"))
    val f = Embedders.hashProjection(8)
    val rows = (1 to 25).map { i =>
      val id = f"r$i%03d"
      (id, "local/hash-8", s"blob $id with spaces, commas; and \"quotes\"".getBytes("UTF-8"),
        f(id.getBytes("UTF-8")).toSeq)
    }
    db.addRecords("c", rows.toDF("id", "embedderId", "blob", "embedding"))
    db
  }

  CollectionIO.Formats.toSeq.sorted.foreach { fmt =>
    test(s"round-trip through $fmt preserves ids, blobs, and embeddings exactly") {
      val src = seeded()
      val out = Files.createTempDirectory(s"graft-cio-$fmt-").toString + "/data"
      CollectionIO.exportCollection(src, "c", out, fmt)

      val dst = freshDb()
      dst.addCollection(dst.makeCollection("c", "local/hash-8"))
      CollectionIO.importCollection(dst, "c", out, fmt)

      val a = src.records("c").orderBy(col("id")).collect()
      val b = dst.records("c").orderBy(col("id")).collect()
      assert(b.length == a.length)
      a.zip(b).foreach { case (x, y) =>
        assert(x.getString(0) == y.getString(0))
        assert(x.getString(1) == y.getString(1))
        assert(x.getAs[Array[Byte]](2).toSeq == y.getAs[Array[Byte]](2).toSeq)
        assert(x.getSeq[Double](3) == y.getSeq[Double](3), s"embedding drift in $fmt")
      }
    }
  }

  test("unsupported format errors clearly") {
    val db = seeded()
    val e = intercept[GraftException] {
      CollectionIO.exportCollection(db, "c", "/tmp/unused", "avro")
    }
    assert(e.getMessage.contains("Unsupported collection format"))
  }
}
