package graft.io

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{Embedders, GraftDatabase, Record}

/** Golden-format JSON persistence parity, pinned to the exact byte strings
  * from the reference's own tests
  * (`/root/reference/records/records_test.go:33`,
  * `/root/reference/database/database_test.go:79`).
  */
class JsonCompatSpec extends SparkSpec {

  Embedders.register("embedder", _ => Array(1.0))
  Embedders.register("mock-embed", _ => Array(1.0, 2.0, 3.0, 4.0, 5.0))

  private def freshDb(): GraftDatabase =
    GraftDatabase.make(spark, Files.createTempDirectory("graft-json-").toString)

  test("record marshal matches the golden string (records_test.go:33)") {
    val r = Record("record-id", "embedder", "blob".getBytes("UTF-8"), Array(1.0))
    assert(JsonCompat.recordToJson(r) ==
      """{"blob":"blob","embedding":[1],"embedderId":"embedder","id":"record-id"}""")
  }

  test("database marshal matches the golden string (database_test.go:79)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("test-collection-id", "mock-embed"))
    db.addRecord("test-collection-id",
      Record("test-record-id", "mock-embed", "blob".getBytes("UTF-8"),
        Array(1.0, 2.0, 3.0, 4.0, 5.0)))
    assert(JsonCompat.databaseToJson(db) ==
      """{"collections":{"test-collection-id":{"id":"test-collection-id","embedderId":"mock-embed","embeddings":{"test-record-id":{"blob":"blob","embedding":[1,2,3,4,5],"embedderId":"mock-embed","id":"test-record-id"}}}}}""")
  }

  test("empty collection marshals with an empty embeddings object") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "mock-embed"))
    assert(JsonCompat.databaseToJson(db) ==
      """{"collections":{"c":{"id":"c","embedderId":"mock-embed","embeddings":{}}}}""")
  }

  test("go float formatting: integral without decimal point, shortest fraction") {
    assert(JsonCompat.goFloat(1.0) == "1")
    assert(JsonCompat.goFloat(-2.0) == "-2")
    assert(JsonCompat.goFloat(0.0) == "0")
    assert(JsonCompat.goFloat(0.5) == "0.5")
    assert(JsonCompat.goFloat(-3.25) == "-3.25")
    assert(JsonCompat.goFloat(0.1) == "0.1")
  }

  test("go string escaping incl. HTML chars (Go default escaper)") {
    assert(JsonCompat.goEscape("""a"b\c""") == """a\"b\\c""")
    assert(JsonCompat.goEscape("x<y>&\n\t") == "x\\u003cy\\u003e\\u0026\\n\\t")
  }

  test("file round-trip preserves collections and records (TestJSONIO parity)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("collection-1", "mock-embed"))
    db.addRecord("collection-1",
      Record("record-1", "mock-embed", "hey there".getBytes("UTF-8"),
        Array(1.0, 2.0, 3.0, 4.0, 5.0)))
    val f = Files.createTempFile("graft-db-", ".json").toString
    JsonCompat.toFile(db, f)

    val db2 = JsonCompat.fromFile(spark,
      Files.createTempDirectory("graft-json2-").toString, f)
    assert(db2.getCollections.keySet == Set("collection-1"))
    assert(db2.getCollection("collection-1").embedderId == "mock-embed")
    val r = db2.getRecord("collection-1", "record-1")
    assert(new String(r.blob, "UTF-8") == "hey there")
    assert(r.embedding.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    // and the re-marshal is byte-identical (DeepEqual analog)
    assert(JsonCompat.databaseToJson(db2) == JsonCompat.databaseToJson(db))
  }

  test("distributed jsonl round-trip through executors") {
    import org.apache.spark.sql.functions.col
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-8"))
    val f = Embedders.hashProjection(8)
    val ids = (1 to 50).map(i => f"r$i%03d")
    val rows = ids.map { i =>
      (i, "local/hash-8", i.getBytes("UTF-8"), f(i.getBytes("UTF-8")).toSeq)
    }
    import spark.implicits._
    db.addRecords("c", rows.toDF("id", "embedderId", "blob", "embedding"))

    val out = Files.createTempDirectory("graft-jsonl-").toString + "/recs"
    JsonCompat.exportJsonl(db, "c", out)

    val db2 = freshDb()
    db2.addCollection(db2.makeCollection("c", "local/hash-8"))
    JsonCompat.importJsonl(db2, "c", out)
    assert(db2.records("c").count() == 50)
    val back = db2.records("c").orderBy(col("id")).collect()
    assert(back.map(_.getString(0)).toSeq == ids)
    assert(back.head.getSeq[Double](3) == f(ids.head.getBytes("UTF-8")).toSeq)
  }
}
