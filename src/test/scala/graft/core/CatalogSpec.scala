package graft.core

import java.nio.file.Files

import graft.SparkSpec

/** CRUD + catalog parity with the reference's negative-path tests
  * (`/root/reference/collection/collection_test.go:54-154`,
  * `/root/reference/database/database_test.go:94-140`).
  */
class CatalogSpec extends SparkSpec {

  private def freshDb(): GraftDatabase = {
    val dir = Files.createTempDirectory("graft-cat-").toString
    GraftDatabase.make(spark, dir)
  }

  private val mockEmbedder = "spec-mock-embed"
  Embedders.register(mockEmbedder, _ => Array(1.0, 2.0, 3.0, 4.0, 5.0))

  private def rec(id: String, emb: Array[Double] = Array(1.0, 2.0, 3.0, 4.0, 5.0)): Record =
    Record(id, mockEmbedder, s"blob-$id".getBytes("UTF-8"), emb)

  test("makeCollection validates the embedder (collection.go:19-26)") {
    val db = freshDb()
    val e = intercept[GraftException] { db.makeCollection("c", "no-such-embedder") }
    assert(e.getMessage == "Invalid embedder name")
  }

  test("duplicate collection add errors (database.go:100-103)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("test1", mockEmbedder))
    val e = intercept[GraftException] {
      db.addCollection(db.makeCollection("test1", mockEmbedder))
    }
    assert(e.getMessage ==
      "Cannot create collection test1: a collection with id test1 already exists")
  }

  test("missing collection get errors (database.go:118-124)") {
    val db = freshDb()
    val e = intercept[GraftException] { db.getCollection("nope") }
    assert(e.getMessage ==
      "Could not get collection - no collection with ID nope exists in the database")
  }

  test("missing collection delete errors (database.go:126-137)") {
    val db = freshDb()
    val e = intercept[GraftException] { db.deleteCollection("nope") }
    assert(e.getMessage == "Cannot delete collection nope: does not exist")
  }

  test("collection lifecycle: add, list, contains, delete") {
    val db = freshDb()
    db.addCollection(db.makeCollection("a", mockEmbedder))
    db.addCollection(db.makeCollection("b", mockEmbedder))
    assert(db.getCollections.keySet == Set("a", "b"))
    assert(db.isCollectionInDB("a") && !db.isCollectionInDB("c"))
    assert(db.listCollections().select("id").collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    db.deleteCollection("a")
    assert(db.getCollections.keySet == Set("b"))
  }

  test("catalog survives a restart via the manifest") {
    val base = java.nio.file.Files.createTempDirectory("graft-manifest-").toString
    val db = GraftDatabase.make(spark, base)
    db.addCollection(db.makeCollection("persisted", mockEmbedder))
    db.addRecord("persisted", rec("r1"))
    db.addRecord("persisted", rec("r2"))
    db.deleteRecord("persisted", "r1") // bumps the version

    val reopened = GraftDatabase.make(spark, base) // fresh instance, same path
    assert(reopened.isCollectionInDB("persisted"))
    val meta = reopened.getCollection("persisted")
    assert(meta.embedderId == mockEmbedder && meta.version == 1)
    assert(reopened.records("persisted").count() == 1)
    assert(reopened.getRecord("persisted", "r2").id == "r2")
  }

  test("deleteCollection drops the backing data") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    db.addRecord("c", rec("r1"))
    val path = db.getCollection("c").path
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    db.deleteCollection("c")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    // re-creating the collection starts empty
    db.addCollection(db.makeCollection("c", mockEmbedder))
    assert(db.records("c").count() == 0)
  }

  test("addRecord + getRecord round-trip") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    db.addRecord("c", rec("r1"))
    val got = db.getRecord("c", "r1")
    assert(got.id == "r1")
    assert(got.embedderId == mockEmbedder)
    assert(new String(got.blob, "UTF-8") == "blob-r1")
    assert(got.embedding.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("registerView exposes the collection to pure SQL") {
    val db = freshDb()
    db.addCollection(db.makeCollection("sql-docs", mockEmbedder))
    db.addRecord("sql-docs", rec("r1"))
    db.addRecord("sql-docs", rec("r2"))
    val view = db.registerView("sql-docs")
    assert(view == "graft_sql_docs")
    val rows = spark.sql(s"SELECT id FROM $view ORDER BY id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("r1", "r2"))
  }

  test("duplicate record add errors (collection.go:33-35)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    db.addRecord("c", rec("r1"))
    val e = intercept[GraftException] { db.addRecord("c", rec("r1")) }
    assert(e.getMessage == "Record r1 already exists in collection c\n")
  }

  test("embedder mismatch errors (collection.go:37-39)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    val e = intercept[GraftException] {
      db.addRecord("c", rec("r1").copy(embedderId = "local/hash-8"))
    }
    assert(e.getMessage ==
      s"Record embedderId local/hash-8 != collection embedderId $mockEmbedder")
  }

  test("null embedding errors with the record's pretty form (collection.go:40-42)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    val r = rec("r1", emb = null)
    val e = intercept[GraftException] { db.addRecord("c", r) }
    assert(e.getMessage == s"Embedding for ${PrettyPrint.record(r)} is null")
  }

  test("missing record get errors (collection.go:56-62)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    val e = intercept[GraftException] { db.getRecord("c", "ghost") }
    assert(e.getMessage ==
      "Could not get record - record with ID ghost does not exist in collection")
  }

  test("delete record: removes, errors when absent (collection.go:47-54)") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", mockEmbedder))
    db.addRecord("c", rec("r1"))
    db.addRecord("c", rec("r2"))
    db.deleteRecord("c", "r1")
    assert(db.records("c").count() == 1)
    intercept[GraftException] { db.getRecord("c", "r1") }
    val e = intercept[GraftException] { db.deleteRecord("c", "r1") }
    assert(e.getMessage ==
      "Could not delete record r1 from collection c: record not found in collection")
  }

  test("record ops on a missing collection propagate the get error (database.go:75-97)") {
    val db = freshDb()
    intercept[GraftException] { db.addRecord("ghost", rec("r")) }
    intercept[GraftException] { db.getRecord("ghost", "r") }
    intercept[GraftException] { db.deleteRecord("ghost", "r") }
    intercept[GraftException] { db.query("ghost", "q".getBytes, 3) }
  }

  test("bulk addRecords validates and appends; rejects dups in and across batches") {
    import spark.implicits._
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-4"))
    val f = Embedders.hashProjection(4)
    def batch(ids: String*) = ids.map(i =>
      (i, "local/hash-4", i.getBytes("UTF-8"), f(i.getBytes("UTF-8")).toSeq))
      .toDF("id", "embedderId", "blob", "embedding")
    db.addRecords("c", batch("a", "b", "cc"))
    assert(db.records("c").count() == 3)
    intercept[GraftException] { db.addRecords("c", batch("x", "x")) }   // dup within batch
    intercept[GraftException] { db.addRecords("c", batch("a")) }        // dup vs existing
    intercept[GraftException] {                                          // embedder mismatch
      db.addRecords("c", batch("z").withColumn("embedderId",
        org.apache.spark.sql.functions.lit("other")))
    }
    assert(db.records("c").count() == 3)
  }

  test("compact: many append file-sets collapse to few files, data and queries intact") {
    import spark.implicits._
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-4"))
    val f = Embedders.hashProjection(4)
    (0 until 5).foreach { b => // five separate appends = five file sets
      db.addRecords("c", Seq((s"r$b", "local/hash-4", s"r$b".getBytes("UTF-8"),
        f(s"r$b".getBytes("UTF-8")).toSeq))
        .toDF("id", "embedderId", "blob", "embedding"))
    }
    val before = db.records("c").select("id").collect().map(_.getString(0)).sorted.toSeq
    val (filesBefore, filesAfter) = db.compact("c")
    assert(filesBefore >= 5 && filesAfter == 1, s"($filesBefore, $filesAfter)")
    val after = db.records("c").select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(after == before)                          // nothing lost or duplicated
    assert(db.getCollection("c").version == 1)       // copy-on-write swap
    assert(db.query("c", "r0".getBytes("UTF-8"), 1).collect().nonEmpty)
    // appends keep working against the new version dir
    db.addRecords("c", Seq(("r9", "local/hash-4", "r9".getBytes("UTF-8"),
      f("r9".getBytes("UTF-8")).toSeq)).toDF("id", "embedderId", "blob", "embedding"))
    assert(db.records("c").count() == 6)
  }

  test("compact: a concurrent append aborts the swap and loses nothing") {
    import spark.implicits._
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-4"))
    val f = Embedders.hashProjection(4)
    def append(id: String): Unit =
      db.addRecords("c", Seq((id, "local/hash-4", id.getBytes("UTF-8"),
        f(id.getBytes("UTF-8")).toSeq)).toDF("id", "embedderId", "blob", "embedding"))
    append("r0"); append("r1")
    // the append lands after the rewrite read the old file set — exactly
    // the lost-update window the pre-swap listing re-check must close
    val e = intercept[GraftException] {
      db.compactImpl("c", 128L << 20, () => append("r2"))
    }
    assert(e.getMessage.contains("Could not compact collection c"))
    assert(db.getCollection("c").version == 0, "failed compact must not swap")
    // nothing lost: the concurrent append is visible in the live version
    assert(db.records("c").select("id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("r0", "r1", "r2"))
    // a retry in a quiet window succeeds and keeps all three records
    val (before, after) = db.compact("c")
    assert(before >= 3 && after == 1, s"($before, $after)")
    assert(db.records("c").count() == 3)
    assert(db.getCollection("c").version == 1)
  }

  test("compact: a concurrent delete's version swap aborts the swap (no resurrection)") {
    import spark.implicits._
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-4"))
    val f = Embedders.hashProjection(4)
    db.addRecords("c", Seq("r0", "r1", "r2").map(id =>
      (id, "local/hash-4", id.getBytes("UTF-8"), f(id.getBytes("UTF-8")).toSeq))
      .toDF("id", "embedderId", "blob", "embedding"))
    // the delete swaps versions WITHOUT touching the old path's files —
    // the listing re-check alone would pass and the compact swap would
    // point the catalog back at a version that still contains r1
    val e = intercept[GraftException] {
      db.compactImpl("c", 128L << 20, () => db.deleteRecord("c", "r1"))
    }
    assert(e.getMessage.contains("Could not compact collection c"))
    assert(db.records("c").select("id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("r0", "r2"), "compact must not resurrect the deleted record")
    // retry in a quiet window compacts the post-delete state
    val (_, after) = db.compact("c")
    assert(after == 1)
    assert(db.records("c").select("id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("r0", "r2"))
  }

  test("mutations under contention: concurrent appends + compactions lose nothing") {
    import spark.implicits._
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-4"))
    val f = Embedders.hashProjection(4)
    val nWriters = 4
    val perWriter = 4

    val writers = (0 until nWriters).map { w =>
      new Thread(() =>
        (0 until perWriter).foreach { i =>
          val id = s"w$w-$i"
          db.addRecords("c", Seq((id, "local/hash-4", id.getBytes("UTF-8"),
            f(id.getBytes("UTF-8")).toSeq)).toDF("id", "embedderId", "blob", "embedding"))
        })
    }
    val maintenance = new Thread(() =>
      (0 until 3).foreach { _ =>
        try db.compact("c")
        catch { case _: GraftException => () } // concurrent-change retry path
        Thread.sleep(50)
      })
    (writers :+ maintenance).foreach(_.start())
    (writers :+ maintenance).foreach(_.join(120000))

    val ids = db.records("c").select("id").collect().map(_.getString(0)).sorted.toSeq
    val expected = (for (w <- 0 until nWriters; i <- 0 until perWriter)
      yield s"w$w-$i").sorted
    assert(ids == expected, "every append visible exactly once, no lost updates")
    // a compaction in a quiet window still works and preserves everything
    db.compact("c")
    assert(db.records("c").count() == nWriters * perWriter)
    // manifest survives a restart with the final state
    val reopened = GraftDatabase.make(spark, db.basePath)
    assert(reopened.records("c").count() == nWriters * perWriter)
  }

  test("concurrent adds of the SAME id: exactly one wins, the other gets the reference error") {
    import spark.implicits._
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-4"))
    val f = Embedders.hashProjection(4)
    def add(): Option[String] =
      try {
        db.addRecords("c", Seq(("dup", "local/hash-4", "dup".getBytes("UTF-8"),
          f("dup".getBytes("UTF-8")).toSeq)).toDF("id", "embedderId", "blob", "embedding"))
        None
      } catch { case e: GraftException => Some(e.getMessage) }

    val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[String]]()
    val ts = (0 until 2).map(_ => new Thread(() => results.add(add())))
    ts.foreach(_.start()); ts.foreach(_.join(60000))

    val (errs, oks) = results.toArray(Array.empty[Option[String]]).partition(_.isDefined)
    assert(oks.length == 1 && errs.length == 1,
      s"expected exactly one winner, got ${oks.length} successes")
    assert(errs.head.get.contains("Record dup already exists in collection c"))
    assert(db.records("c")
      .where(org.apache.spark.sql.functions.col("id") === "dup").count() == 1)
  }

  test("query: embeds with the collection embedder, exact top-k, ranked output") {
    val db = freshDb()
    db.addCollection(db.makeCollection("c", "local/hash-16"))
    val f = Embedders.hashProjection(16)
    val docs = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    docs.foreach(d => db.addRecord("c",
      Record(d, "local/hash-16", d.getBytes("UTF-8"), f(d.getBytes("UTF-8")))))
    val res = db.query("c", "alpha".getBytes("UTF-8"), 3).collect()
    assert(res.length == 3)
    assert(res.head.getString(0) == "alpha")           // self-match ranks first
    assert(res.head.getDouble(1) == 1.0)
    // k >= N returns everything (collection.go:76-82 early-return analog)
    assert(db.query("c", "alpha".getBytes("UTF-8"), 99).count() == docs.length)
  }

  // --- secondary-index lifecycle -----------------------------------------

  private def writeSource(rows: Seq[(Long, String)], path: String,
                          mode: String = "overwrite"): Unit = {
    import spark.implicits._
    rows.toDF("id", "v").repartition(1).write.mode(mode).parquet(path)
  }

  private def freshSource(): String = {
    val src = Files.createTempDirectory("graft-idxsrc-").toString + "/t.parquet"
    writeSource(Seq((1L, "a"), (2L, "b")), src)
    src
  }

  test("index build registers a manifest-persisted fingerprinted entry; FailIfMissing serves it") {
    val db = freshDb()
    val src = freshSource()
    var builds = 0
    def build(out: String): Unit = { builds += 1; spark.read.parquet(src).write.parquet(out) }
    val m = db.buildIndex("ix", "test-kind", src, Map("p" -> "1"))(build)
    assert(m.version == 0 && builds == 1)
    assert(db.isIndexRegistered("ix") && db.getIndex("ix") == m)
    assert(!db.isIndexStale("ix"))
    assert(spark.read.parquet(m.path).count() == 2)
    assert(db.listIndexes().select("name", "kind", "version").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq(("ix", "test-kind", 0)))
    // manifest round-trip: a FRESH instance over the same basePath restores it
    val db2 = GraftDatabase.make(spark, db.basePath)
    assert(db2.getIndex("ix") == m)
    // probe-side resolve serves the entry without rebuilding, even probe-only
    val served = db2.resolveIndex("ix", "test-kind", src, Map("p" -> "1"),
      IndexPolicy.FailIfMissing)(build)
    assert(served == m && builds == 1)
  }

  test("index resolve: FailIfMissing errors on an unbuilt index, BuildIfMissing builds once") {
    val db = freshDb()
    val src = freshSource()
    var builds = 0
    def build(out: String): Unit = { builds += 1; spark.read.parquet(src).write.parquet(out) }
    val e = intercept[GraftException] {
      db.resolveIndex("ix", "k", src, Map.empty, IndexPolicy.FailIfMissing)(build)
    }
    assert(e.getMessage.contains("not built"))
    assert(builds == 0)
    val m1 = db.resolveIndex("ix", "k", src, Map.empty, IndexPolicy.BuildIfMissing)(build)
    val m2 = db.resolveIndex("ix", "k", src, Map.empty, IndexPolicy.BuildIfMissing)(build)
    assert(builds == 1 && m1 == m2)
  }

  test("index staleness: source change detected; only RebuildIfStale rebuilds") {
    val db = freshDb()
    val src = freshSource()
    var builds = 0
    def build(out: String): Unit = { builds += 1; spark.read.parquet(src).write.parquet(out) }
    val m0 = db.buildIndex("ix", "k", src, Map.empty)(build)
    writeSource(Seq((3L, "c")), src, mode = "append") // source grows under the index
    assert(db.isIndexStale("ix"))
    // a read path must never silently rebuild over changed data
    val e = intercept[GraftException] {
      db.resolveIndex("ix", "k", src, Map.empty, IndexPolicy.BuildIfMissing)(build)
    }
    assert(e.getMessage.contains("stale") && builds == 1)
    val m1 = db.resolveIndex("ix", "k", src, Map.empty, IndexPolicy.RebuildIfStale)(build)
    assert(builds == 2 && m1.version == 1 && m1.fingerprint != m0.fingerprint)
    assert(!db.isIndexStale("ix"))
    // copy-on-write with version retention: the superseded dir SURVIVES the
    // swap (a reader that resolved v0 pre-rebuild keeps a live directory);
    // vacuumIndexes is the explicit GC and removes exactly the old version
    assert(Files.exists(java.nio.file.Paths.get(m0.path)))
    assert(spark.read.parquet(m1.path).count() == 3)
    db.vacuumIndexes()
    assert(!Files.exists(java.nio.file.Paths.get(m0.path)))
    assert(spark.read.parquet(m1.path).count() == 3)
  }

  test("index definition mismatch: an entry built under different params is never served") {
    val db = freshDb()
    val src = freshSource()
    var builds = 0
    def build(out: String): Unit = { builds += 1; spark.read.parquet(src).write.parquet(out) }
    db.buildIndex("ix", "k", src, Map("bits" -> "16"))(build)
    val e = intercept[GraftException] {
      db.resolveIndex("ix", "k", src, Map("bits" -> "8"), IndexPolicy.FailIfMissing)(build)
    }
    assert(e.getMessage.contains("built as") && builds == 1)
    // BuildIfMissing must NOT rewrite an existing (conflicting) definition
    // from a read path: two different-definition probes would ping-pong
    // full rebuilds; only RebuildIfStale may replace live data
    val e2 = intercept[GraftException] {
      db.resolveIndex("ix", "k", src, Map("bits" -> "8"), IndexPolicy.BuildIfMissing)(build)
    }
    assert(e2.getMessage.contains("built as") && builds == 1)
    val m = db.resolveIndex("ix", "k", src, Map("bits" -> "8"), IndexPolicy.RebuildIfStale)(build)
    assert(builds == 2 && m.params == Map("bits" -> "8") && m.version == 1)
  }

  test("index manifest: concurrent registrations from separate instances all survive") {
    val base = freshDb().basePath
    val src = freshSource()
    // two fresh registry instances (the CatalogOps.indexRegistry pattern)
    // build DIFFERENT indexes into the same database concurrently: the
    // read-merge-write manifest must keep both entries
    val names = (0 until 6).map(i => s"ix$i")
    val threads = names.map { n =>
      new Thread(() => {
        GraftDatabase.make(spark, base).buildIndex(n, "k", src, Map.empty)(out =>
          spark.read.parquet(src).write.parquet(out))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val fresh = GraftDatabase.make(spark, base)
    names.foreach(n => assert(fresh.isIndexRegistered(n), s"lost $n"))
    // and a drop removes exactly its own entry
    fresh.dropIndex("ix0")
    val after = GraftDatabase.make(spark, base)
    assert(!after.isIndexRegistered("ix0") &&
      names.tail.forall(after.isIndexRegistered))
  }

  test("index manifest readers never observe the delete+rename no-file window") {
    // persistIndexDelta swaps the manifest via temp-write + delete + rename;
    // same-process readers (GraftDatabase.make -> loadIndexManifest) take
    // the same manifestIoLock, so the brief no-file window must be
    // invisible: a reader racing a writer sees SOME consistent manifest —
    // never a vanished file (which would silently resurrect an empty
    // registry) and never a half-written one (parse error).
    val base = freshDb().basePath
    val src = freshSource()
    GraftDatabase.make(spark, base).buildIndex("anchor", "k", src, Map.empty)(out =>
      spark.read.parquet(src).write.parquet(out))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          // a fresh instance re-reads the manifest on construction; the
          // anchor entry predates every writer delta, so ANY consistent
          // snapshot contains it
          if (!GraftDatabase.make(spark, base).isIndexRegistered("anchor"))
            failures.add(new AssertionError("reader saw a manifest without anchor"))
        } catch { case t: Throwable => failures.add(t) }
      }
    })
    reader.start()
    try (0 until 30).foreach { i =>
      GraftDatabase.make(spark, base).buildIndex(s"churn$i", "k", src, Map.empty)(
        out => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out)))
    } finally { stop.set(true); reader.join() }
    assert(failures.isEmpty, s"concurrent reads failed: ${failures.peek()}")
    val end = GraftDatabase.make(spark, base)
    assert(end.isIndexRegistered("anchor") &&
      (0 until 30).forall(i => end.isIndexRegistered(s"churn$i")))
  }

  test("dropIndex removes the entry and backing data; dropping a missing index errors") {
    val db = freshDb()
    val src = freshSource()
    val m = db.buildIndex("ix", "k", src, Map.empty)(out =>
      spark.read.parquet(src).write.parquet(out))
    db.dropIndex("ix")
    assert(!db.isIndexRegistered("ix"))
    assert(!Files.exists(java.nio.file.Paths.get(m.path)))
    // the drop is durable: a fresh instance doesn't resurrect the entry
    assert(!GraftDatabase.make(spark, db.basePath).isIndexRegistered("ix"))
    val e = intercept[GraftException] { db.dropIndex("ix") }
    assert(e.getMessage == "Cannot drop index ix: does not exist")
  }

  test("pretty-print golden strings (records_test.go:67-84)") {
    Embedders.register("mock-short-embed", _ => Array(1.0))
    Embedders.register("mock-long-embed", _ => Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    val short = Record("test", "mock-short-embed", "short".getBytes("UTF-8"), Array(1.0))
    assert(PrettyPrint.record(short) ==
      "Embedding{Embedding: [1.00], EmbedderId: mock-short-embed, Blob: short, Id: test}")
    val longBlob = "hey there, this is a long test string. it needs to be over 100 characters long for the ellipses to kick in"
    val long = Record("test", "mock-long-embed", longBlob.getBytes("UTF-8"),
      Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(PrettyPrint.record(long) ==
      "Embedding{Embedding: [1.00, 2.00, 3.00, 4.00, 5.00,  ...], EmbedderId: mock-long-embed, Blob: hey there, this is a long test string. it needs to be over 100 characters long for the ellipses to k..., Id: test}")
    assert(PrettyPrint.collection("c1", "e1") ==
      "Collection{collection.Id: c1, embedderId: e1}")
  }
}
