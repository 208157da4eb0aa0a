package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Embedder-registry parity with the reference
  * (`/root/reference/embedders/embedders_test.go:11-22` and
  * `embedders/embedders.go:83-95`): explicit registrations win, the
  * `hugging-face/` prefix auto-dispatches, anything else is an invalid name.
  * Plus determinism/normalization checks for the offline hash-projection
  * embedder family.
  */
class EmbeddersSpec extends AnyFunSuite {

  test("explicit registration wins and round-trips") {
    Embedders.register("spec-mock", _ => Array(1.0, 2.0, 3.0, 4.0, 5.0))
    try {
      assert(Embedders.contains("spec-mock"))
      assert(Embedders.get("spec-mock")(Array.emptyByteArray).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    } finally Embedders.deregister("spec-mock")
    assert(!Embedders.contains("spec-mock"))
  }

  test("explicit registration shadows prefix dispatch (embedders.go:84-86)") {
    val name = s"${Embedders.LocalHashPrefix}4"
    Embedders.register(name, _ => Array(9.0))
    try assert(Embedders.get(name)(Array[Byte](1)).toSeq == Seq(9.0))
    finally Embedders.deregister(name)
    // falls back to the prefix family once deregistered
    assert(Embedders.get(name)(Array[Byte](1)).length == 4)
  }

  test("hugging-face/ prefix resolves; missing api key errors with the reference text (embedders.go:28-30)") {
    val fn = Embedders.huggingFaceEmbed("some-model", env = _ => None)
    val e = intercept[GraftException] { fn("text".getBytes) }
    assert(e.getMessage == "HUGGING_FACE_API_KEY environment variable not set.")
    // the reference treats an EMPTY key the same as unset (apiKey == "")
    val e2 = intercept[GraftException] {
      Embedders.huggingFaceEmbed("m", env = _ => Some(""))("text".getBytes)
    }
    assert(e2.getMessage == "HUGGING_FACE_API_KEY environment variable not set.")
    // prefix dispatch reaches the client (key check fires before any I/O)
    val viaRegistry = Embedders.get("hugging-face/some-model")
    assert(viaRegistry != null)
  }

  // --- O24 wire-contract parity against an in-process HTTP server ---------
  // (`/root/reference/embedders/embedders.go:26-81`; real JDK transport, real
  // localhost socket — only the endpoint is swapped.)

  private class FakeHf(status: Int, response: String) {
    @volatile var method: String = _
    @volatile var path: String = _
    @volatile var body: String = _
    @volatile var contentType: String = _
    @volatile var auth: String = _
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      method = ex.getRequestMethod
      path = ex.getRequestURI.getPath
      body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      contentType = ex.getRequestHeaders.getFirst("Content-Type")
      auth = ex.getRequestHeaders.getFirst("Authorization")
      val out = response.getBytes("UTF-8")
      ex.sendResponseHeaders(status, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/pipeline/feature-extraction"
    def stop(): Unit = server.stop(0)
  }

  private def hfAgainst(srv: FakeHf, modelId: String = "test-model",
                        key: String = "secret-key"): Embedders.EmbedFn =
    Embedders.huggingFaceEmbed(modelId, endpoint = srv.endpoint,
      env = _ => Some(key))

  test("hugging-face client: singleton inputs body, options flags, auth + content-type, row 0 of [][]float64") {
    val srv = new FakeHf(200, "[[1.5,-2.0,3.25],[9.0,9.0,9.0]]")
    try {
      val v = hfAgainst(srv)("hello world".getBytes("UTF-8"))
      assert(v.toSeq == Seq(1.5, -2.0, 3.25)) // row 0, never row 1 (embedders.go:79)
      assert(srv.method == "POST")
      assert(srv.path == "/pipeline/feature-extraction/test-model") // url = endpoint/modelId (embedders.go:37)
      assert(srv.contentType == "application/json")
      assert(srv.auth == "Bearer secret-key")
      // golden body bytes: Go json.Marshal field order + singleton inputs
      assert(srv.body ==
        """{"inputs":["hello world"],"options":{"use_cache":true,"wait_for_model":true}}""")
    } finally srv.stop()
  }

  test("hugging-face client: blob escaped like Go json.Marshal (HTML escapes included)") {
    val srv = new FakeHf(200, "[[0.0]]")
    try {
      hfAgainst(srv)("a<b>&\"c\"\\".getBytes("UTF-8"))
      // Go's default HTML escaping: < > & become < > &;
      // quotes and backslashes get the standard JSON escapes
      assert(srv.body.contains(
        "\"inputs\":[\"a\\u003cb\\u003e\\u0026\\\"c\\\"\\\\\"]"))
    } finally srv.stop()
  }

  test("hugging-face client: non-200 response errors with the status code (embedders.go:60-70)") {
    val srv = new FakeHf(503, """{"error":"model loading"}""")
    try {
      val e = intercept[GraftException] { hfAgainst(srv)("x".getBytes) }
      assert(e.getMessage.startsWith("Response has non-200 status code 503."))
      assert(e.getMessage.contains("model loading"))
    } finally srv.stop()
  }

  test("hugging-face client: malformed or empty responses error instead of panicking") {
    // the last two pin element-wise [][]float64 strictness: Go's
    // json.Unmarshal errors on string/null elements, so coercing them to
    // 0.0 (Jackson asDouble) would silently ship zero vectors
    Seq("not json at all", "[]", """{"a":1}""", "[1,2,3]",
        """[["0.1","err"]]""", "[[null,null]]").foreach { resp =>
      val srv = new FakeHf(200, resp)
      try intercept[GraftException] { hfAgainst(srv)("x".getBytes) }
      finally srv.stop()
    }
  }

  test("hugging-face client: nested model ids keep their slashes in the url") {
    val srv = new FakeHf(200, "[[1.0]]")
    try {
      Embedders.huggingFaceEmbed("sentence-transformers/all-MiniLM-L6-v2",
        endpoint = srv.endpoint, env = _ => Some("k"))("x".getBytes)
      assert(srv.path ==
        "/pipeline/feature-extraction/sentence-transformers/all-MiniLM-L6-v2")
    } finally srv.stop()
  }

  test("unknown embedder name errors (embedders.go:93-94)") {
    val e = intercept[GraftException] { Embedders.get("no-such-embedder") }
    assert(e.getMessage.toLowerCase.contains("invalid embedder name"))
  }

  test("malformed local/hash dims error") {
    intercept[GraftException] { Embedders.get("local/hash-abc") }
    intercept[GraftException] { Embedders.get("local/hash--3") }
    intercept[GraftException] { Embedders.get("local/hash-0") }
  }

  test("hash projection: deterministic across calls and instances") {
    val blob = "the quick brown fox".getBytes("UTF-8")
    val a = Embedders.get("local/hash-64")(blob)
    val b = Embedders.hashProjection(64)(blob)
    assert(a.toSeq == b.toSeq)
  }

  test("hash projection: unit L2 norm for non-empty blobs") {
    val v = Embedders.get("local/hash-32")("hello world".getBytes("UTF-8"))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
  }

  test("hash projection: distinct blobs produce distinct vectors") {
    val f = Embedders.hashProjection(16)
    assert(f("aaa".getBytes).toSeq != f("bbb".getBytes).toSeq)
  }

  test("embedBatch embeds every element in order") {
    val f = Embedders.hashProjection(8)
    val blobs = Seq("a", "b", "c").map(_.getBytes("UTF-8"))
    val batched = Embedders.embedBatch("local/hash-8", blobs.iterator).toSeq
    assert(batched.map(_.toSeq) == blobs.map(b => f(b).toSeq))
  }
}
