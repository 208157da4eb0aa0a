package graft.core

/** Minimal HTTP seam for the HuggingFace embedder client (O24): one POST,
  * bytes in, (status, bytes) out. The wire CONTRACT (url shape, headers,
  * body, status/parse handling) lives in [[Embedders.huggingFaceEmbed]];
  * this trait only moves bytes, so the contract is fully testable offline
  * against an in-process server while production uses the JDK client.
  */
trait HttpTransport {
  /** Execute one POST; returns (statusCode, responseBody). Transport-level
    * failures (refused connection, DNS) propagate as their native
    * exceptions — the reference panics on client.Do errors
    * (`/root/reference/embedders/embedders.go:49-51`). */
  def post(url: String, headers: Seq[(String, String)],
           body: Array[Byte]): (Int, Array[Byte])
}

object HttpTransport {
  /** `java.net.http`-backed default (JDK 11+, zero extra dependencies).
    * Bounded connect (10 s) and request (120 s — HF `wait_for_model` can
    * legitimately hold the request while a model loads) timeouts: a
    * packet-dropping firewall or stalled endpoint must surface as an
    * HttpTimeoutException in the executor task, never wedge a Spark stage
    * forever. */
  object Jdk extends HttpTransport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    def post(url: String, headers: Seq[(String, String)],
             body: Array[Byte]): (Int, Array[Byte]) = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(120))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      (resp.statusCode(), resp.body())
    }
  }
}
