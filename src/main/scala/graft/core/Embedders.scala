package graft.core

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.collection.concurrent.TrieMap

/** Pluggable embedder registry — same resolution semantics as the reference
  * (`/root/reference/embedders/embedders.go:14,83-95`):
  *
  *   1. explicit registrations win;
  *   2. names with the `hugging-face/` prefix auto-dispatch to the
  *      HuggingFace inference client with the suffix as model id
  *      ([[huggingFaceEmbed]] — real wire protocol behind an injectable
  *      transport; in a zero-egress environment the connect fails fast);
  *   3. anything else → "invalid embedder name" error.
  *
  * Extension beyond the reference: a deterministic, offline, seeded
  * hash-projection embedder family `local/hash-<dim>` so ingest and query
  * embedding are reproducible anywhere (executors included) without network.
  *
  * Cluster note: operators capture only the embedder *name*; resolution
  * happens executor-side against this JVM-global registry, so prefix-dispatch
  * families (`local/hash-<dim>`, `hugging-face/<model>`) work on any executor without
  * shipping closures. Custom one-off registrations must be re-registered in
  * the executor JVM (or be made a prefix family).
  */
object Embedders {
  /** blob → dense vector; the reference's `func([]byte) ([]float64, error)`. */
  type EmbedFn = Array[Byte] => Array[Double]

  private val registry = TrieMap[String, EmbedFn]()

  val HuggingFacePrefix = "hugging-face/"
  val LocalHashPrefix = "local/hash-"

  def register(name: String, fn: EmbedFn): Unit = registry.put(name, fn)

  def deregister(name: String): Unit = registry.remove(name)

  /** Resolve with the reference's precedence (embedders.go:83-95). */
  def get(name: String): EmbedFn =
    registry.get(name) match {
      case Some(fn) => fn
      case None if name.startsWith(HuggingFacePrefix) =>
        huggingFaceEmbed(name.stripPrefix(HuggingFacePrefix))
      case None if name.startsWith(LocalHashPrefix) =>
        name.stripPrefix(LocalHashPrefix).toIntOption match {
          case Some(d) if d > 0 => hashProjection(d)
          case _ => throw new GraftException(s"invalid embedder name: $name")
        }
      case None => throw new GraftException(s"invalid embedder name: $name")
    }

  def contains(name: String): Boolean =
    registry.contains(name) ||
      name.startsWith(HuggingFacePrefix) ||
      (name.startsWith(LocalHashPrefix) &&
        name.stripPrefix(LocalHashPrefix).toIntOption.exists(_ > 0))

  /** Batched embedding for partition-level ingest: the reference embeds one
    * record per HTTP round-trip (`embedders.go:34,40-51`); engine operators
    * call this once per partition batch instead. */
  def embedBatch(name: String, blobs: Iterator[Array[Byte]]): Iterator[Array[Double]] = {
    val fn = get(name)
    blobs.map(fn)
  }

  /** Deterministic seeded hash-projection embedder: component i is derived
    * from MD5(i || '|' || blob), mapped to [-1, 1), then L2-normalized.
    * Deterministic across JVMs/executors; stands in for the reference's
    * network HuggingFace embedder (`embedders.go:26-81`) offline.
    *
    * The component mapping is chosen to be *cross-engine reproducible* so
    * the DuckDB oracle can recompute embeddings exactly:
    * `md5_number_upper(x)` in DuckDB is the first 8 MD5 bytes read
    * little-endian unsigned; we take its top 53 bits (exact in a double —
    * no unsigned→double rounding ambiguity) and map to [-1, 1):
    *
    *   v_i = ((u64_le >>> 11) / 2^53) * 2 - 1
    *
    * DuckDB equivalent (cosine is scale-invariant, so the oracle can skip
    * the L2 normalization):
    *   list_transform(range(0, dim), i ->
    *     CAST(md5_number_upper(i::VARCHAR || '|' || blob) >> 11 AS DOUBLE)
    *       / 9007199254740992.0 * 2 - 1)
    */
  def hashProjection(dim: Int): EmbedFn = { blob =>
    val out = new Array[Double](dim)
    // One digest per call, not per component; MessageDigest.digest() resets
    // the instance, so reuse across the loop is safe.
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    var sumSq = 0.0
    while (i < dim) {
      md.update(i.toString.getBytes(StandardCharsets.UTF_8))
      md.update('|'.toByte)
      md.update(blob)
      val le = ByteBuffer.wrap(md.digest()).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      val v = (le >>> 11).toDouble / 9007199254740992.0 * 2.0 - 1.0 // 2^53
      out(i) = v
      sumSq += v * v
      i += 1
    }
    if (sumSq > 0.0) {
      val inv = 1.0 / math.sqrt(sumSq)
      var j = 0
      while (j < dim) { out(j) *= inv; j += 1 }
    }
    out
  }

  /** The reference's hardcoded inference endpoint (`embedders.go:31`). */
  val HuggingFaceEndpoint =
    "https://api-inference.huggingface.co/pipeline/feature-extraction"

  /** O24 HuggingFace feature-extraction client — wire behavior pinned to the
    * reference (`/root/reference/embedders/embedders.go:26-81`):
    *
    *  - api key from `HUGGING_FACE_API_KEY`; missing/empty → the reference's
    *    exact error text (`embedders.go:28-30`);
    *  - POST `{endpoint}/{modelId}` with `Content-Type: application/json`
    *    and `Authorization: Bearer <key>` (`embedders.go:38-45`);
    *  - body: SINGLETON `inputs` array of the blob as a UTF-8 string, plus
    *    `{"use_cache":true,"wait_for_model":true}` options
    *    (`embedders.go:33` — Go json.Marshal field order and HTML escaping,
    *    shared with [[graft.io.JsonCompat]]'s pinned golden bytes);
    *  - non-200 → error carrying the status code (`embedders.go:60-70`; the
    *    reference renders the body with Go's `%v` byte-slice notation — this
    *    client renders it as UTF-8 text, a deliberate readability deviation);
    *  - parse `[][]float64`, return row 0 (`embedders.go:72-80`); a
    *    malformed or empty response errors instead of the reference's panic.
    *
    * `endpoint`/`transport`/`env` are injection seams with production
    * defaults (real endpoint, JDK HTTP client, process env) — tests pin the
    * wire contract against an in-process HTTP server; zero-egress
    * environments fail fast at the transport with a connect error. */
  private[core] def huggingFaceEmbed(
      modelId: String,
      endpoint: String = HuggingFaceEndpoint,
      transport: HttpTransport = HttpTransport.Jdk,
      env: String => Option[String] = sys.env.get): EmbedFn = { blob =>
    val apiKey = env("HUGGING_FACE_API_KEY").getOrElse("")
    if (apiKey.isEmpty)
      throw new GraftException("HUGGING_FACE_API_KEY environment variable not set.")
    val body =
      s"""{"inputs":["${graft.io.JsonCompat.goEscape(
          new String(blob, StandardCharsets.UTF_8))}"],""" +
        """"options":{"use_cache":true,"wait_for_model":true}}"""
    val (status, respBody) = transport.post(
      s"$endpoint/$modelId",
      Seq("Content-Type" -> "application/json",
        "Authorization" -> s"Bearer $apiKey"),
      body.getBytes(StandardCharsets.UTF_8))
    val respText = new String(respBody, StandardCharsets.UTF_8)
    if (status != 200)
      throw new GraftException(
        s"Response has non-200 status code $status. Response body: $respText")
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(respBody)
      catch { case e: Exception => throw new GraftException(
        s"hugging-face/$modelId: cannot parse response as [][]float64: ${e.getMessage}") }
    if (root == null || !root.isArray || root.size == 0 || !root.get(0).isArray)
      throw new GraftException(
        s"hugging-face/$modelId: expected a non-empty [][]float64 response, got: $respText")
    val row = root.get(0)
    // element-wise strictness matches Go's json.Unmarshal into [][]float64:
    // a string/null/object element is a decode ERROR, never coerced to 0.0
    // (asDouble would silently emit zero vectors into the collection)
    Array.tabulate(row.size) { i =>
      val e = row.get(i)
      if (!e.isNumber) throw new GraftException(
        s"hugging-face/$modelId: non-numeric element at [0][$i] in " +
          s"[][]float64 response: $e")
      e.asDouble
    }
  }
}
