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

  test("hugging-face/ prefix resolves but raises offline at call time") {
    val fn = Embedders.get("hugging-face/some-model")
    val e = intercept[GraftException] { fn("text".getBytes) }
    assert(e.getMessage.contains("offline"))
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
