package graft.core

import java.util.Locale

/** Golden-format pretty-printing — O22/O23.
  *
  * Byte-for-byte parity with the reference's `String()` methods, pinned by
  * its own tests:
  *  - record format `/root/reference/records/records.go:57-79`, golden
  *    strings at `records/records_test.go:67-84` (blob truncated at 100
  *    chars + "...", embedding truncated at 5 elements, 2-decimal floats,
  *    a double space before the embedding ellipsis);
  *  - collection format `/root/reference/collection/collection.go:28-30`.
  */
object PrettyPrint {

  def record(r: Record): String = {
    val blob = Option(r.blob).getOrElse(Array.emptyByteArray)
    val blobLookahead = math.min(100, blob.length)
    val blobStr = new String(blob, 0, blobLookahead, "UTF-8") +
      (if (blob.length > 100) "..." else "")

    val emb = Option(r.embedding).getOrElse(Array.emptyDoubleArray)
    val lookahead = math.min(5, emb.length)
    val sb = new StringBuilder("[")
    var i = 0
    while (i < lookahead) {
      sb.append(String.format(Locale.ROOT, "%.2f", Double.box(emb(i))))
      sb.append(", ")
      i += 1
    }
    if (emb.length > 5) sb.append(" ...")
    else if (sb.length >= 2) sb.setLength(sb.length - 2) // strip trailing ", "
    sb.append("]")

    s"Embedding{Embedding: ${sb.toString}, EmbedderId: ${r.embedderId}, Blob: $blobStr, Id: ${r.id}}"
  }

  def collection(id: String, embedderId: String): String =
    s"Collection{collection.Id: $id, embedderId: $embedderId}"
}
