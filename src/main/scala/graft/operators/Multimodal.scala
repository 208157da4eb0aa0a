package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Embedders

/** Multimodal column support — X7.
  *
  * The reference's record model is already modality-agnostic: a blob is
  * `[]byte` and the embedder id discriminates how to interpret it
  * (`/root/reference/README.md:103-107`). This module supplies the
  * engine-side plumbing for non-text blobs: typed metadata extraction,
  * frame/patch sampling, and batched feature extraction over `BINARY`
  * columns via `mapPartitions` — the executor-side batch shape a real
  * codec/model needs.
  *
  * STUB BOUNDARY: the actual decoders (image/audio/video codecs) are not
  * available in this environment, so [[decodeMeta]]'s "header parse" is a
  * clearly-marked deterministic fake (first two bytes as width/height,
  * 64-byte "frames"). Everything around the stub — schema, binary column
  * handling, partition batching, encoder plumbing — is real and tested;
  * swapping the fake for `javax.imageio`/ffmpeg calls changes only the
  * function body.
  */
object Multimodal {

  /** Typed metadata extracted from a binary blob. */
  final case class BlobMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                            n_frames: Long, fp: String)

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** Decode pass: one `mapPartitions` over (id, blob) pairs producing typed
    * metadata rows. The codec call is stubbed (see object scaladoc); the
    * pipeline shape is the real one — binary in, fixed struct out, no
    * driver involvement. */
  def decodeMeta(spark: SparkSession, docs: DataFrame,
                 idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          // STUB: a real decoder hands `b` to an image/audio codec here.
          val bytes = Option(b).getOrElse(Array.emptyByteArray)
          val w = if (bytes.length > 0) (bytes(0) & 0xff).toLong else 0L
          val h = if (bytes.length > 1) (bytes(1) & 0xff).toLong else 0L
          BlobMeta(id, bytes.length.toLong, w, h, bytes.length / 64L, md5hex(bytes))
        }
      }(Encoders.product[BlobMeta])
      .toDF()
  }

  /** Frame/patch sampling: slice a blob into `n` evenly spaced fixed-size
    * byte windows (a video frame-sampler's access pattern). Pure built-in
    * expressions — `substring` works on BINARY — so the plan stays narrow
    * and codegen'd. */
  def frameSample(docs: DataFrame, idCol: String = "doc_id", blobCol: String = "blob",
                  n: Int = 4, frameBytes: Int = 32): DataFrame =
    docs
      .select(col(idCol), col(blobCol).cast("binary").as("b"))
      .where(length(col("b")) >= frameBytes)
      .select(col(idCol), posexplode(expr(
        // floor (not int-cast) so the stride math is identical in engines
        // where double→int casting rounds instead of truncating
        s"""transform(sequence(0, $n - 1),
           |  f -> substring(b, 1 + f * greatest(cast(floor((length(b) - $frameBytes) / ${math.max(n - 1, 1)}) as int), 0), $frameBytes))""".stripMargin))
        .as(Seq("frame_no", "frame")))

  /** Batched feature extraction over blobs: same partition-batched shape as
    * text ingest ([[Ingest.makeRecords]]), keyed by an embedder id — the
    * multimodal analog of `MakeRecord`. */
  def featurize(spark: SparkSession, docs: DataFrame, embedderId: String,
                idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val fn = Embedders.get(embedderId)
        it.map { case (id, b) => (id, fn(b)) }
      }
      .toDF(idCol, "feature")
  }
}
