package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (B35): opaque binary payloads + typed metadata
  * co-resident with relational columns, decoded partition-batched.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this environment); everything around it — the typed schema, the
  * `Dataset[Blob]` encoder, partition-wise batch iteration, and the output
  * feature schema — is the real shape a production decode (JNI codec, ONNX
  * feature extractor) drops into. `mapPartitions` is deliberate: a real
  * decoder amortizes model/codec init once per partition, not per row.
  */
object Multimodal {

  /** A document rendered as an opaque binary payload. */
  final case class Blob(doc_id: Long, payload: Array[Byte])

  /** Stub "decoded" features — deterministic functions of the raw bytes. */
  final case class DecodedFeatures(
      doc_id: Long,
      n_bytes: Long,
      first_byte: Long,
      last_byte: Long,
      byte_sum: Long)

  /** documents.text reinterpreted as a binary payload column. */
  def asBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload")).as[Blob]
  }

  /** STUB decode: where a real pipeline would run an image/audio codec and
    * feature extractor per batch, we emit deterministic byte statistics so
    * the full plumbing stays testable end-to-end (oracle-checkable too,
    * since the fixture text is ASCII). */
  def decode(blobs: Dataset[Blob]): Dataset[DecodedFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // real decoder: init codec/model once per partition here
      it.map { b =>
        val p = b.payload
        DecodedFeatures(
          doc_id = b.doc_id,
          n_bytes = p.length.toLong,
          first_byte = if (p.nonEmpty) p.head & 0xffL else -1L,
          last_byte = if (p.nonEmpty) p.last & 0xffL else -1L,
          byte_sum = p.foldLeft(0L)((acc, x) => acc + (x & 0xffL)))
      }
    }
  }
}
