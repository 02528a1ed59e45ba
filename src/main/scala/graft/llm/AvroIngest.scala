package graft.llm

import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.Dataset

/** Avro OBJECT CONTAINER FILE ingest — the record format the Hadoop/Beam
  * data-prep era shipped corpora in (and the reference's own lineage:
  * Beam pipelines exchanged Avro between stages), read through the Avro
  * core library Spark already bundles (`/opt/spark/jars/avro-*.jar` —
  * no connector needed when the blobs arrive as a BINARY COLUMN, the
  * multimodal-table shape, rather than as whole files). The JPEG/ImageIO
  * precedent: the canonical library does the wire decode, the engine
  * certifies the INGEST PLUMBING — schema-driven field access, per-blob
  * record iteration (including deflate-compressed blocks), and the
  * quarantine contract (a corrupt container drops by omission, never
  * crashes the scan or poisons other blobs).
  *
  * Field extraction is SCHEMA-DRIVEN and null-tolerant: the three
  * contract fields (id long, title string, score int) read by name;
  * a blob whose schema lacks them quarantines whole (schema mismatch is
  * a partner-export break, not a per-record accident).
  *
  * Scale shape: row-local mapPartitions over blobs, no shuffle,
  * streaming-safe. */
object AvroIngest {

  /** Decompression-bomb guard: a deflate-compressed container a few KB on
    * the wire can inflate to arbitrarily many records. A blob exceeding
    * either cap quarantines WHOLE (None) — the strict-bounds contract:
    * violations drop by omission, never degrade into partial output or an
    * unbounded executor allocation. 64k records × the ~1 KB contract row
    * bounds a blob's decoded footprint to tens of MB. */
  val MaxRecordsPerBlob: Int = 1 << 16
  val MaxDecodedBytesPerBlob: Long = 64L << 20

  final case class RecRow(doc_id: Long, seq: Int, id: Long, title: String,
      score: Int)

  /** Decode one container blob to its records; None on corrupt bytes, a
    * schema missing the contract fields, or a blob whose decoded size
    * breaches [[MaxRecordsPerBlob]]/[[MaxDecodedBytesPerBlob]]. */
  def parse(docId: Long, bytes: Array[Byte]): Option[Seq[RecRow]] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val reader = DataFileReader.openReader(
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      try {
        val schema = reader.getSchema
        if (schema.getField("id") == null || schema.getField("title") == null ||
          schema.getField("score") == null) return None
        val out = Vector.newBuilder[RecRow]
        var n = 0
        var decodedBytes = 0L
        val it = reader.iterator().asScala
        while (it.hasNext) {
          val rec = it.next()
          if (n >= MaxRecordsPerBlob) return None
          val title = String.valueOf(rec.get("title"))
          decodedBytes += 16L + title.length // id + score + title chars
          if (decodedBytes > MaxDecodedBytesPerBlob) return None
          out += RecRow(docId, n,
            rec.get("id").asInstanceOf[Long],
            title,
            rec.get("score").asInstanceOf[Int])
          n += 1
        }
        Some(out.result())
      } finally reader.close()
    } catch { case _: Exception => None }
  }

  /** Row-local ingest over blobs; corrupt containers quarantine by
    * omission. */
  def parseAll(blobs: Dataset[Multimodal.Blob]): Dataset[RecRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      parse(b.doc_id, b.payload).getOrElse(Nil)
    })
  }
}
