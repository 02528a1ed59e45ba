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

  final case class RecRow(doc_id: Long, seq: Int, id: Long, title: String,
      score: Int)

  /** Decode one container blob to its records; None on corrupt bytes or
    * a schema missing the contract fields. */
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
        val out = reader.iterator().asScala.zipWithIndex.map { case (rec, i) =>
          RecRow(docId, i,
            rec.get("id").asInstanceOf[Long],
            String.valueOf(rec.get("title")),
            rec.get("score").asInstanceOf[Int])
        }.toVector
        Some(out)
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
