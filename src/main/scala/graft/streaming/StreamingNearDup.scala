package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llm.NearDupIndex

/** Streaming maintenance of the persisted NEAR-dup signature index
  * ([[graft.llm.NearDupIndex]]) — the [[StreamingDedup]] loop with the
  * exact-digest screen swapped for the banded-MinHash signature screen:
  * each micro-batch drops docs whose signature estimate says near-dup of
  * anything ever accepted (or of a smaller-id doc in the same batch),
  * appends the survivors to the accepted corpus, and appends their
  * sketches to the index. Per batch the history side costs sketch bytes
  * (~0.6 KB/doc), never corpus bodies.
  *
  * Same failure semantics as [[StreamingDedup]] (accepted-write before
  * index-update: replay after full commit is a no-op because the replayed
  * docs' own signatures are now in the index at estimate 1.0; a crash
  * between the writes duplicates rather than loses). Same single-writer
  * contract on the index path.
  */
object StreamingNearDup {

  /** One micro-batch of signature-screened ingest — exposed so the
    * batch-sequential rendering is the SAME code (parity spec). */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      acceptedPath: String,
      minSim: Double = 0.8): Unit = {
    // materialized: the accepted append and the index update must see the
    // SAME survivor rows (the screen re-planned after the index grew would
    // return nothing — see StreamingDedup.ingestBatch)
    val survivors = NearDupIndex
      .newDocs(batch, indexPath, minSim)
      .persist()
    try {
      survivors.write.mode("append").parquet(acceptedPath)
      NearDupIndex.update(survivors, indexPath)
    } finally {
      survivors.unpersist()
      ()
    }
  }

  /** The streaming ingest sink: call `.start()` to run. Requires `doc_id`
    * and `text` columns; all other columns pass through. */
  def ingest(
      stream: DataFrame,
      indexPath: String,
      acceptedPath: String,
      checkpointDir: String,
      minSim: Double = 0.8): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        ingestBatch(b.toDF(), indexPath, acceptedPath, minSim)
      }
}
