package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llm.DedupIndex

/** Streaming maintenance of the persisted exact-dedup index
  * ([[graft.llm.DedupIndex]]): a `foreachBatch` ingest loop that screens
  * each micro-batch against the index, appends the survivors to an
  * accepted-corpus sink, and appends their digests to the index — so every
  * later batch (and every later RUN: both index and corpus are persistent)
  * dedups against everything ever accepted. This closes the incremental-
  * ingest story on the streaming surface: the batch operators compose
  * verbatim inside the sink, and [[StreamingDedupSpec]] pins the streaming
  * result to the batch-sequential composition.
  *
  * Per batch the history side costs index-bytes (32 B/doc), never corpus
  * bytes — the whole point of the index ([[DedupIndex]] scaladoc). The
  * `foreachBatch` body is a BATCH plan, so nothing here fights the
  * streaming engine's state store; the state IS the index.
  *
  * Failure semantics (accepted-write happens BEFORE index-update,
  * deliberately): a batch replayed after BOTH writes committed is a no-op —
  * its digests are in the index, so the screen drops every doc. A crash
  * BETWEEN the two writes makes the replay re-append the same survivors to
  * the accepted corpus (at-least-once; recover with
  * [[graft.llm.Dedup.exactDedup]] over the accepted path). The reverse
  * order would instead LOSE the batch on the same crash (index already
  * claims the digests, so the replay screens out docs that were never
  * written) — duplicates are recoverable, loss is not. The index path
  * inherits [[DedupIndex.update]]'s single-writer contract: one ingest
  * query per index.
  */
object StreamingDedup {

  /** One micro-batch of index-backed ingest — exactly what the streaming
    * sink runs, exposed so the batch-sequential path is the SAME code:
    * collapse within-batch copies (the index only knows history; two copies
    * of a new doc in one batch would otherwise both survive), screen
    * against the index, append survivors to `acceptedPath`, append their
    * digests to the index. Which of several within-batch copies survives is
    * arbitrary (same contract as `dropDuplicates`). */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      acceptedPath: String,
      expectedHistoryRows: Long = 1000000L,
      fpp: Double = 0.01): Unit = {
    val once = batch
      .withColumn("__h", sha2(col("text"), 256))
      .dropDuplicates("__h")
      .drop("__h")
    // materialize the survivor set ONCE: its plan reads the index, and the
    // index-update below must append the digests of the SAME rows the
    // accepted sink got (an unpersisted plan would re-screen after the
    // index already grew and return nothing)
    val survivors = DedupIndex
      .incrementalNewDocs(once, indexPath, expectedHistoryRows, fpp)
      .persist()
    try {
      survivors.write.mode("append").parquet(acceptedPath)
      DedupIndex.update(survivors, indexPath)
    } finally {
      survivors.unpersist()
      ()
    }
  }

  /** The streaming ingest sink: call `.start()` (optionally after a
    * `.trigger(...)`) to run. Requires a `text` column; all other columns
    * pass through to the accepted corpus. */
  def ingest(
      stream: DataFrame,
      indexPath: String,
      acceptedPath: String,
      checkpointDir: String,
      expectedHistoryRows: Long = 1000000L,
      fpp: Double = 0.01): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        ingestBatch(b.toDF(), indexPath, acceptedPath,
          expectedHistoryRows, fpp)
      }
}
