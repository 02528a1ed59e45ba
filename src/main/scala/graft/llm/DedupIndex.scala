package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-dedup history index — the artifact that turns
  * [[Dedup.incrementalNewDocs]] from "rescan 100 TB of history per batch"
  * into "scan a 32 B/doc digest table per batch".
  *
  * The index is a parquet table of one BINARY(32) column `h`: the distinct
  * sha256 digests of every document ever ingested. Both consumers of the
  * history side — the Bloom-filter build and the exact-confirm semi join —
  * only ever STREAM the history scan-side ([[Dedup.incrementalNewDocsByHash]]),
  * so at 1e9 docs a batch screens against ~32 GB of index instead of the
  * corpus' ~100 TB of bodies, and nothing re-computes sha256 over bodies
  * that were hashed at ingest. (Reference analogue: the reference persists
  * and reuses its preprocess outputs across runs rather than recomputing
  * them — `/root/reference/examples/trainer/runner.py:94-101` — this is the
  * same persist-and-reuse shape for the dedup screen.)
  *
  * Layout: plain parquet, NOT a metastore-bucketed table, deliberately.
  * Bucketing pays when a join would otherwise exchange both sides
  * ([[graft.sources.Bucketing]]); here neither consumer exchanges the
  * index in the designed batch ≪ history regime — the Bloom build is a
  * scan-aggregate and the confirm streams the scan past a broadcast,
  * batch-bounded sliver. A metastore table would add a catalog dependency
  * to a path-shaped API for a join shape this operator never plans.
  * `update` appends ONLY genuinely-new digests (anti-join against the
  * existing index), so the index stays duplicate-free without ever being
  * rewritten — append-only, like the ingest it mirrors.
  */
object DedupIndex {

  val HashCol = "h"

  /** sha256 digest as 32 raw bytes (the hex string doubles the footprint). */
  private def digest = unhex(sha2(col("text"), 256))

  /** Hex-string view of the index, the representation
    * [[Dedup.incrementalNewDocsByHash]] screens and confirms on. `hex()`
    * emits uppercase; sha2 emits lowercase — normalize scan-side. */
  private def hashes(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath).select(lower(hex(col(HashCol))).as("__hh"))

  /** Create (or overwrite) the index from a history corpus: one distinct
    * over scan-side digests — the only time the full corpus is read. */
  def build(history: DataFrame, indexPath: String): Unit =
    history.select(digest.as(HashCol)).distinct()
      .write.mode("overwrite").parquet(indexPath)

  /** Append the digests of `newDocs` that the index has not seen. Run after
    * each accepted batch; repeated updates with the same batch are no-ops
    * (the anti-join keeps the index duplicate-free).
    *
    * SINGLE-WRITER contract: the read and the append target the same path
    * in one job — file listing happens at plan time and new files commit at
    * job end, so a lone sequential caller is safe, but (a) a failed write
    * can leave partial files a later read picks up, and (b) two CONCURRENT
    * updates can both pass the anti-join and insert the same digest,
    * silently weakening the duplicate-free invariant (dedup results stay
    * correct — a duplicate index row only re-screens the same digest).
    * Serialize updates per index path; on write failure, rebuild via
    * [[build]] or clear the partial files before the next update. */
  def update(newDocs: DataFrame, indexPath: String): Unit = {
    val spark = newDocs.sparkSession
    newDocs.select(digest.as(HashCol)).distinct()
      .join(spark.read.parquet(indexPath), Seq(HashCol), "left_anti")
      .write.mode("append").parquet(indexPath)
  }

  /** Index-backed incremental dedup: exactly [[Dedup.incrementalNewDocs]]'s
    * output when the index holds the history's digests (the Bloom screen
    * and the exact confirm both key on the same sha256 values, so the two
    * paths are value-identical — q93 oracle + DedupIndexSpec), at index-
    * bytes cost per batch instead of corpus-bytes. */
  def incrementalNewDocs(
      newDocs: DataFrame,
      indexPath: String,
      expectedHistoryRows: Long = 1000000L,
      fpp: Double = 0.01): DataFrame =
    Dedup.incrementalNewDocsByHash(
      newDocs, hashes(newDocs.sparkSession, indexPath),
      expectedHistoryRows, fpp)
}
