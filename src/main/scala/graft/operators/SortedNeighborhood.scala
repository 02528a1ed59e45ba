package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995,
  * "The merge/purge problem") — the record-linkage blocking method the
  * dedup tier lacked: MinHash/SimHash (q31/q32) key on CONTENT
  * overlap, PassJoin (q139) on global edit distance; sorted
  * neighborhood keys on SORT-ORDER PROXIMITY — sort the records by a
  * discriminating key and compare only rows within a window of w
  * positions. Its power and its documented blind spot are the same
  * fact: near-dups whose keys sort apart (a typo in the FIRST
  * character) are never compared — spec-pinned, and the reason
  * production runs multiple passes with different keys.
  *
  * Distributed shape: a GLOBAL sort rank is a single-partition window
  * (the registry lint's exact target), so the rank is taken PER BLOCK
  * (the standard composition: block on a coarse prefix, sort-
  * neighborhood within) — one block-partitioned window shuffle. The
  * pair join is NOT a rank-band theta join: ranks bucket by
  * `rank div W` (W = w−1, the max gap) and a qualifying pair's buckets
  * differ by at most 1, so the left side replicates to (b, b+1) — an
  * EQUI-join with fan-out 2, the q225 grid discipline in one
  * dimension — and the gap test runs as a residual. */
object SortedNeighborhood {

  /** Candidate pairs (id1, id2, key1, key2, rank gap ≤ w−1) within
    * each block, id1 before id2 in RANK order (rank ties broken by id,
    * so the output is deterministic). Callers verify candidates with
    * whatever similarity the linkage needs (q254 bounds levenshtein). */
  def pairs(df: DataFrame, idCol: String, keyCol: String, blockCol: Column,
      w: Int): DataFrame = {
    require(w >= 2, s"window must cover at least 2 records, got $w")
    val big = w - 1 // max rank gap
    val ranked = df
      .select(col(idCol).as("id"), col(keyCol).as("key"),
        blockCol.as("block"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("block").orderBy(col("key"), col("id"))))
    // `div`, not `/`: Column / is double division (the q217 discipline)
    val bucket = expr(s"(rn - 1) div $big")
    val left = ranked
      .select(col("id").as("id1"), col("key").as("key1"),
        col("block"), col("rn").as("rn1"),
        explode(array(bucket, bucket + 1)).as("b"))
    val right = ranked
      .select(col("id").as("id2"), col("key").as("key2"),
        col("block"), col("rn").as("rn2"), bucket.as("b"))
    left.join(right, Seq("block", "b"))
      .filter(col("rn2") - col("rn1") >= 1 && col("rn2") - col("rn1") <= big)
      .select(col("id1"), col("id2"), col("key1"), col("key2"),
        (col("rn2") - col("rn1")).as("gap"))
  }
}
