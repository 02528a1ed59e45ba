package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union (merge overlapping/touching intervals per key) — the
  * gaps-and-islands MERGE, the third member of the interval toolkit
  * beside q222's sweep-line (how many overlap NOW) and q248's
  * day-streaks (consecutive integer runs): "how much time did each key
  * actually cover, in how many contiguous stretches, and where is the
  * biggest hole?" — billing (covered hours), SLA (uptime stretches),
  * session stitching, and availability reports all reduce to it.
  *
  * Formulation (all one key-partitioned sort order, three frames over
  * it): an interval starts a NEW island iff its start lies strictly
  * past the running maximum end of every earlier interval (running max
  * over the preceding frame — NOT lag(end): an earlier long interval
  * can swallow its successor, the classic wrong-answer); island id =
  * running count of starts; islands aggregate to [min start, max end];
  * gaps are lead(start) − end over the island rows. Touching intervals
  * (next.start == prev.end) MERGE — half-open [s, e) semantics,
  * spec-pinned.
  *
  * Scale shape: ONE key-keyed window shuffle (both windows and the
  * island aggregate share the partitioning); the gap pass runs over
  * island rows (merged, ≤ input). All integer µs — no calendar, no
  * floats. */
object Intervals {

  /** Per-key coverage report: (key, n_intervals, n_islands, covered_us,
    * max_gap_us) — max_gap_us 0 for single-island keys. Intervals are
    * half-open [start, end), start ≤ end required (enforced). */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val guarded = df.filter(
      assert_true(col(startCol) <= col(endCol),
        lit("Intervals.coverage: start > end")).isNull)
    val islands = guarded
      .withColumn("__new", when(prevMaxEnd.isNull ||
        col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__isl"))
      .agg(count(lit(1)).as("__n"), min(col(startCol)).as("__s"),
        max(col(endCol)).as("__e"))
    val byIsland = Window.partitionBy(col(keyCol)).orderBy(col("__s"))
    islands
      .withColumn("__gap",
        coalesce(lead(col("__s"), 1).over(byIsland) - col("__e"), lit(0L)))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered_us"),
        max(col("__gap")).as("max_gap_us"))
  }
}
