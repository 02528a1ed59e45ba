package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line peak concurrency — "how many intervals were open AT
  * ONCE, and when did the peak first happen?": the capacity-planning
  * question (max simultaneous sessions / calls / jobs) that a
  * self-join over overlapping intervals answers quadratically and a
  * boundary sweep answers in one sorted pass.
  *
  * Formulation: each HALF-OPEN interval [start, end) explodes to two
  * boundary events (+1 at start, −1 at end); a group-partitioned
  * running sum ordered by (t, delta) is the live-interval count at
  * every boundary. Ordering deltas ASCENDING puts the −1s first at a
  * tied instant, so an interval ending exactly where another starts
  * never counts as overlap — the half-open contract, decided by the
  * sort key rather than a filter. Ties among identical (t, delta)
  * rows need no further tiebreak: the running sum walks +1,+2,…
  * through them in any order, so the MULTISET of counts — and
  * therefore the peak and its first-attainment time — is
  * deterministic.
  *
  * Scale shape: one explode (2 rows per interval, row-local), one
  * group-keyed window shuffle, one aggregate join. The window is
  * always PARTITIONED by the group key — a global sweep is a
  * single-partition sort at 100 TB; callers wanting a corpus-wide
  * peak bucket time into coarse epochs as the group and merge
  * per-bucket peaks with carry-in counts. */
object SweepLine {

  /** (group, peak, t_peak) — `peak` = max concurrent intervals,
    * `t_peak` = earliest boundary instant attaining it. Integer
    * timestamps in, integer timestamps out (µs by convention). */
  def peakConcurrency(df: DataFrame, group: Column, startUs: Column,
      endUs: Column): DataFrame = {
    val ev = df
      .select(group.as("g"), explode(array(
        struct(startUs.cast("long").as("t"), lit(1).as("d")),
        struct(endUs.cast("long").as("t"), lit(-1).as("d")))).as("e"))
      .select(col("g"), col("e.t").as("t"), col("e.d").as("d"))
    val w = Window.partitionBy("g").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = ev.withColumn("c", sum("d").over(w))
    val peaks = run.groupBy("g").agg(max("c").as("peak"))
    run.join(peaks, Seq("g"))
      .filter(col("c") === col("peak"))
      .groupBy("g")
      .agg(min(col("peak")).cast("long").as("peak"), min("t").as("t_peak"))
  }
}
