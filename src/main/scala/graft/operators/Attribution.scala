package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch marketing attribution — credit each conversion to the
  * channel of the user's MOST RECENT touch within a lookback window,
  * or "direct" when no touch qualifies: the revenue-allocation readout
  * every growth dashboard runs, and the funnel family's (q216/q220)
  * money-counting sibling.
  *
  * Formulation: touches and conversions union into one user-ordered
  * event stream; a running `last(touch, ignoreNulls)` window carries
  * the latest touch (ts + channel) onto every row, so each conversion
  * row reads its own attribution without a join — the as-of-join
  * semantics expressed as one window pass (the AsOf.scala pattern
  * specialized to same-stream attribution). The lookback test is then
  * row-local integer arithmetic; a stale touch (older than the
  * window) yields "direct", same as no touch at all.
  *
  * Ordering is total — (ts, tiebreak) — and a touch TIED with the
  * conversion instant counts (<=, the industry convention: a click
  * that lands with the purchase still gets credit).
  *
  * Scale shape: one user-keyed window shuffle over touches +
  * conversions (already event-sized, not corpus-sized), then one
  * channel aggregate with map-side combine. */
object Attribution {

  /** (channel, n_conversions, revenue) — `touch`/`conv` mark row kind,
    * `tsUs` integer microseconds, `revenue` integer units folded only
    * on conversion rows, `lookbackUs` the qualification window. */
  def lastTouch(events: DataFrame, userCol: String, tsUs: Column,
      tiebreak: Column, isTouch: Column, channel: Column, isConv: Column,
      revenue: Column, lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookback must be positive: $lookbackUs")
    val tagged = events.select(col(userCol), tsUs.as("__ts"),
        tiebreak.as("__tb"), isConv.as("__conv"), revenue.as("__rev"),
        when(isTouch, struct(tsUs.as("ts"), channel.as("ch")))
          .otherwise(lit(null)).as("__touch"))
      .withColumn("__last", last("__touch", ignoreNulls = true)
        .over(Window.partitionBy(col(userCol)).orderBy(col("__ts"), col("__tb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    tagged.filter(col("__conv"))
      .select(
        when(col("__last").isNotNull &&
            col("__ts") - col("__last.ts") <= lookbackUs,
          col("__last.ch")).otherwise(lit("direct")).as("channel"),
        col("__rev"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conversions"),
        sum("__rev").as("revenue"))
  }
}
