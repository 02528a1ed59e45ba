package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history build — collapse a stack
  * of full table snapshots (one per generation) into per-key validity
  * intervals [gen_from, gen_to): the warehouse op that turns "what did
  * the table look like at every load?" storage into "when was THIS
  * version current?" queries. q215's drift report diffs two adjacent
  * snapshots; this folds ALL generations into the dimension history a
  * point-in-time join consumes.
  *
  * Formulation: a version boundary is any generation whose tracked
  * attributes differ (null-safely) from the key's previous generation
  * — one lag window; consecutive equal generations collapse into runs
  * via a cumulative boundary count — same window frame; each run
  * aggregates to one interval row, and gen_to = the next run's
  * gen_from (lead over the run rows, null = still current). A key
  * absent from a generation simply has no row there — its current run
  * ends at the next generation it reappears with different attributes
  * (attribute-equal reappearance extends the run: snapshots are
  * versioned STATES, not events).
  *
  * Scale shape: both windows and the run aggregate are KEY-partitioned
  * — one key-keyed shuffle, state per row is one lag tuple + a
  * counter; the lead pass runs over the interval rows (versions, not
  * snapshots). No self-join of snapshot stacks (the naive
  * k-generations formulation is k−1 full-table diff joins). */
object Scd {

  /** (key, gen_from, gen_to, attrs…) — `gen_to` exclusive, null while
    * current. `attrs` are the tracked columns; any other input column
    * is dropped (history rows carry the version's attributes only). */
  def type2History(snapshots: DataFrame, keyCol: String, genCol: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val byGen = Window.partitionBy(col(keyCol)).orderBy(col(genCol))
    // null-safe "any attribute changed vs the key's previous snapshot";
    // the key's first snapshot row has lag NULL on every attr — covered
    // by the negated null-safe equality only when the attr itself is
    // non-null, so OR an explicit first-row test rather than rely on it
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(byGen)))
      .reduce(_ || _) || lag(col(genCol), 1).over(byGen).isNull
    val runs = snapshots
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__run", sum("__chg").over(
        byGen.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = runs
      .groupBy(col(keyCol), col("__run"))
      .agg(min(col(genCol)).as("gen_from"),
        attrs.map(a => first(col(a)).as(a)): _*)
    val byFrom = Window.partitionBy(col(keyCol)).orderBy(col("gen_from"))
    versions
      .withColumn("gen_to", lead(col("gen_from"), 1).over(byFrom))
      .select(col(keyCol) +: col("gen_from") +: col("gen_to") +:
        attrs.map(col): _*)
  }
}
