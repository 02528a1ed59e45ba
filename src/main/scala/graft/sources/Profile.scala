package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the "look before you build" op every
  * analytics engine ships: null counts, exact distinct counts, and
  * stringified min/max per column, as one row per column.
  *
  * Shape: a SINGLE aggregation over the table computes every statistic
  * (the per-column count-distincts share one Expand — no per-column
  * rescans), then a row-local `stack` unpivots the 1-row result into the
  * (column, stats) layout. At 100 TB the exact distincts are the knob to
  * watch: each adds an Expand replica of the scan stream; swap
  * `countDistinct` for `approx_count_distinct` via `exact = false` when
  * profiling very wide fact tables — same output schema, sketch-accurate
  * counts, no Expand.
  *
  * min/max are rendered as strings so heterogeneous column types share one
  * schema; numeric formatting follows each engine's literal rendering, so
  * oracle-checked uses pin the CAST on both sides.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_s, max_s)"))
  }
}
