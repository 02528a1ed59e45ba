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

  /** The numeric companion of [[profile]]: per-column null count, decimal
    * min/max, EXACT decimal sum, and stddev — same one-pass + stack shape.
    * Everything except stddev routes through DECIMAL(18,4) (the repo's
    * money-rounding convention): decimal min/max/sum are value-exact across
    * engines where double formatting and summation order are not. The sum
    * is emitted instead of an average on purpose — decimal sums are exact
    * in both engines while decimal division rounds by engine-specific
    * rules; callers derive mean = sum / (rows − nulls) at whatever
    * precision they need. stddev is inherently a double fold; the decimal
    * cast collapses cross-engine last-ulp noise. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val d = "decimal(18,4)"
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        min(col(c)).cast(d).as(s"__mn_$c"),
        max(col(c)).cast(d).as(s"__mx_$c"),
        sum(col(c).cast(d)).cast("decimal(38,4)").as(s"__sm_$c"),
        stddev_samp(col(c)).cast(d).as(s"__sd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nn_$c`, `__mn_$c`, `__mx_$c`, `__sm_$c`, `__sd_$c`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, min_d, max_d, sum_d, std_d)"))
  }
}
