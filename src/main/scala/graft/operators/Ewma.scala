package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer exponentially-weighted moving average — the smoothing
  * staple of every metrics/monitoring readout (and the q244
  * watermark-tuning / q241 seasonal-profile sibling: those describe a
  * distribution, this tracks its drift), in EXACT INTEGER arithmetic
  * so the result is engine-agnostic and oracle-replayable (the q221
  * discipline — a double fold accumulates rounding that differs
  * between engines by evaluation order).
  *
  * Recurrence, α = 1/8, state carried in 1/64 units for headroom:
  *   s'_1 = 64·x_1
  *   s'_t = (7·s'_{t−1} + 64·x_t) div 8
  * Every term is NON-NEGATIVE by construction (counts in, smoothed
  * counts out), so truncating division (Spark `div`) and flooring
  * division (DuckDB `//`) agree — the recurrence is written to stay in
  * the regime where the two engines' integer division semantics
  * coincide, instead of hoping negative operands never occur.
  *
  * Scale shape: ONE key-keyed aggregate (collect_list of the per-key
  * series, bounded by contract — days of a month, minutes of an hour;
  * an in-plan assert_true refuses series past `maxLen`), then the fold
  * runs as a codegen'd higher-order `aggregate` over the sorted array
  * and `inline` restores rows. No window, no iteration, no UDF. An
  * EWMA is inherently sequential per key — the parallelism is ACROSS
  * keys, which is exactly what the aggregate gives. Cost note: the
  * fold appends via array concat, so a key's series costs O(n²)
  * element copies — fine at the bounded grains this operator is FOR
  * and the reason `maxLen` defaults low; callers must aggregate to a
  * bounded grain first, not raise the cap. */
object Ewma {

  /** (keyCols…, d, x, ewma64): `d` the order column (e.g. epoch-day),
    * `x` the non-negative integer value, `ewma64` the smoothed value
    * in 1/64 units. `maxLen` bounds the per-key series (the collected
    * array) — callers aggregate to a bounded grain first. */
  def smooth(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: String, maxLen: Int = 4096): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val series = df
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(ordCol).cast("long").as("d"),
        col(valCol).cast("long").as("x")))).as("xs"))
      .withColumn("__n", size(col("xs")))
    val folded = series
      .select(keyCols.map(col) :+ col("__n") :+ expr(
        """aggregate(xs,
          |  CAST(array() AS ARRAY<STRUCT<d: BIGINT, x: BIGINT, s: BIGINT>>),
          |  (acc, e) -> concat(acc, array(named_struct(
          |    'd', e.d, 'x', e.x,
          |    's', CASE WHEN size(acc) = 0 THEN 64 * e.x
          |              ELSE (7 * element_at(acc, -1).s + 64 * e.x) div 8
          |         END))))""".stripMargin).as("sm"): _*)
    // the bound is enforced on the plan output, not assumed: a key whose
    // series exceeds maxLen fails the run instead of silently ballooning
    // executor memory (the Allocate.scala contract style)
    val guarded = folded.filter(
      assert_true(col("__n") <= maxLen,
        concat(lit(s"Ewma.smooth: series longer than $maxLen for key "),
          concat_ws(",", keyCols.map(c => col(c).cast("string")): _*)))
        .isNull)
    guarded.select(keyCols.map(col) :+ expr("inline(sm)"): _*)
      .withColumnRenamed("s", "ewma64")
  }
}
