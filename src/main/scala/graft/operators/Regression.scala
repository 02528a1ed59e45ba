package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares over INTEGER (x, y) — the trend
  * line every metrics dashboard fits ("is daily quantity drifting
  * up?"), kept hash-exact: the five sufficient statistics
  * (n, Σx, Σy, Σx², Σxy) are BIGINT sums, and slope / intercept are
  * emitted as EXACT INTEGER FRACTIONS
  *
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
  *
  * — no float division to hash (the q219 cross-multiplication
  * discipline applied to regression). Callers divide at presentation
  * time; the SIGN of the trend is already decidable on the integers.
  *
  * Overflow contract: with |x| ≤ X, |y| ≤ Y, n rows per group, the
  * largest folded term is n·Σx² ≈ n²·X². Callers must CENTER x on a
  * fixed epoch anchor so X stays small (days-from-anchor, not raw
  * epoch-day): at X = 2000, Y = 64 the fractions hold to n ≈ 4×10⁷
  * rows per group; a 100 TB deployment fitting bigger groups switches
  * the FINAL products (not the sums) to DECIMAL(38,0), a cast-only
  * change. Violations overflow loudly under ANSI mode rather than
  * silently wrapping.
  *
  * Scale shape: ONE hash aggregate with map-side partial combine —
  * the five statistics fold associatively, so 1000 executors each
  * fold their partitions and ship five longs per group; the fraction
  * arithmetic is row-local on the group-sized result. No window, no
  * second pass over the data. */
object Regression {

  /** (group, n, sx, sy, sxx, sxy, slope_num, slope_den, icept_num) —
    * `slope_den` is also the intercept denominator. Groups with a
    * degenerate x spread (all x equal → den 0) still emit their
    * statistics; the fraction is the caller's 0/0 to interpret. */
  def olsFractions(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val s = df
      .select(group.as("g"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    s.select(
      col("g"), col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"),
      (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
      (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
      (col("sy") * col("sxx") - col("sx") * col("sxy")).as("icept_num"))
  }
}
