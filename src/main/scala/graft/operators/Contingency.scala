package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2×2 contingency chi-square as exact integer fractions — the A/B
  * test readout ("did the treatment move conversion?") kept
  * hash-exact: for counts a,b,c,d (treatment×outcome), Pearson's
  * statistic with N = a+b+c+d is
  *
  *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
  *
  * — a ratio of two BIGINTs, no float anywhere (the q221/q219
  * discipline applied to hypothesis testing). Significance at any
  * pinned critical value q is the cross-multiplied integer test
  * 100·num ≥ (100q)·den; the engine emits num/den and the p<0.05
  * verdict at χ²₀.₀₅,₁ = 3.84.
  *
  * Overflow contract: worst-case num = N·(N²/4)² = N⁵/16 — BIGINT
  * holds to N ≈ 10⁴ rows per group (real dets sit far below the
  * N²/4 worst case, but the contract states the guarantee, not the
  * luck). Experiment readouts aggregate per metric cell, not per
  * corpus row, so cells stay panel-sized; a bigger panel switches
  * num/den to DECIMAL(38,0) (N ≈ 3×10⁷ worst-case), a cast-only
  * change. Degenerate margins (an empty row or column) emit den = 0
  * — "not testable", never a division.
  *
  * Scale shape: ONE hash aggregate with map-side combine folds the
  * four cells per group (conditional sums); the fraction arithmetic
  * is row-local on the group-sized result. */
object Contingency {

  /** Per group: cell counts (a,b,c,d = treated-hit, treated-miss,
    * control-hit, control-miss), chi2_num, chi2_den, and
    * `sig_05` = the χ² > 3.84 verdict decided on the integers. */
  def chiSquare2x2(df: DataFrame, group: Column, treated: Column,
      hit: Column): DataFrame = {
    def cell(t: Boolean, h: Boolean) =
      sum(when(treated === lit(t) && hit === lit(h), 1L).otherwise(0L))
    val cells = df.groupBy(group.as("g"))
      .agg(cell(t = true, h = true).as("a"), cell(t = true, h = false).as("b"),
        cell(t = false, h = true).as("c"), cell(t = false, h = false).as("d"))
    val n = col("a") + col("b") + col("c") + col("d")
    val det = col("a") * col("d") - col("b") * col("c")
    val den = (col("a") + col("b")) * (col("c") + col("d")) *
      (col("a") + col("c")) * (col("b") + col("d"))
    cells.select(col("g"), col("a"), col("b"), col("c"), col("d"),
      (n * det * det).as("chi2_num"),
      den.as("chi2_den"))
      // χ² ≥ 3.84 ⟺ 100·num ≥ 384·den; den 0 ⇒ not testable ⇒ false
      .withColumn("sig_05",
        col("chi2_den") > 0 &&
          lit(100L) * col("chi2_num") >= lit(384L) * col("chi2_den"))
  }
}
