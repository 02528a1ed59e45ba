package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted systematic (PPS — probability proportional to size)
  * sampling per stratum — the draw a token-budgeted corpus mix
  * actually needs: q247 samples DOCUMENTS uniformly within quota, but
  * a training mix budgets TOKENS, so a 10k-token document must be
  * proportionally more likely than a 100-token one. Systematic PPS
  * (Madow 1949) is the exact-integer formulation: lay the stratum's
  * items on a line of cumulative weight W, drop k evenly-spaced points
  * p_j = ⌊W·(2j+1) / 2k⌋ (midpoint rule), take the item whose interval
  * contains each point. Every quantity is a BIGINT product/division —
  * no float inclusion probabilities, no seeded RNG, every engine
  * derives the identical sample (the q89/q212 deterministic-shuffle
  * discipline: reruns and oracles see the same draw).
  *
  * An item with weight > W/k can contain several points — that is PPS
  * WITH multiplicity, the stated semantics (the alternative, rejection,
  * breaks the exact-k contract).
  *
  * Order within the stratum is a PINNED multiplicative hash of the id
  * (ties by id), so the "line" is a deterministic shuffle, not storage
  * order — position on the line must not correlate with the weight.
  *
  * Scale shape: one stratum-keyed window (the exclusive cumulative
  * weight), one stratum-sized aggregate (totals), and a BROADCAST join
  * of the points (≤ k per stratum, k is a constant) against the items
  * with the interval test as the residual — the corpus never shuffles
  * for the points. */
object Systematic {

  /** (stratum, j, id, w): point j of the stratum's draw picked item
    * `id`. `allocs` is (stratum, alloc) — e.g. [[Allocate]]'s output —
    * strata with alloc 0 draw nothing. Weights must be positive. */
  def sample(df: DataFrame, stratumCol: String, idCol: String,
      weightCol: Column, allocs: DataFrame): DataFrame = {
    val items = df.select(col(stratumCol).as("stratum"),
      col(idCol).as("id"), weightCol.cast("long").as("w"))
      // positivity is ENFORCED, not assumed: a non-positive weight makes
      // the cumulative line non-monotone, and one point can then satisfy
      // TWO intervals — duplicate draws that silently break exact-k
      .filter(assert_true(col("w") >= 1,
        lit("Systematic.sample: weights must be positive")).isNull)
    // pre-reduce the key mod p BEFORE the multiply (the q258 overflow
    // discipline): a raw hash-derived id past ~1.9e14 would overflow
    // LONG in id*48271 and throw under ANSI — pmod(id,p) < p keeps the
    // product ≤ ~4.8e13. Same permutation for ids < p (the common
    // case), and the q256 oracle mirrors the pre-reduced form.
    val byLine = Window.partitionBy("stratum")
      .orderBy(pmod(pmod(col("id"), lit(1000000007L)) * lit(48271L),
        lit(1000000007L)), col("id"))
    val ranked = items.withColumn("cexcl",
      coalesce(sum(col("w")).over(
        byLine.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val totals = items.groupBy("stratum").agg(sum(col("w")).as("tot"))
    val points = allocs
      .select(col("stratum"), col("alloc").cast("long").as("alloc"))
      .filter(col("alloc") >= 1)
      .join(totals, Seq("stratum"))
      .select(col("stratum"), col("alloc"), col("tot"),
        explode(sequence(lit(0L), col("alloc") - 1)).as("j"))
      .select(col("stratum"), col("j"),
        expr("tot * (2 * j + 1) div (2 * alloc)").as("p"))
    ranked.join(broadcast(points), Seq("stratum"))
      .filter(col("p") >= col("cexcl") && col("p") < col("cexcl") + col("w"))
      .select(col("stratum"), col("j"), col("id"), col("w"))
  }
}
