package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) quota allocation — split a fixed
  * budget of k slots across strata proportionally to their weights,
  * in INTEGERS that sum to exactly k: the sampling-plan primitive
  * behind "draw 1M training docs across languages by corpus share"
  * (the allocation q74's domain mixing consumes) and every
  * seats-by-population problem. Naive rounding leaves slots lost or
  * invented; Hamilton gives each stratum ⌊k·wᵢ/W⌋ and hands the
  * leftover slots to the largest remainders, one each.
  *
  * All integer: base = (k·wᵢ) div W, remainder = (k·wᵢ) mod W,
  * leftover = k − Σbase < n_strata by construction; ties on the
  * remainder break by stratum key ascending (deterministic reruns —
  * an unstated tie rule is a flaky allocation). Overflow: k·wᵢ must
  * fit BIGINT — k ≤ 10⁹ against corpus-sized weights holds with 10⁸×
  * headroom.
  *
  * Scale shape: strata are GROUP-sized (languages, domains, sources —
  * never corpus-sized; ASSERTED ≤ 10⁵, violations raise), so the
  * remainder ranking runs DRIVER-SIDE over the collected strata frame
  * — the pinned-codebook precedent: a bounded collect by construction
  * beats a deliberately-unpartitioned window that moves the same rows
  * to one partition anyway (and trips the registry's scale lint).
  * The heavy side — computing wᵢ — is the caller's one aggregate. */
object Allocate {

  val MaxStrata = 100000L

  /** (stratum, weight, base, rem_rank, alloc) with Σalloc = k exactly. */
  def largestRemainder(weights: DataFrame, stratum: String, weight: Column,
      k: Long): DataFrame = {
    require(k >= 0, s"bad budget: $k")
    val spark = weights.sparkSession
    import spark.implicits._
    val w = weights.select(col(stratum).as("stratum"),
      weight.cast("long").as("w"))
    val rows = w.as[(String, Long)].collect()
    require(rows.length <= MaxStrata,
      s"${rows.length} strata — allocation frames are strata-sized by contract")
    val tot = rows.map(_._2).sum
    require(tot > 0, "total weight must be positive")
    val based = rows.map { case (s, wi) =>
      (s, wi, k * wi / tot, k * wi % tot)
    }
    val leftover = k - based.map(_._3).sum
    val ranked = based.sortBy { case (s, _, _, rem) => (-rem, s) }
      .zipWithIndex
      .map { case ((s, wi, base, _), i) =>
        val rank = i + 1
        (s, wi, base, rank, base + (if (rank <= leftover) 1L else 0L))
      }
    spark.createDataFrame(ranked.toSeq)
      .toDF("stratum", "weight", "base", "rem_rank", "alloc")
  }
}
