package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin bucketing — the scale path for
  * interval joins with NO equi-key.
  *
  * Spark plans a bare `p >= lo AND p < hi` join as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits in the driver's broadcast
  * budget): every point row is tested against every interval — O(n·m) work
  * and a single-task wall on the non-broadcast side. Fine for a 100-row
  * dimension, fatal when the interval table is 10⁶ IP blocks / time ranges
  * / price bands against 100 TB of points.
  *
  * The standard fix (used by every distributed geo/interval engine) is to
  * discretize: pick a bin width, assign each point to the single bin
  * containing it, explode each interval to the bins it overlaps, and
  * equi-join on the bin id. The residual exact predicate filters the bin
  * collisions. Each (point, interval) pair meets in exactly one bin — the
  * point's — so no post-join dedup is needed. The plan becomes a plain
  * shuffled equi-join: partitionable, AQE-skew-splittable, no nested loop
  * anywhere.
  *
  * Bin width tuning is a replication-vs-selectivity dial: an interval
  * produces `ceil(span / binWidth) + 1` rows, a point exactly one. Width ≈
  * the median interval span keeps replication ≤ 2× while making a bin
  * collision a likely true hit. Degenerate/huge intervals (span ≫ width)
  * are the skew risk — they take a broadcast side path, or are excluded by
  * construction via the `maxSpan` hint.
  *
  * Semantics: half-open `[lo, hi)`, NULL point/bounds rows drop (SQL join
  * semantics). Inputs must not already carry a `__bin` column.
  */
object RangeJoin {

  /** True when the caller-declared span bound PROVES every interval stays
    * within the narrow-bin threshold: spanBins = floor(hi/w) − floor(lo/w)
    * + 1 ≤ (hi−lo)/w + 2, so the hint is conservative. */
  private def provedNarrow(
      maxSpan: Double, binWidth: Double, wideBinThreshold: Int): Boolean =
    !maxSpan.isNaN && !maxSpan.isInfinite &&
      maxSpan / binWidth + 2 <= wideBinThreshold

  /** The hi-bin expression for a proved-narrow explode, with the maxSpan
    * data contract enforced in-band: a row whose bin span exceeds the bound
    * the hint promised raises a descriptive error instead of exploding into
    * an unbounded bin range (or, worse, being silently filtered). The guard
    * lives INSIDE the explode's input so column pruning cannot drop it; a
    * truthful caller never pays more than one long comparison per row. */
  private def guardedHiBin(
      loBin: org.apache.spark.sql.Column,
      hiBin: org.apache.spark.sql.Column,
      maxSpan: Double, binWidth: Double): org.apache.spark.sql.Column = {
    val bound = math.ceil(maxSpan / binWidth).toLong + 2
    // NULL bounds pass through (hiBin null ⇒ sequence null ⇒ explode drops
    // the row — the object's documented NULL semantics); without the guard
    // the NULL comparison would fall through to the error branch
    when(loBin.isNull || hiBin.isNull || hiBin - loBin + 1 <= bound, hiBin)
      .otherwise(raise_error(format_string(
        s"interval spans %s bins, violating the declared maxSpan=$maxSpan " +
          s"(binWidth=$binWidth allows at most $bound bins); widen maxSpan " +
          "or drop the hint to restore the broadcast wide-interval path",
        hiBin - loBin + 1)).cast("long"))
  }

  /** @param wideBinThreshold intervals spanning more than this many bins
    *   take a broadcast nested-loop side path instead of exploding: a
    *   whole-range interval would otherwise replicate into every bin (the
    *   skew the scaladoc warns about — one degenerate row becoming 10⁶
    *   exploded rows in one task). Economics: replicating b bins costs b
    *   shuffled rows; broadcasting the interval costs one test per point —
    *   past the threshold the broadcast is strictly cheaper, and intervals
    *   that wide are few by construction (each covers ≥ threshold×width of
    *   the value domain). Results are identical; the two sides union. The
    *   wide side is usually EMPTY — the union costs nothing at execution
    *   (an empty broadcast), it only adds a vestigial BNL node to the plan.
    * @param maxSpan OPT-IN caller hint: an upper bound on `hi - lo`. When
    *   it proves every interval narrow, the wide side path (and its plan
    *   node) is dropped entirely WITHOUT any construction-time probe — a
    *   data-dependent `isEmpty` here would full-scan the interval table at
    *   plan-build time just for plan cosmetics. The hint is a DATA
    *   CONTRACT, enforced at execution: an interval wider than declared
    *   raises a descriptive error from inside the scan (one comparison per
    *   interval row, fused into the explode so it cannot be pruned) —
    *   loud failure, never silently dropped rows, and never the unbounded
    *   bin explosion a whole-domain interval would otherwise cause once
    *   the broadcast escape hatch is compiled out. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      wideBinThreshold: Int = 1024,
      maxSpan: Double = Double.PositiveInfinity): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(wideBinThreshold > 0, s"bad wideBinThreshold: $wideBinThreshold")
    val bin = (c: org.apache.spark.sql.Column) => floor(c / binWidth).cast("long")
    val contains =
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    val p = points.withColumn("__bin", bin(col(pointCol)))
    // hi is exclusive but floor(hi/w) can still contain points < hi, so the
    // interval's bin range is inclusive of the hi bin
    val binsOf = (df: DataFrame) =>
      df.withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    if (provedNarrow(maxSpan, binWidth, wideBinThreshold)) {
      val checked = intervals.withColumn("__bin", explode(sequence(
        bin(col(loCol)),
        guardedHiBin(bin(col(loCol)), bin(col(hiCol)), maxSpan, binWidth))))
      p.join(checked, "__bin").filter(contains).drop("__bin")
    } else {
      val spanBins = bin(col(hiCol)) - bin(col(loCol)) + 1
      val narrow = binsOf(intervals.filter(spanBins <= wideBinThreshold))
      val wide = intervals.filter(spanBins > wideBinThreshold)
      p.join(narrow, "__bin").filter(contains).drop("__bin")
        .unionByName(points.join(broadcast(wide), contains))
    }
  }

  /** Interval-overlap join through the same binning, with the standard
    * dedup-free trick: two overlapping intervals share EVERY bin between
    * the later start and the earlier end, so a naive bin equi-join emits
    * the pair once per shared bin. Rather than a post-join `distinct`
    * (a second shuffle over the full result), each pair is kept only in
    * its FIRST shared bin — `max(bin(loA), bin(loB))`, which both sides
    * are guaranteed to cover — making the output exactly-once by
    * construction. Overlap is half-open: `[loA,hiA) ∩ [loB,hiB) ≠ ∅` ⇔
    * `loA < hiB && loB < hiA`. Column names must be disjoint between the
    * two inputs (aside from neither carrying `__bin`).
    *
    * `maxSpanA`/`maxSpanB` are the same opt-in narrow-proof hints as
    * [[pointInInterval]]'s `maxSpan`, one per side: a proved-narrow side
    * skips its span filter and its broadcast union branch with no
    * construction-time scan, and enforces the declared bound in-band (a
    * wider-than-declared row raises a descriptive error — see
    * [[pointInInterval]]); an unproved side keeps the unconditional
    * union (the usually-empty wide broadcast is nearly free at execution).
    * The three branches partition the pair space — narrow×narrow through
    * the bins, wideA against ALL of b, narrowA against wideB — so
    * exactly-once holds without a distinct. */
  def intervalOverlap(
      a: DataFrame, loA: String, hiA: String,
      b: DataFrame, loB: String, hiB: String,
      binWidth: Double,
      wideBinThreshold: Int = 1024,
      maxSpanA: Double = Double.PositiveInfinity,
      maxSpanB: Double = Double.PositiveInfinity): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(wideBinThreshold > 0, s"bad wideBinThreshold: $wideBinThreshold")
    val bin = (c: org.apache.spark.sql.Column) => floor(c / binWidth).cast("long")
    val overlaps = col(loA) < col(hiB) && col(loB) < col(hiA)
    val spanA = bin(col(hiA)) - bin(col(loA)) + 1
    val spanB = bin(col(hiB)) - bin(col(loB)) + 1
    val aProved = provedNarrow(maxSpanA, binWidth, wideBinThreshold)
    val bProved = provedNarrow(maxSpanB, binWidth, wideBinThreshold)
    val narrowA = if (aProved) a else a.filter(spanA <= wideBinThreshold)
    val narrowB = if (bProved) b else b.filter(spanB <= wideBinThreshold)
    val hiABin =
      if (aProved) guardedHiBin(bin(col(loA)), bin(col(hiA)), maxSpanA, binWidth)
      else bin(col(hiA))
    val hiBBin =
      if (bProved) guardedHiBin(bin(col(loB)), bin(col(hiB)), maxSpanB, binWidth)
      else bin(col(hiB))
    val ea = narrowA.withColumn("__bin", explode(sequence(bin(col(loA)), hiABin)))
    val eb = narrowB.withColumn("__bin", explode(sequence(bin(col(loB)), hiBBin)))
    val binned = ea.join(eb, "__bin")
      .filter(overlaps && col("__bin") === greatest(bin(col(loA)), bin(col(loB))))
      .drop("__bin")
    val withWideA =
      if (aProved) binned
      else binned.unionByName(
        broadcast(a.filter(spanA > wideBinThreshold)).join(b, overlaps))
    if (bProved) withWideA
    else withWideA.unionByName(
      narrowA.join(broadcast(b.filter(spanB > wideBinThreshold)), overlaps))
  }
}
