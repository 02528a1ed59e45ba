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
  * are the skew risk — cap them upstream or raise the width.
  *
  * Semantics: half-open `[lo, hi)`, NULL point/bounds rows drop (SQL join
  * semantics). Inputs must not already carry a `__bin` column.
  */
object RangeJoin {

  /** @param wideBinThreshold intervals spanning more than this many bins
    *   take a broadcast nested-loop side path instead of exploding: a
    *   whole-range interval would otherwise replicate into every bin (the
    *   skew the scaladoc warns about — one degenerate row becoming 10⁶
    *   exploded rows in one task). Economics: replicating b bins costs b
    *   shuffled rows; broadcasting the interval costs one test per point —
    *   past the threshold the broadcast is strictly cheaper, and intervals
    *   that wide are few by construction (each covers ≥ threshold×width of
    *   the value domain). Results are identical; the two sides union. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      wideBinThreshold: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(wideBinThreshold > 0, s"bad wideBinThreshold: $wideBinThreshold")
    val bin = (c: org.apache.spark.sql.Column) => floor(c / binWidth).cast("long")
    val contains =
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    val spanBins = bin(col(hiCol)) - bin(col(loCol)) + 1
    val p = points.withColumn("__bin", bin(col(pointCol)))
    // hi is exclusive but floor(hi/w) can still contain points < hi, so the
    // interval's bin range is inclusive of the hi bin
    val narrow = intervals.filter(spanBins <= wideBinThreshold)
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val binned = p.join(narrow, "__bin").filter(contains).drop("__bin")
    val wide = intervals.filter(spanBins > wideBinThreshold)
    // The emptiness probe is one limit-1 scan of the interval side (cheap —
    // the span predicate pushes into it); it keeps the common all-narrow
    // case's plan free of a vestigial nested-loop node. It runs a tiny job
    // at CONSTRUCTION time, which a streaming interval side cannot do —
    // there the union is kept unconditionally (correctness over plan
    // cosmetics; dropping wide intervals unseen would lose rows).
    if (!intervals.isStreaming && wide.isEmpty) binned
    else binned.unionByName(points.join(broadcast(wide), contains))
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
    * two inputs (aside from neither carrying `__bin`). */
  def intervalOverlap(
      a: DataFrame, loA: String, hiA: String,
      b: DataFrame, loB: String, hiB: String,
      binWidth: Double,
      wideBinThreshold: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(wideBinThreshold > 0, s"bad wideBinThreshold: $wideBinThreshold")
    val bin = (c: org.apache.spark.sql.Column) => floor(c / binWidth).cast("long")
    val overlaps = col(loA) < col(hiB) && col(loB) < col(hiA)
    val spanA = bin(col(hiA)) - bin(col(loA)) + 1
    val spanB = bin(col(hiB)) - bin(col(loB)) + 1
    // same wide-interval escape hatch as pointInInterval: a degenerate
    // whole-range interval on either side would explode into span/binWidth
    // rows. Decomposition — narrow×narrow through the binned join; wideA
    // against ALL of b, and narrowA against wideB, through broadcast (wide
    // rows are few by construction: each covers ≥ threshold×width of the
    // domain). The three parts partition the pair space, so exactly-once
    // still holds without a distinct.
    val narrowA = a.filter(spanA <= wideBinThreshold)
    val narrowB = b.filter(spanB <= wideBinThreshold)
    val wideA = a.filter(spanA > wideBinThreshold)
    val wideB = b.filter(spanB > wideBinThreshold)
    val ea = narrowA.withColumn("__bin", explode(sequence(bin(col(loA)), bin(col(hiA)))))
    val eb = narrowB.withColumn("__bin", explode(sequence(bin(col(loB)), bin(col(hiB)))))
    val binned = ea.join(eb, "__bin")
      .filter(overlaps && col("__bin") === greatest(bin(col(loA)), bin(col(loB))))
      .drop("__bin")
    // construction-time emptiness probe as in pointInInterval; skipped
    // (union kept unconditionally) when either side is streaming
    val anyWide = a.isStreaming || b.isStreaming ||
      !wideA.isEmpty || !wideB.isEmpty
    if (!anyWide) binned
    else binned
      .unionByName(broadcast(wideA).join(b, overlaps))
      .unionByName(narrowA.join(broadcast(wideB), overlaps))
  }
}
