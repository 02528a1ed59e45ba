package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve indexing: interleave two bucketed integer
  * columns bit-by-bit so that a SORT on the resulting key clusters BOTH
  * dimensions at once — each parquet row group then spans a small
  * square of the (x, y) plane instead of a thin stripe, and either
  * dimension's predicate prunes most groups (the `--zorder` ScaleStress
  * curve measures the layout side; Delta's OPTIMIZE ZORDER is the same
  * shape).
  *
  * This module adds the QUERY side: [[intervals]] decomposes a 2D box
  * predicate into a bounded set of disjoint z-ranges (a quadtree
  * descent — the budget-bounded version of Tropf & Herzog's BIGMIN
  * region splitting), and [[boxFilter]] turns them into
  * `z BETWEEN lo AND hi OR …` predicates that parquet row-group
  * min/max statistics CAN prune on a z-sorted layout — a plain
  * `x BETWEEN … AND y BETWEEN …` cannot (each row group's x/y spans
  * are narrow but the FILE-level ordering is on z, so per-column stats
  * stay wide in any one dimension's sort order). The residual exact box
  * predicate is ALWAYS applied, so a coarse budget trades IO for
  * nothing else: results are exact at every budget.
  *
  * Determinism: pure integer bit arithmetic end-to-end — bucketing,
  * interleave, and range splitting are all exact.
  *
  * Scale shape: [[zColumn]] is plain codegen'd bitwise Columns (no
  * UDF); [[intervals]] runs on the DRIVER over quad counts bounded by
  * the budget (≤ 4·budget expansions), independent of data size;
  * the scan-side predicate is a pushed-down OR of range filters. */
object ZCurve {

  /** Max bits per dimension (two 16-bit dims → one 32-bit z key). */
  val MaxBits = 16

  private def checkBits(bits: Int): Unit =
    require(bits >= 1 && bits <= MaxBits, s"bits must be in [1, $MaxBits]: $bits")

  /** Spread the low 16 bits of x to the even bit positions (the classic
    * magic-bits dilation; driver-side twin of the Column variant). */
  private[operators] def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    (x | (x << 1)) & 0x55555555L
  }

  /** Inverse of [[spread]]: collect the even bit positions back. */
  private[operators] def compact(v: Long): Long = {
    var x = v & 0x55555555L
    x = (x | (x >> 1)) & 0x33333333L
    x = (x | (x >> 2)) & 0x0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ffL
    (x | (x >> 8)) & 0x0000ffffL
  }

  /** z-value of one (x, y) cell — x on even bits, y on odd. */
  def zValue(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** (x, y) cell of one z-value. */
  def unzValue(z: Long): (Long, Long) = (compact(z), compact(z >> 1))

  /** Morton key Column: interleave the low 16 bits of two non-negative
    * integer columns (caller buckets wider domains first). A custom
    * codegen'd Expression — ONE static call per evaluation site — not
    * a Column-built dilation: when the z-range filter is pushed
    * through the projection, Catalyst substitutes z's expression into
    * EVERY range term, and both Column forms failed at that
    * multiplication (r14, measured): the magic-bits chain doubles its
    * tree per step and overflowed janino outright; the linear per-bit
    * sum compiled into a method so large HotSpot refused to JIT it
    * and the stage ran interpreted bytecode at ~50× cpu. The call
    * form keeps every site 4 bytes of codegen and the dilation in one
    * JIT-hot method ([[zValue]], via the object's static forwarder).
    *
    * PRECONDITION: `call_function` resolves through the ACTIVE session's
    * function registry, so `GraftFunctions.register(spark)` must have run
    * on that session first — otherwise analysis fails with
    * UNRESOLVED_ROUTINE. Prefer the `zColumn(spark, x, y)` overload,
    * which registers idempotently and has no such footgun. */
  def zColumn(x: Column, y: Column): Column =
    call_function(graft.functions.GraftFunctions.MortonName,
      x.cast("long"), y.cast("long"))

  /** [[zColumn]] with the registration precondition discharged: registers
    * the graft function set on `spark` (idempotent, cheap) before building
    * the Column, so fresh sessions and new call sites can't hit
    * UNRESOLVED_ROUTINE. */
  def zColumn(spark: org.apache.spark.sql.SparkSession, x: Column,
      y: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    zColumn(x, y)
  }

  /** Decompose the inclusive box [x0,x1]×[y0,y1] (cell coordinates in
    * [0, 2^bits)) into at most `budget` disjoint, sorted, inclusive
    * z-ranges whose union CONTAINS every box cell. The descent expands
    * quads breadth-first and stops when one more wave could exceed the
    * budget; still-partial quads emit their whole range (a superset —
    * exactness is restored by the residual predicate). With a generous
    * budget the union is exact (spec-pinned by exhaustion). */
  def intervals(x0: Long, x1: Long, y0: Long, y1: Long, bits: Int,
      budget: Int = 64): Seq[(Long, Long)] = {
    checkBits(bits)
    require(budget >= 1, s"bad budget: $budget")
    val lim = 1L << bits
    require(0 <= x0 && x0 <= x1 && x1 < lim, s"bad x box: [$x0,$x1] at $bits bits")
    require(0 <= y0 && y0 <= y1 && y1 < lim, s"bad y box: [$y0,$y1] at $bits bits")
    // quad = (cx, cy, level): cells [cx<<level, (cx+1)<<level) per axis
    final case class Quad(cx: Long, cy: Long, level: Int) {
      def xLo: Long = cx << level
      def xHi: Long = ((cx + 1) << level) - 1
      def yLo: Long = cy << level
      def yHi: Long = ((cy + 1) << level) - 1
      def inside: Boolean = x0 <= xLo && xHi <= x1 && y0 <= yLo && yHi <= y1
      def disjoint: Boolean = xHi < x0 || x1 < xLo || yHi < y0 || y1 < yLo
      def zRange: (Long, Long) =
        (zValue(xLo, yLo), zValue(xLo, yLo) + (1L << (2 * level)) - 1)
    }
    val full = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var partial = List(Quad(0, 0, bits))
    var done = false
    while (!done && partial.nonEmpty && partial.head.level > 0) {
      // one BFS wave: every partial quad splits into 4 children
      if (full.size + partial.size * 4 > budget) done = true
      else {
        val next = scala.collection.mutable.ListBuffer.empty[Quad]
        for (q <- partial; cx <- q.cx * 2 to q.cx * 2 + 1;
             cy <- q.cy * 2 to q.cy * 2 + 1) {
          val c = Quad(cx, cy, q.level - 1)
          if (!c.disjoint) {
            if (c.inside) full += c.zRange else next += c
          }
        }
        partial = next.toList
      }
    }
    // leftover partial quads cover as supersets (level-0 leftovers are
    // single in-box cells, i.e. exact)
    val all = (full ++ partial.map(_.zRange)).sortBy(_._1)
    // merge adjacent/overlapping ranges
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((lo, hi) <- all) {
      if (merged.nonEmpty && lo <= merged.last._2 + 1)
        merged(merged.size - 1) = (merged.last._1, math.max(merged.last._2, hi))
      else merged += ((lo, hi))
    }
    merged.toSeq
  }

  /** Exact box query through the z-index: z-range predicates (pushable
    * to parquet row-group stats on a z-sorted layout) plus the residual
    * exact box predicate. `zCol` must be [[zColumn]] of the same
    * bucketed columns. Exact at every budget. */
  def boxFilter(df: DataFrame, xCol: Column, yCol: Column, zCol: Column,
      x0: Long, x1: Long, y0: Long, y1: Long, bits: Int,
      budget: Int = 64): DataFrame = {
    val ranges = intervals(x0, x1, y0, y1, bits, budget)
    val zPred = ranges.map { case (lo, hi) => zCol.between(lit(lo), lit(hi)) }
      .reduce(_ || _)
    df.filter(zPred &&
      xCol.between(lit(x0), lit(x1)) && yCol.between(lit(y0), lit(y1)))
  }
}
