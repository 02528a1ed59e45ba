package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The exact-distinct/moment profilers are compute-per-row heavy (the
    * Expand replicates the scan stream per distinct column), so a 1-split
    * fixture scan serializes the whole pass — q90 measured 6 tasks with
    * cpu ≈ wall ≈ 6.9 s on 32 cores (bench r9 metrics); spreading halved
    * it (5.5 → 3.1 s A/B) and won on q92/q96/q118 too. Applied ONLY on
    * those measured winners: the lighter passes (arrayProfile, histogram)
    * and the text-analysis explodes LOST the same A/B — their per-row work
    * is too cheap to buy back the extra exchange. No-op for real
    * multi-split tables. */
  private def spread(df: DataFrame): DataFrame =
    graft.operators.Parallelism.spread(df)

  /** Column names are spliced into `stack(...)` SQL text; a quote, backtick
    * or newline would change the query rather than the data. Reject early. */
  private[sources] def validateNames(cols: Seq[String]): Unit = cols.foreach { c =>
    require(c.nonEmpty && !c.exists(ch => ch == '\'' || ch == '`' || ch == '\n' || ch == '\r'),
      s"profile column name must be non-empty and free of quotes/backticks/newlines: '$c'")
  }

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    validateNames(cols)
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = spread(df).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_s, max_s)"))
  }

  /** The numeric companion of [[profile]]: per-column value count, null
    * count, decimal min/max, and the EXACT decimal moments Σx and Σx² —
    * same one-pass + stack shape.
    *
    * Every emitted statistic is VALUE-EXACT across engines, thread counts
    * and partial-aggregation merge orders: counts are integers, min/max are
    * order-free, and the sums fold DECIMAL(18,4) values (squares carry the
    * full scale-8 product, so no intermediate rounding). Derived statistics
    * are deliberately NOT emitted — a mean divides by an engine-specific
    * decimal-division rule, and a standard deviation is an order-dependent
    * double fold whose last-ulp noise can flip a rounding boundary (the
    * round-4 q92 incident: stddev_samp(l_extendedprice) sat 7e-11 relative
    * from its 4-dp boundary and hashed differently on the driver's
    * machine). Callers derive mean = sum_d / n_vals and
    * stddev² = (sumsq_d − sum_d²/n_vals) / (n_vals − 1) at whatever
    * precision they need, in ONE engine, where cross-engine determinism no
    * longer matters.
    */
  /** The ARRAY(FLOAT/DOUBLE) companion for embedding pipelines: per column —
    * null rate, NaN / ±Inf element counts, dimension consistency (distinct /
    * min / max array length), and L2-norm² extremes and total.
    *
    * Determinism design (the q92 lesson applied to vectors): cross-ROW
    * double folds are partial-merge-order-dependent and must never be
    * hashed, but a per-ROW left fold over one array is a fixed double
    * sequence — bit-identical across engines (q26's oracle pins exactly
    * this for dot products). So norm² is computed per row as a strict left
    * fold over the finite elements (widened float→double binarily first —
    * casting float STRAIGHT to decimal would round its shortest-string
    * form, which differs from the double widening); `min`/`max` over rows
    * are order-free on those bit-identical doubles and ship RAW (q41's
    * raw-doubles-pass-through convention), and the one cross-row sum
    * quantizes each row's norm² to DECIMAL(18,6) first so the fold is an
    * exact decimal sum. Norm² rather than norm: sqrt of each row would be
    * fine (deterministic unary), but norm² is what downstream variance /
    * rescaling math consumes and keeps the quantized sum meaningful.
    * NaN/Inf elements are COUNTED but excluded from norms (one NaN would
    * otherwise poison every statistic of its column). */
  def arrayProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "arrayProfile needs at least one column")
    validateNames(cols)
    val aggs = cols.flatMap { c =>
      val arr = col(c).cast("array<double>")
      val isInf = (x: Column) => abs(x) === lit(Double.PositiveInfinity)
      val finite = filter(arr, x => !(isnan(x) || isInf(x)))
      val normsq = aggregate(finite, lit(0.0), (acc, x) => acc + x * x)
      Seq(
        count(col(c)).as(s"__nv_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        coalesce(sum(size(arr)), lit(0L)).as(s"__ne_$c"),
        coalesce(sum(size(filter(arr, x => isnan(x)))), lit(0L)).as(s"__na_$c"),
        coalesce(sum(size(filter(arr, isInf))), lit(0L)).as(s"__ni_$c"),
        countDistinct(size(arr)).as(s"__nd_$c"),
        min(size(arr)).as(s"__mnd_$c"),
        max(size(arr)).as(s"__mxd_$c"),
        min(normsq).as(s"__mnn_$c"),
        max(normsq).as(s"__mxn_$c"),
        // decimal fold for merge-order-free exactness; final DOUBLE cast in
        // the stack below (engine-side DECIMAL outputs can't hash-match —
        // see numericStack's note)
        sum(normsq.cast("decimal(18,6)")).cast("decimal(38,6)").as(s"__sq_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nv_$c`, `__nn_$c`, `__ne_$c`, `__na_$c`, `__ni_$c`, " +
        s"`__nd_$c`, `__mnd_$c`, `__mxd_$c`, `__mnn_$c`, `__mxn_$c`, " +
        s"CAST(`__sq_$c` AS DOUBLE)"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_vals, n_nulls, " +
        "n_elems, n_nan, n_inf, n_dims, min_dim, max_dim, min_normsq, " +
        "max_normsq, sum_normsq_d)"))
  }

  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    validateNames(cols)
    val aggs = numericAggs(cols)
    spread(df).agg(aggs.head, aggs.tail: _*).select(numericStack(cols))
  }

  /** Per-GROUP numeric moments — the per-domain/per-source profile a corpus
    * pipeline actually reads ("how do token counts differ by source?").
    * Identical statistics and determinism contract as [[numericProfile]];
    * the `stack` unpivot is row-local, so grouping changes only the
    * aggregation keys — still ONE pass, one shuffle on the group key with
    * map-side partial aggregation absorbing the per-partition volume.
    * Output: (groupCol, col_name, …stats), one row per group × column. */
  def numericProfileBy(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfileBy needs at least one column")
    validateNames(groupCol +: cols)
    val aggs = numericAggs(cols)
    spread(df).groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), numericStack(cols))
  }

  private def numericAggs(cols: Seq[String]) = {
    val d = "decimal(18,4)"
    cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nv_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        min(col(c)).cast(d).as(s"__mn_$c"),
        max(col(c)).cast(d).as(s"__mx_$c"),
        sum(col(c).cast(d)).cast("decimal(38,4)").as(s"__sm_$c"),
        sum(col(c).cast(d) * col(c).cast(d)).cast("decimal(38,8)").as(s"__sq_$c"))
    }
  }

  /** Final projection casts every decimal statistic to DOUBLE: the folds
    * stay exact in decimal (merge-order-free), but an engine-side DECIMAL
    * output column is asymmetrically canonicalized by downstream pandas
    * paths (oracle decimals coerce to float64 while engine decimals stay
    * Decimal objects) and so can never hash-match even when
    * value-identical — the round-5 six-red-rows incident. The DOUBLE cast
    * of the already-quantized decimal value is the q02/q103 convention. */
  private def numericStack(cols: Seq[String]): Column = {
    val stackArgs = cols.map { c =>
      s"'$c', `__nv_$c`, `__nn_$c`, CAST(`__mn_$c` AS DOUBLE), " +
        s"CAST(`__mx_$c` AS DOUBLE), CAST(`__sm_$c` AS DOUBLE), " +
        s"CAST(`__sq_$c` AS DOUBLE)"
    }.mkString(", ")
    expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_vals, n_nulls, min_d, max_d, sum_d, sumsq_d)")
  }

  /** Join-key diagnostics — the "why is my join slow" report run BEFORE
    * the join: for each key value, both sides' row counts and the output
    * rows it would contribute (n_left × n_right), top `k` by
    * contribution. One hot key at the top is the skew/AQE/salting case;
    * a large n_out total against small inputs is the fan-out-blowup
    * case; zeros on one side expose mismatched key domains.
    *
    * Scale shape: each side collapses to per-key counts first (map-side
    * combine — the full tables never meet), then a key-equi full outer
    * join of two counts tables and a TakeOrdered top-k. Everything
    * integer → hash-exact. */
  def joinKeyDiagnostics(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      k: Int = 20): DataFrame = {
    require(k >= 1, s"bad k: $k")
    validateNames(Seq(leftKey, rightKey))
    // backtick-quoted refs resolve literally (the histogram convention —
    // a key literally named "a.b" must not parse as a qualifier chain)
    val l = left.groupBy(col(s"`$leftKey`").as("k"))
      .agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(s"`$rightKey`").as("k"))
      .agg(count(lit(1)).as("n_right"))
    l.join(r, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        (coalesce(col("n_left"), lit(0L)) * coalesce(col("n_right"), lit(0L)))
          .as("n_out"))
      // total order even when NULL keys appear on both sides (two NULL-k
      // rows are possible — null keys never match, in this report exactly
      // as in the real join it predicts)
      .orderBy(col("n_out").desc, col("k"), col("n_left"), col("n_right"))
      .limit(k)
  }

  /** Fixed-bin histogram of a numeric column, optionally per group — the
    * distribution view behind every "token-length by source" corpus report.
    * `nBins` equal-width bins over [lo, hi); values below `lo` (including
    * −Inf) clamp into bin 0, values ≥ `hi` (including +Inf) into bin
    * nBins−1 (reports should count the tails, not silently drop them);
    * NULL and NaN values are excluded — NaN has no place on the axis. A
    * NULL GROUP key is a real group and keeps its rows (null-safe dense
    * join). Bins are emitted DENSELY —
    * every (group, bin) row exists with a zero count — because a histogram
    * with invisible gaps misleads exactly where it matters.
    *
    * Determinism: the bin index is `floor((x−lo)·nBins/(hi−lo))` on
    * doubles — single IEEE-exactly-rounded operations, no order-dependent
    * fold — and emitted edges use the same closed-form expression, so the
    * whole output is hash-exact cross-engine. Scale shape: one map-side-
    * combined aggregation on ((group), bin) — the shuffle carries at most
    * groups×nBins rows; the dense fan-out is row-local over the tiny
    * distinct-groups set, never over the data. */
  def histogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBins: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(nBins >= 1, s"bad nBins: $nBins")
    require(lo < hi, s"bad range: [$lo, $hi)")
    validateNames(valueCol +: groupCols)
    // backtick-quote every name reference: a column literally named "a.b"
    // must resolve as one name, not a qualifier chain (validateNames
    // already rejects names containing backticks)
    def qc(g: String) = col(s"`$g`")
    val x = qc(valueCol).cast("double")
    // clamp on the LONG floor result BEFORE narrowing to int: a huge or
    // ±Inf value floors to a long far outside int range, and a non-ANSI
    // long→int cast would WRAP it into an arbitrary bin instead of the
    // documented end-bin clamp. NaN can't be ordered into any bin — those
    // rows are excluded with the NULLs (documented).
    val bin = least(lit((nBins - 1).toLong), greatest(lit(0L),
      floor((x - lit(lo)) * nBins / (hi - lo)))).cast("int")
    val counts = df.filter(x.isNotNull && !x.isNaN)
      .groupBy((groupCols.map(qc) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
    val groups =
      if (groupCols.isEmpty) counts.sparkSession.range(1).select()
      else df.select(groupCols.map(qc): _*).distinct()
    val dense = groups.select(
      (groupCols.map(qc) :+ explode(sequence(lit(0), lit(nBins - 1))).as("bin")): _*)
    // the counts side is renamed to synthetic names before the join —
    // qualified self-join references trip Spark's disambiguation on
    // literal dotted names, renamed columns never do. The group-key
    // equality is NULL-SAFE: a NULL group is a real group (dense has its
    // row from distinct()) and a null-rejecting join would silently zero
    // its counts.
    val counts2 = groupCols.zipWithIndex.foldLeft(
      counts.withColumnRenamed("bin", "__cbin")) { case (d, (g, i)) =>
        d.withColumnRenamed(g, s"__cg_$i")
      }
    val joinCond = (groupCols.zipWithIndex.map { case (g, i) =>
      qc(g) <=> col(s"__cg_$i")
    } :+ (col("bin") === col("__cbin"))).reduce(_ && _)
    dense.join(counts2, joinCond, "left")
      .select((groupCols.map(qc) ++ Seq(
        col("bin"),
        (lit(lo) + col("bin") * (hi - lo) / nBins).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * (hi - lo) / nBins).as("bin_hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))): _*)
  }
}
