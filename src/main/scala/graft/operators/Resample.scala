package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling with forward fill — the gap-filling half of the
  * time-series story next to [[AsOf]]'s point lookups: regularize an
  * irregular event stream onto a fixed `stepSeconds` grid per key, carrying
  * the last observed value forward into empty slots (sensor readings →
  * 15-min panel, trade ticks → minute bars, feature snapshots → training
  * rows).
  *
  * Construction (all relational, no per-key driver work):
  *  1. collapse duplicate observations per (key, ts) deterministically
  *     (`max_by` on the tie-break id — the winner is the "latest write");
  *  2. per-key bounds (keys-sized aggregate); the grid start snaps DOWN to
  *     an epoch-aligned step multiple so grids from different runs/engines
  *     coincide;
  *  3. explode the per-key grid (row-local fan-out from the tiny bounds
  *     table — span/step rows per key);
  *  4. union grid markers (null value) with observations and forward-fill
  *     with `last(value, ignoreNulls)` over (ts, marker-flag) — an
  *     observation at exactly a grid instant sorts BEFORE the marker, so
  *     the marker adopts it.
  *
  * Scale shape: ONE shuffle on the key (the window); everything before it
  * is scan-side or keys-sized. The window is per-key-sequential by nature —
  * a single key spanning years at 1-second steps serializes span/step rows
  * into one task. `chunkPeriod` is the mitigation: partition the fill
  * window by (key, calendar period) instead, and seed each chunk with a
  * CARRY-IN row — the last observation of all prior chunks, computed on
  * the keys×chunks-sized per-chunk summary, never the row stream — so the
  * fill inside a chunk sees exactly what the global window would have
  * carried across the boundary. Output is IDENTICAL with chunking on or
  * off (ResampleSpec asserts equality); the longest window task shrinks
  * from span/step to period/step rows. The carry-in seeding is the
  * standard gaps-and-islands decomposition of a running `last`.
  * Grid instants BEFORE a key's first observation keep a null value
  * (nothing to carry forward) — callers wanting a default apply `coalesce`
  * downstream.
  */
object Resample {

  private val ChunkPeriods = Set("YEAR", "QUARTER", "MONTH", "WEEK", "DAY", "HOUR")

  /** Deduplicate observations per (key, ts), latest-id wins — SHARING the
    * fill window's partitioning: the stream is repartitioned on the KEY
    * first, so the (key, ts) aggregate runs exchange-free (hash(key)
    * co-locates every finer (key, ts) group — Spark's subset-clustering
    * rule), the grid branch's keys-sized bounds aggregate is likewise
    * satisfied, and — because BOTH union children then report the same
    * hash(key) partitioning — the fill window consumes the union with NO
    * exchange of its own: the full-width fact crosses the network exactly
    * once (the bounds branch re-reads a column-pruned (key, ts) copy of
    * the scan; trading that for caching the dedup output would pin fact-
    * sized storage, the worse deal at 100 TB). Letting groupBy pick its
    * own hash(key, ts) partitioning instead cost a fact-sized exchange
    * into the window on top of per-branch (key, ts) exchanges. NULL-
    * timestamp rows drop (SQL semantics; RangeJoin's convention) — left
    * in, Spark's NULLS-FIRST window order would leak their value into
    * pre-first-observation grid slots, and engines disagree on NULL
    * ordering, so the behavior would not even be portable. */
  private def dedupObs(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, idCol: String): DataFrame =
    events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(valCol), col(idCol))
      .repartition(col(keyCol))
      .groupBy(col(keyCol), col(tsCol))
      .agg(max_by(col(valCol), col(idCol)).as(valCol))

  def forwardFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      idCol: String,
      stepSeconds: Long,
      chunkPeriod: Option[String] = None): DataFrame = {
    require(stepSeconds > 0, s"bad step: $stepSeconds")
    chunkPeriod.foreach(p => require(ChunkPeriods(p.toUpperCase),
      s"chunkPeriod must be one of $ChunkPeriods, got '$p'"))
    val obs = dedupObs(events, keyCol, tsCol, valCol, idCol)
    val bounds = obs.groupBy(col(keyCol)).agg(
      to_timestamp(
        floor(unix_timestamp(min(col(tsCol))) / stepSeconds) * stepSeconds)
        .as("__t0"),
      max(col(tsCol)).as("__t1"))
    val grid = bounds
      .select(col(keyCol),
        explode(sequence(col("__t0"), col("__t1"),
          expr(s"INTERVAL $stepSeconds SECONDS"))).as(tsCol))
      .withColumn(valCol, lit(null).cast(events.schema(valCol).dataType))
      .withColumn("__g", lit(1))
    val union = obs.withColumn("__g", lit(0)).unionByName(grid)

    chunkPeriod match {
      case None =>
        val w = Window.partitionBy(keyCol)
          .orderBy(col(tsCol).asc, col("__g").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union
          .withColumn(valCol, last(col(valCol), ignoreNulls = true).over(w))
          .filter(col("__g") === 1)
          .drop("__g")

      case Some(p) =>
        val og = union.withColumn("__c", date_trunc(p, col(tsCol)))
        // last NON-NULL observation per (key, chunk) — keys×chunks-sized.
        // The ordering key is nulled for null-valued rows so max_by skips
        // them: a chunk ending in a NULL observation must carry its last
        // non-null value forward, exactly like the unchunked path's
        // last(value, ignoreNulls) (an all-null chunk yields __lv = null
        // and the running carry below skips it too)
        val lastPerChunk = obs
          .groupBy(col(keyCol), date_trunc(p, col(tsCol)).as("__c"))
          .agg(max_by(col(valCol),
            when(col(valCol).isNotNull, col(tsCol))).as("__lv"))
        // every chunk the stream touches (incl. observation-free grid
        // chunks), each seeded with the last value of any PRIOR chunk
        val wc = Window.partitionBy(keyCol).orderBy("__c")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = og.select(col(keyCol), col("__c")).distinct()
          .join(lastPerChunk, Seq(keyCol, "__c"), "left")
          .withColumn("__cv", last(col("__lv"), ignoreNulls = true).over(wc))
          .filter(col("__cv").isNotNull)
          // the carry-in row sits at the chunk's start instant with flag −1:
          // before every marker, and before (so overridden by) any real
          // observation at the same instant
          .select(col(keyCol), col("__c").as(tsCol), col("__cv").as(valCol),
            lit(-1).as("__g"), col("__c"))
        val w = Window.partitionBy(col(keyCol), col("__c"))
          .orderBy(col(tsCol).asc, col("__g").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        og.unionByName(carry)
          .withColumn(valCol, last(col(valCol), ignoreNulls = true).over(w))
          .filter(col("__g") === 1)
          .drop("__g", "__c")
    }
  }

  /** Time-grid resampling with LINEAR interpolation — [[forwardFill]]'s
    * sibling for signals where a gap means "the value moved smoothly", not
    * "the value held" (sensor drift, prices, rates). Grid construction is
    * identical (dedup → epoch-snapped bounds → exploded grid → union with
    * marker flag); the fill differs: each grid instant takes
    *
    *   prev + (next − prev) · (t − prev_ts) / (next_ts − prev_ts)
    *
    * where prev/next are the nearest observations at-or-before / strictly
    * after (in (ts, marker) order an observation AT a grid instant sorts
    * before the marker, so prev_ts = t and the marker adopts the observed
    * value exactly — the formula's fraction is 0, no special case).
    * STRICT interior semantics: grid slots before the first observation
    * keep null (nothing to anchor the left end); the grid ends at the
    * key's max observed ts — NOTE the bound is `max(ts)` over ALL
    * observations including null-VALUED ones (a trailing null write
    * extends the grid, and the slots it opens fill flat from the last
    * non-null anchor via the `__nt IS NULL → __pv` branch; the oracle SQL
    * mirrors this, so the contract is cross-engine-pinned). All arithmetic
    * is IEEE double over epoch-microsecond longs in a fixed operand order,
    * so results are bit-identical across engines given identical inputs.
    *
    * Scale shape: ONE shuffle on the key feeding two window passes, both
    * over ACCUMULATING frames (unboundedPreceding → currentRow — Spark's
    * O(n) incremental frame): the prev anchors run `last(ignoreNulls)`
    * over the ascending (ts, marker) sort; the next anchors run the SAME
    * running `last` over the DESCENDING (ts desc, marker desc) sort, which
    * visits exactly the row set a `first over (currentRow →
    * unboundedFollowing)` would — without UnboundedFollowing's
    * rescan-to-partition-end execution (O(n²) per key; the r6/r7 verdicts
    * measured it at ~21× forwardFill's wall on identical data). Catalyst
    * plans the two sorts over a single Exchange on the key, ONE Window
    * node per direction (both anchor columns of a direction are declared
    * in one projection — chained withColumns would plan a Window node,
    * i.e. a full pass over the sorted partition, per column). The
    * per-key-sequential caveat and its chunked mitigation are
    * [[forwardFill]]'s; interpolation's carry-in needs BOTH boundary
    * observations per chunk (last-before and first-after), the same
    * gaps-and-islands seeding run in each direction. */
  def interpolate(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      idCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"bad step: $stepSeconds")
    val obs = dedupObs(events, keyCol, tsCol, valCol, idCol)
    val bounds = obs.groupBy(col(keyCol)).agg(
      to_timestamp(
        floor(unix_timestamp(min(col(tsCol))) / stepSeconds) * stepSeconds)
        .as("__t0"),
      max(col(tsCol)).as("__t1"))
    val grid = bounds
      .select(col(keyCol),
        explode(sequence(col("__t0"), col("__t1"),
          expr(s"INTERVAL $stepSeconds SECONDS"))).as(tsCol))
      .withColumn(valCol, lit(null).cast(events.schema(valCol).dataType))
      .withColumn("__g", lit(1))
    val union = obs.withColumn("__g", lit(0)).unionByName(grid)

    val back = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__g").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the next-anchor pass: DESCENDING sort + the same accumulating frame.
    // At a marker's position the frame holds rows with ts > t plus the
    // marker itself (same-ts observations sort __g-ascending BELOW the
    // marker in desc order, so they stay prev-side) — exactly the row set
    // of first(...) over (currentRow → unboundedFollowing) on the asc
    // sort, evaluated in O(n) instead of a per-row rescan to partition end
    val fwd = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // observation timestamp column nulled on marker rows, so the ignoreNulls
    // running lasts pick observation rows only (value and ts stay paired
    // even when a real observation carries a null value: such a row
    // contributes neither anchor)
    val obsTs = when(col("__g") === 0 && col(valCol).isNotNull,
      unix_micros(col(tsCol)))
    val obsVal = when(col("__g") === 0, col(valCol))
    val t = unix_micros(col(tsCol))
    val prevV = last(obsVal, ignoreNulls = true).over(back)
    val prevT = last(obsTs, ignoreNulls = true).over(back)
    val nextV = last(obsVal, ignoreNulls = true).over(fwd)
    val nextT = last(obsTs, ignoreNulls = true).over(fwd)
    // one select for all four anchors: chained withColumns left
    // ExtractWindowExpressions planning one Window node per column (four
    // passes over the sorted partition); a single projection fuses them
    // into one Window node per sort direction
    union
      .select(col("*"), prevV.as("__pv"), prevT.as("__pt"),
        nextV.as("__nv"), nextT.as("__nt"))
      .withColumn(valCol,
        when(col("__pt").isNotNull && col("__nt") > col("__pt"),
          col("__pv") + (col("__nv") - col("__pv")) *
            ((t - col("__pt")).cast("double") /
              (col("__nt") - col("__pt")).cast("double")))
          .when(col("__pt").isNotNull, col("__pv"))
          .otherwise(lit(null).cast("double")))
      .filter(col("__g") === 1)
      .select(col(keyCol), col(tsCol), col(valCol))
  }
}
