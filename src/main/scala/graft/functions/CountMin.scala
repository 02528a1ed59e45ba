package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
  * POINT-FREQUENCY sketch completing the sketch family next to HLL
  * cardinality (q114's mergeable distinct counts) and Misra-Gries heavy
  * hitters (q120's top-k screen): `depth` pairwise-independent hash
  * rows × `width` counters; a key's estimate is the MIN of its cells,
  * always ≥ the true count and ≤ true + ε·N with ε = e/width at
  * probability 1−e^(−depth). Misra-Gries answers "who is heavy"; CMS
  * answers "how often is THIS key" for keys it never stored — at a
  * fixed depth·width footprint independent of the key universe.
  *
  * Determinism contract: hashes are PINNED affine maps
  * ((a·key + b) mod p) mod width over non-negative integer keys
  * (p = 2^31−1; a·key fits int64 for key < 2^44), so the whole sketch —
  * every cell and every estimate — is integer-exact and replayable in
  * SQL. A seeded-random production sketch is a constants change.
  *
  * Scale shape: [[table]] is one hash-aggregate shuffle of depth rows
  * per record with map-side combine absorbing the Zipf head; the result
  * is depth·width cells REGARDLESS of corpus size, and two tables merge
  * by adding cells (the property streaming checkpoint stores rely on).
  * [[estimates]] joins a keys-sized probe set against the cells — no
  * scan of the raw data. */
object CountMin {

  val P: Long = 2147483647L // 2^31 - 1, prime

  /** Pinned (a, b) per hash row — depth = seeds.size. */
  val DefaultSeeds: Seq[(Long, Long)] =
    Seq((31L, 7L), (131L, 17L), (1031L, 29L), (65537L, 41L))

  private def bucket(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(lit(a) * key + lit(b), lit(P)), lit(width.toLong))

  /** Build the sketch: one row per non-empty cell (j, bucket, cnt). */
  def table(df: DataFrame, key: Column, width: Int = 256,
      seeds: Seq[(Long, Long)] = DefaultSeeds): DataFrame = {
    require(width >= 2, s"bad width: $width")
    require(seeds.nonEmpty, "need at least one hash row")
    val rows = array(seeds.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), bucket(key, a, b, width).as("bucket"))
    }: _*)
    df.select(explode(rows).as("cell"))
      .select(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group sketches in one pass: one row per non-empty
    * (group, j, bucket) cell — the shape [[joinSizes]] consumes. */
  def tableBy(df: DataFrame, group: Column, key: Column, width: Int = 256,
      seeds: Seq[(Long, Long)] = DefaultSeeds): DataFrame = {
    require(width >= 2, s"bad width: $width")
    require(seeds.nonEmpty, "need at least one hash row")
    val rows = array(seeds.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), bucket(key, a, b, width).as("bucket"))
    }: _*)
    df.select(group.as("g"), explode(rows).as("cell"))
      .select(col("g"), col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .groupBy("g", "j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join SIZE estimates between every group pair from the
    * sketches alone (Cormode & Muthukrishnan 2005 §4.2: the inner
    * product of two CM rows estimates a₁·a₂ = Σ_k fA(k)·fB(k), which
    * IS |A ⋈ B| on the key; min across the depth rows tightens it, and
    * like the point estimate it NEVER underestimates — collisions only
    * add). The estimator the join planner wants at 100 TB: cells are
    * depth·width per group regardless of table size, so join-size
    * ordering across many candidate joins costs no raw-data scan at
    * all. Error ≤ ε·N_A·N_B with ε = e/width at prob 1−e^(−depth). */
  def joinSizes(cells: DataFrame): DataFrame = {
    val a = cells.select(col("g").as("ga"), col("j"), col("bucket"),
      col("cnt").as("ca"))
    val b = cells.select(col("g").as("gb"), col("j"), col("bucket"),
      col("cnt").as("cb"))
    val ips = a.join(b, Seq("j", "bucket"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb", "j")
      .agg(sum(col("ca") * col("cb")).as("ip"))
    // min over the FULL pair × depth-row domain: a depth row with zero
    // bucket overlap has inner product 0 — the tightest possible
    // estimate — and must participate in the min; a fully disjoint
    // pair reports est_join = 0 instead of vanishing from the output
    // (both frames are sketch-sized: |groups|² pairs × depth rows).
    val gs = cells.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("ga"))
      .crossJoin(gs.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    pairs.crossJoin(cells.select(col("j")).distinct())
      .join(ips, Seq("ga", "gb", "j"), "left")
      .groupBy("ga", "gb")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_join"))
  }

  /** Point-frequency estimates for a probe-key set: min over the key's
    * cells, 0 when a cell is empty (the sketch never underestimates). */
  def estimates(cells: DataFrame, keys: DataFrame, keyCol: String,
      width: Int = 256, seeds: Seq[(Long, Long)] = DefaultSeeds): DataFrame = {
    val probes = keys.select(col(keyCol),
        explode(array(seeds.zipWithIndex.map { case ((a, b), j) =>
          struct(lit(j).as("j"), bucket(col(keyCol), a, b, width).as("bucket"))
        }: _*)).as("cell"))
      .select(col(keyCol), col("cell.j").as("j"), col("cell.bucket").as("bucket"))
    probes.join(cells, Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
