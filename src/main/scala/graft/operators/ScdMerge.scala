package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental SCD Type-2 merge — apply ONE new snapshot generation to
  * an EXISTING history instead of rebuilding from the full snapshot
  * stack. This is the shape production actually runs at 100 TB:
  * [[Scd.type2History]] is the backfill, this is the nightly load —
  * the history table is orders of magnitude smaller than the stack it
  * summarizes, and the stack may no longer exist.
  *
  * Semantics (exactly [[Scd.type2History]]'s, one generation at a
  * time — the algebra `merge(build(0..g−1), snap_g) ≡ build(0..g)` is
  * the operator's correctness contract, law-checked in ScdMergeSpec
  * and certified by q252's oracle, which REBUILDS from the stack while
  * the engine merges incrementally):
  *   - new key (no open interval)                  → open [g, null)
  *   - open interval, attrs equal (null-safely)    → unchanged (runs
  *     extend; snapshots are states, not events)
  *   - open interval, any attr differs             → close at g, open
  *     [g, null) with the new attributes
  *   - key absent from the snapshot                → unchanged (same
  *     state-semantics rule; a disappearance is not a change)
  *
  * Scale shape: closed intervals NEVER move — only the per-key OPEN
  * row (at most one, by construction) joins the snapshot: one
  * key-keyed full-outer hash join over |keys|, plus a union with the
  * untouched closed set. No window, no sort, no history rewrite. */
object ScdMerge {

  /** `history` must be [[Scd.type2History]]-shaped: key, gen_from,
    * gen_to (null = open), attrs. `snap` carries key + attrs at
    * generation `g`, which must be strictly greater than every
    * gen_from in the history. */
  def merge(history: DataFrame, snap: DataFrame, keyCol: String,
      attrs: Seq[String], g: Long): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    // generation columns normalize to LONG so the union is exact whatever
    // integral type the history was built with
    val h = history
      .withColumn("gen_from", col("gen_from").cast("long"))
      .withColumn("gen_to", col("gen_to").cast("long"))
    val closed = h.filter(col("gen_to").isNotNull)
    // the g-monotonicity contract is ENFORCED, not assumed: a same-g
    // replay (a double-run nightly load) would otherwise emit an empty
    // [g,g) interval plus a second gen_from=g row — silent corruption
    val open = h.filter(col("gen_to").isNull)
      .filter(assert_true(col("gen_from") < g,
        lit(s"ScdMerge.merge: open interval with gen_from >= g=$g — " +
          "is this a same-generation replay?")).isNull)
      .select(col(keyCol) +: col("gen_from") +:
        attrs.map(a => col(a).as(s"h_$a")): _*)
    val s = snap.select(col(keyCol) +: attrs.map(a => col(a).as(s"s_$a")): _*)
      .withColumn("__ins", lit(true))
    val j = open.withColumn("__has", lit(true))
      .join(s, Seq(keyCol), "full_outer")
    val same = attrs.map(a => col(s"h_$a") <=> col(s"s_$a")).reduce(_ && _)
    // the surviving open row, or the closed-out old row + the new open
    // row; absent-from-snap keys keep their open row untouched
    val keepOpen = j.filter(col("__ins").isNull ||
        (col("__has").isNotNull && same))
      .select(col(keyCol) +: col("gen_from") +:
        lit(null).cast("long").as("gen_to") +:
        attrs.map(a => col(s"h_$a").as(a)): _*)
    val closeOut = j.filter(col("__has").isNotNull &&
        col("__ins").isNotNull && !same)
      .select(col(keyCol) +: col("gen_from") +:
        lit(g).as("gen_to") +:
        attrs.map(a => col(s"h_$a").as(a)): _*)
    val openNew = j.filter(col("__ins").isNotNull &&
        (col("__has").isNull || !same))
      .select(col(keyCol) +: lit(g).as("gen_from") +:
        lit(null).cast("long").as("gen_to") +:
        attrs.map(a => col(s"s_$a").as(a)): _*)
    closed.select(col(keyCol) +: col("gen_from") +: col("gen_to") +:
        attrs.map(col): _*)
      .unionByName(keepOpen).unionByName(closeOut).unionByName(openNew)
  }
}
