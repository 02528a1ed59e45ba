package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH skew defense: salt-split hot buckets before the candidate
  * self-join (the [[Rp]]/[[MinHash]] sibling of
  * [[Dedup.ngramJaccardPairs]]'s stop-shingle cap).
  *
  * The skew bomb: a candidate self-join on the bucket key is quadratic PER
  * KEY. On a real corpus one pathological bucket — duplicated boilerplate,
  * zero-ish embeddings, template documents — can hold 10⁵ ids, putting a
  * 10¹⁰-pair candidate partition on a single task while every other task
  * idles. Nothing about OR-amplified LSH bounds bucket occupancy, so the
  * defense has to be explicit.
  *
  * The fix: count per-(table, key) occupancy, and for buckets above
  * `maxBucketSize` split their members into ⌈occupancy / maxBucketSize⌉
  * deterministic salt groups; the self-join key becomes (t, k, salt), so the
  * largest join group is ~`maxBucketSize` rows and the worst candidate
  * partition is bounded at ~maxBucketSize² pairs regardless of input skew.
  * Buckets at or under the cap all take salt 0 — their pair sets are
  * untouched, so results are bit-identical to the unsalted join whenever no
  * bucket exceeds the cap (the fixture regime; see the callers' measured
  * margins).
  *
  * Recall accounting: a pair inside a hot bucket survives table t only if
  * both ids land in the same salt group there. The salt is
  * xxhash64(id, table) — independent splits per table — so a hot pair still
  * meets with probability 1−(1−1/s)^T across T tables (s = split factor),
  * and pairs whose OTHER shared buckets are cold are unaffected entirely.
  * That graceful degradation is the point: bounded compute on the skewed
  * key, full recall everywhere else. True identical-content duplicates are
  * the one population that concentrates in hot buckets in EVERY table; they
  * belong to exact dedup ([[Dedup.exactSurvivors]]), which runs before
  * near-dup in [[CorpusPrep.prepare]] precisely so the LSH stage never sees
  * them.
  *
  * Cost when nothing is hot: one map-side-combined aggregation over the
  * (already cached) signature relation producing a near-empty hot set, one
  * broadcast left join, one constant-folded salt column — measured noise at
  * fixture scale (the hot relation is empty, so the broadcast is a few KB).
  */
object Lsh {

  /** Default hot-bucket cap for the [[Rp]]/[[MinHash]] candidate joins.
    * Chosen so the fixture results stay bit-identical (measured max bucket
    * occupancy at sf0.1: see the margin notes in the callers' scaladoc) while
    * still bounding the worst candidate partition to ~cap² ≈ 1.7×10⁷ pairs —
    * seconds of work on one task, versus unbounded quadratic blowup. At
    * cluster scale tune DOWN toward (target partition pair budget)^0.5. */
  val DefaultMaxBucketSize: Int = 4096

  /** Add a `salt` column to a signature relation with columns (t, k, `idCol`,
    * ...): 0 for members of buckets at/under `maxBucketSize`, a deterministic
    * per-table hash split for members of larger buckets. Join candidates on
    * ("t", "k", "salt") afterwards. */
  def saltHotBuckets(sig: DataFrame, idCol: String, maxBucketSize: Int): DataFrame = {
    val hot = sig.groupBy("t", "k").agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBucketSize)
      .select(col("t"), col("k"),
        ceil(col("__bn").cast("double") / maxBucketSize).cast("long").as("__s"))
    // the hot set is tiny by construction (few buckets can exceed the cap:
    // at most n / maxBucketSize of them exist) — broadcast it
    sig.join(broadcast(hot), Seq("t", "k"), "left")
      .withColumn("salt",
        coalesce(
          pmod(xxhash64(col(idCol), col("t")), col("__s")).cast("int"),
          lit(0)))
      .drop("__s")
  }
}
