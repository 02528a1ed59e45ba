package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join — every pair of strings within
  * Levenshtein distance `k`, with NO O(n²) stage (the "fuzzy dedup" the
  * text near-dup family can't express: MinHash/SimHash see token sets,
  * not character edits, so a one-character typo clone is invisible to
  * them and trivial here).
  *
  * Candidate generation is the segment-pigeonhole scheme of the PassJoin
  * family (Li, Deng, Feng — PVLDB 5(3), "PASS-JOIN: a partition-based
  * method for similarity joins"): partition each indexed string into k+1
  * segments; any string within edit distance k must contain at least one
  * segment VERBATIM (k errors cannot touch k+1 disjoint segments), and
  * the match's start position can shift by at most k (each net
  * insertion/deletion before it shifts it by one). So the probe side
  * generates, per candidate target length `tl` in [len−k, len+k] and per
  * segment slot, the substrings at the ±k window of that slot's start —
  * O(k³) fixed-width probe rows per string — and candidates fall out of
  * a plain equi-join on (target length, slot, segment hash). Hashing the
  * segment (xxhash64) keeps shuffle rows fixed-width; a hash collision
  * only adds a candidate the rerank discards, so the result stays exact.
  *
  * Strings too short to give k+1 non-empty segments go through a
  * symmetric-delete join instead (the SymSpell scheme): if ed(a,b) ≤ k,
  * deleting the ≤k substituted/deleted chars from a and the ≤k
  * substituted/inserted chars from b (per an optimal alignment) reaches
  * the SAME string, so the depth-k deletion neighborhoods intersect.
  * Neighborhood size is C(len, ≤k) — bounded because only strings with
  * len ≤ 3k+2 can pair with a string shorter than k+1 (length filter).
  *
  * Both paths emit candidate (id_a, id_b) pairs that a codegen banded
  * `levenshtein(a, b, k)` rerank confirms — bodies travel only for
  * candidates, never all-pairs. At 100 TB: probe/segment rows are
  * O(k³ + k·len/(k+1)) bytes per doc, the candidate join is a shuffle
  * equi-join on fixed-width keys, and the rerank is proportional to the
  * near-dup count, not the corpus square.
  */
object EditDistance {

  /** All unordered pairs (id_a < id_b) with levenshtein(text_a, text_b) ≤ k.
    *
    * @param docs columns (`id`: long, `text`: string); ids unique
    * @return (id_a, id_b, dist) — dist the exact edit distance, ≤ k
    */
  def passJoin(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val kp1 = k + 1
    val shortMax = 3 * k + 2 // partner of any len<k+1 string has len ≤ 2k+... < 3k+2
    val d = docs.select(col("id").cast("long").as("id"), col("text"),
      length(col("text")).as("len"))

    // ---- pigeonhole path (len ≥ k+1: every segment non-empty) ----------
    // even partition of a length-l string: q=l div (k+1), r=l mod (k+1);
    // slot i has size q+(i<r) and starts at i·q+min(i,r) (sums back to l)
    val segs = d.filter(col("len") >= kp1)
      .select(col("id"), col("len"), col("text"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("q", expr(s"len div $kp1"))
      .withColumn("r", expr(s"len % $kp1"))
      .withColumn("li", expr("q + if(i < r, 1, 0)"))
      .withColumn("pi", expr("i * q + least(i, r)"))
      .select(col("id").as("sid"), col("len").as("slen"), col("i").as("si"),
        xxhash64(expr("substring(text, pi + 1, li)")).as("segh"))

    // probe side: for each target length tl (the indexed partner's length)
    // and slot, the substrings at start positions within ±k of the slot's
    // start in the TARGET's partition geometry. lo ≤ hi always holds for
    // the tl sequence below (len ≥ 1 ⇒ len+k ≥ k+1), but the per-slot
    // window can be empty near the string's end — filtered, since Spark's
    // sequence(lo, hi) runs DESCENDING when lo > hi instead of empty.
    val probes = d.filter(col("len") >= 1)
      .select(col("id").as("pid"), col("len").as("plen"), col("text"),
        explode(expr(s"sequence(greatest(len - $k, $kp1), len + $k)")).as("tl"))
      .withColumn("q", expr(s"tl div $kp1"))
      .withColumn("r", expr(s"tl % $kp1"))
      .withColumn("i", explode(sequence(lit(0), lit(k))))
      .withColumn("li", expr("q + if(i < r, 1, 0)"))
      .withColumn("pi", expr("i * q + least(i, r)"))
      .withColumn("lo", expr(s"greatest(0, pi - $k)"))
      .withColumn("hi", expr(s"least(plen - li, pi + $k)"))
      .filter(col("hi") >= col("lo"))
      .select(col("pid"), col("tl"), col("i"),
        explode(expr("transform(sequence(lo, hi), p -> xxhash64(substring(text, p + 1, li)))"))
          .as("segh"))
      .distinct() // the window re-derives the same substring at many p

    val pigeonhole = segs.join(probes,
        segs("slen") === probes("tl") && segs("si") === probes("i") &&
          segs("segh") === probes("segh") && segs("sid") =!= probes("pid"))
      .select(least(col("sid"), col("pid")).as("id_a"),
        greatest(col("sid"), col("pid")).as("id_b"))

    // ---- symmetric-delete path (pairs touching a len<k+1 string) -------
    val spark = docs.sparkSession
    import spark.implicits._
    val delKeys = d.filter(col("len") <= shortMax)
      .select(col("id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        deletionNeighborhood(text, k).iterator.map(v => (id, v))
      }.toDF("id", "v")
      .select(col("id"), xxhash64(col("v")).as("vh"))
    val symdel = delKeys.as("a").join(delKeys.as("b"),
        col("a.vh") === col("b.vh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))

    // ---- candidates → banded-DP rerank ---------------------------------
    // (the two paths overlap on short-but-segmentable strings; distinct
    // merges them, and hash collisions die at the rerank)
    val cand = pigeonhole.union(symdel).distinct()
    val byId = d.select(col("id"), col("text"))
    // threshold AT k: levenshtein(a,b,k) is the exact distance when ≤ k
    // and -1 otherwise, so ONE predicate both filters and bounds —
    // a second `<= k` conjunct would re-evaluate the DP per row
    cand
      .join(byId.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(byId.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("dist", expr(s"levenshtein(text_a, text_b, $k)"))
      .filter(col("dist") =!= -1)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }

  /** All strings reachable by deleting at most k characters (the string
    * itself included). Size is Σ_{j≤k} C(len, j) — callers bound len. */
  private[llm] def deletionNeighborhood(text: String, k: Int): Set[String] = {
    var frontier = Set(text)
    var all = frontier
    var depth = 0
    while (depth < k && frontier.nonEmpty) {
      frontier = frontier.flatMap { s =>
        (0 until s.length).iterator
          .map(i => s.substring(0, i) + s.substring(i + 1)).toSet
      } -- all
      all ++= frontier
      depth += 1
    }
    all
  }
}
