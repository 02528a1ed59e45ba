package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-threshold Jaccard set-similarity self-join via prefix
  * filtering (Chaudhuri et al. 2006 SSJoin / Bayardo et al. 2007
  * AllPairs — the pg_trgm-era classic behind "find EVERY pair with
  * J ≥ t, exactly"): MinHash (q31/q33) answers the same question
  * APPROXIMATELY with recall < 1; this is the exact engine the
  * near-dup matrix was missing — exact Jaccard next to exact edit
  * distance (q139) and approximate MinHash/SimHash.
  *
  * Prefix-filter principle: order every set by GLOBAL token rarity
  * (rare first); if J(x,y) ≥ t, then the first
  * p = |x| − ⌈t·|x|⌉ + 1 tokens of x and y MUST share an element —
  * so candidates come from an equi-join on prefix tokens only, and
  * the exact intersection check runs on candidates. Sound and
  * COMPLETE: the brute pair scan is the oracle, and the engine must
  * reproduce it exactly — a wrong prefix length or a non-global
  * order silently drops true pairs, which is precisely what the
  * hash gate certifies.
  *
  * The rarity order needs no global rank window (the registry's
  * unpartitioned-Window lint): the sort key is the zero-padded
  * global count concatenated with the token — lexicographic =
  * (count asc, token asc) — so per-set ordering is one codegen'd
  * sort_array, corpus-wide.
  *
  * Threshold is an integer fraction tNum/tDen; the verify test is
  * cross-multiplied ((tDen+tNum)·|A∩B| ≥ tNum·(|A|+|B|)) — no float
  * near the boundary to hash (the q219 discipline).
  *
  * Scale shape: token counts are one aggregate; prefixes shrink the
  * join's posting lists by the threshold factor and the rare-first
  * order keeps the hottest tokens OUT of prefixes (the skew guard —
  * a stopword-class shingle lands in a prefix only for sets with
  * almost nothing else); candidate verification joins the pair list
  * (result-sized) against the per-set arrays. No all-pairs stage
  * anywhere. */
object SetSimJoin {

  /** Distinct character k-shingles per doc: (doc_id, s). Docs shorter
    * than k have no shingles and drop at the scan. */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"shingle size out of range: $k")
    // r18: a few-MB documents scan is ONE split and the shingle explode +
    // map-side distinct aggregate inherit it (q230 measured 37 cpu-sec at
    // effective parallelism 4 on 32 cores) — spread is a no-op at real
    // input sizes (guide §2.5, input starvation)
    graft.operators.Parallelism.spread(docs)
      .filter(length(col(textCol)) >= k)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, length($textCol) - ${k - 1}), " +
            s"i -> substring($textCol, i, $k))"))).as("s"))
  }

  /** All pairs (id_a < id_b) with Jaccard ≥ tNum/tDen over the input
    * sets — (id_a, id_b, inter, n_a, n_b), intersection exact. */
  def jaccardJoin(sets: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a fraction in (0,1]: $tNum/$tDen")
    val sz = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cnt = sets.groupBy("s").agg(count(lit(1)).as("c"))
    // global rarity order as a SORTABLE STRING: (count asc, token asc)
    val keyed = sets.join(cnt, Seq("s"))
      .select(col("doc_id"),
        concat(lpad(col("c").cast("string"), 12, "0"), lit("|"), col("s"))
          .as("key"))
    val arrs = keyed.groupBy("doc_id")
      .agg(sort_array(collect_list("key")).as("ks"), count(lit(1)).as("n"))
      // prefix length p = n − ⌈t·n⌉ + 1, all-integer ceil
      .withColumn("p",
        col("n") - expr(s"(${tNum}L * n + ${tDen - 1}L) div ${tDen}L") + 1L)
    val pref = arrs.select(col("doc_id"), col("n"),
      explode(slice(col("ks"), lit(1), col("p"))).as("key"))
    // length filter (Arasu et al. / AllPairs): J(x,y) ≥ t forces
    // t·|y| ≤ |x| ≤ |y|/t — cross-multiplied on the candidate join so
    // size-mismatched pairs never materialize (a ~3× candidate cut on
    // top of the prefix filter, measured r14)
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("b.key") === col("a.key") && col("a.doc_id") < col("b.doc_id") &&
          lit(tDen.toLong) * col("a.n") >= lit(tNum.toLong) * col("b.n") &&
          lit(tDen.toLong) * col("b.n") >= lit(tNum.toLong) * col("a.n"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val left = arrs.select(col("doc_id").as("id_a"), col("ks").as("ka"),
      col("n").as("n_a"))
    val right = arrs.select(col("doc_id").as("id_b"), col("ks").as("kb"),
      col("n").as("n_b"))
    cand.join(left, Seq("id_a")).join(right, Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("ka"), col("kb"))).cast("long"))
      .filter(lit((tDen + tNum).toLong) * col("inter") >=
        lit(tNum.toLong) * (col("n_a") + col("n_b")))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"))
  }
}
