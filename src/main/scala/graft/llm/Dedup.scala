package graft.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for LLM training-data pipelines (B31/B32).
  *
  *  - exact: content-hash groupBy — one shuffle on the 64-hex digest; at
  *    100 TB this is the cheapest possible dedup (hash is computed scan-side,
  *    only (digest, id) pairs shuffle, never the document bodies).
  *  - MinHash+LSH: shingle → binary HashingTF → seeded MinHash band-join —
  *    near-dup candidates meet in buckets, avoiding the O(n²) pair space.
  *  - SimHash: 64-bit sign-of-weighted-bits fingerprint; near-dups differ in
  *    few bits, so banding on fingerprint prefixes scales.
  *  - n-gram Jaccard: exact similarity on the shingle sets for candidate
  *    pairs that share ≥1 shingle (the verification step after LSH).
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per distinct content hash. */
  def exactSurvivors(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Incremental exact dedup — screen a NEW ingest batch against a
    * historical corpus WITHOUT joining the corpus: the append-heavy shape
    * every production pipeline hits (100 TB of history, a daily batch of
    * new documents).
    *
    * Two stages, Bloom-filter screen then exact confirm — and the history
    * is only ever SCANNED, never shuffled (not even its hashes):
    *  1. [[graft.functions.GraftBloomAgg]] folds the history's content
    *     hashes into one bits-sized filter (an aggregate — partial buffers
    *     merge map-side). `might_contain` then screens the new batch
    *     scan-side: documents whose hash misses the filter are DEFINITELY
    *     new (Bloom has no false negatives) and skip stage 2 entirely.
    *  2. Exact confirm, with the join FLIPPED so the big side streams: the
    *     screened hash sliver (dups + fpp·batch — batch-bounded by
    *     construction, hence broadcastable) broadcasts; the history scan
    *     streams past it in a semi join, emitting the confirmed-duplicate
    *     hashes; the batch anti-joins that (again batch-bounded) set. A
    *     confirm written the naive way — batch anti-join
    *     history.distinct() — would shuffle EVERY history hash
    *     (~32 GB/1e9 rows) on every daily batch, which at the operator's
    *     target scale dwarfs the batch-side work the screen saves.
    *
    * Delivery shape: the filter reaches the probe as an UNCORRELATED SCALAR
    * SUBQUERY — the same shape Spark's own runtime row-level filters inject
    * — never as a `lit(bytes)` plan literal. At the 1e9-row histories this
    * is built for (fpp 0.01 ⇒ ~1.2 GB of bits) a literal would ride every
    * plan copy, explain dump, and canonicalization; the subquery's bytes
    * live once, outside the expression tree (DedupSpec asserts no multi-MB
    * literal survives in the plan). The whole function is LAZY — no job
    * runs at construction. The custom aggregate also takes its size
    * arguments literally instead of silently capping them at the
    * runtime-filter session confs, which removes the non-thread-safe
    * conf raise/restore round-trip earlier versions needed.
    *
    * Returns the genuinely-new rows of `newDocs`. The filter bits are
    * engine-specific (no DuckDB oracle); the no-false-negative /
    * FP-bounded / exact-confirm properties live in DedupSpec.
    *
    * Memory: every partial-aggregation task holds a numBits/8-byte buffer
    * (≈1.2 GB at the 1e9-row/fpp-0.01 ceiling), so a 32-core executor can
    * transiently hold cores × buffer during the build — size
    * `expectedHistoryRows` from reality, not from a safety margin; the
    * aggregate itself refuses filters beyond
    * [[graft.functions.GraftBloomAgg.MaxBits]].
    *
    * This one-shot path re-reads and re-hashes the ENTIRE history corpus
    * per batch. A daily-ingest pipeline should maintain a [[DedupIndex]]
    * instead: the same screen+confirm engine fed by a persisted 32 B/doc
    * digest index — the history pass drops from corpus bytes to index
    * bytes. */
  def incrementalNewDocs(
      newDocs: DataFrame,
      history: DataFrame,
      expectedHistoryRows: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val h = sha2(col("text"), 256)
    incrementalNewDocsByHash(
      newDocs, history.select(h.as("__hh")), expectedHistoryRows, fpp)
  }

  /** The hash-relation core of [[incrementalNewDocs]]: the history side is
    * any relation of content-hash hex strings in column `__hh` — the full
    * corpus re-hashed scan-side (the one-shot path above) or a persisted
    * 32 B/doc digest index ([[DedupIndex]] — the production shape, where
    * the per-batch history pass reads the index bytes instead of re-reading
    * and re-hashing the document bodies). Both Bloom build and exact
    * confirm stream THIS relation, so the cost of the history pass is
    * proportional to what the caller hands in. */
  private[llm] def incrementalNewDocsByHash(
      newDocs: DataFrame,
      historyHashes: DataFrame,
      expectedHistoryRows: Long,
      fpp: Double): DataFrame = {
    graft.functions.GraftFunctions.register(newDocs.sparkSession)
    val h = sha2(col("text"), 256)
    // bits sized from the target false-positive rate: m = n·ln(1/p)/ln²2
    val numBits = math.max(64L,
      math.ceil(expectedHistoryRows * math.log(1.0 / fpp)
        / (math.log(2) * math.log(2))).toLong)
    // empty history ⇒ an all-zero filter (GraftBloomAgg never returns
    // null), so the screen correctly passes everything through as new
    val bf = historyHashes
      .agg(call_function(graft.functions.GraftFunctions.BloomAggName,
        xxhash64(col("__hh")), lit(expectedHistoryRows), lit(numBits)).as("bf"))
      .scalar()
    val maybeDup = call_function(
      graft.functions.GraftFunctions.MightContainName, bf, xxhash64(h))
    val screenedHashes = newDocs.filter(maybeDup)    // tiny: dups + fpp·new
      .select(h.as("__hh")).distinct()
    // history streams past the broadcast sliver (scan-side semi join, no
    // history exchange); the per-partition hash aggregate collapses
    // repeated history copies before the tiny distinct shuffle. No forced
    // broadcast hints (the round's policy for data-dependent sides): both
    // small sides are post-aggregate and accurately sized, so AQE
    // broadcasts them in the designed batch≪history regime and degrades
    // to a shuffled join — instead of a driver OOM — if a caller feeds a
    // corpus-sized "batch".
    val confirmedDups = historyHashes
      .join(screenedHashes, Seq("__hh"), "left_semi")
      .distinct()
    // a batch doc is new iff its hash is not a CONFIRMED duplicate; the
    // unscreened docs can't be in confirmedDups (no false negatives), so
    // one anti-join covers both branches
    newDocs.join(confirmedDups, h === col("__hh"), "left_anti")
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64 token hashes; bit i of
    * the fingerprint = sign of Σ_tokens (2·bit_i(h(t)) − 1)).
    *
    * Runs on the one-pass codegen expression
    * [[graft.functions.SimHash64]] — the nested-HOF form
    * ([[simhash64HOF]]) re-folds the token array once per bit, 64
    * traversals re-hashing every token through boxed lambdas (measured
    * 7.5 s vs sub-second for the sf0.1 corpus); equality between the two
    * forms is spec-asserted (DedupSpec). */
  def simhash64(text: Column): Column = {
    // best-effort registration: getActiveSession is THREAD-LOCAL, so a
    // Column-only API can miss (e.g. called from a pool thread that never
    // created the session). DataFrame-taking callers (simhashPairs, q32)
    // register on df.sparkSession explicitly; do the same in new call sites.
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    call_function(graft.functions.GraftFunctions.SimHash64Name,
      array_distinct(TextAnalysis.tokens(text)))
  }

  /** The declarative reference form of [[simhash64]]: pure-Column nested
    * higher-order functions; `call_function` reaches the shift builtins
    * whose Scala wrappers only take Int literals. The bit-OR fold (not a
    * sum) packs bit 63 without ANSI overflow. Semantics-identical to the
    * codegen expression (spec-asserted); kept as the executable spec of
    * what SimHash64 computes. */
  def simhash64HOF(text: Column): Column = {
    val ts = array_distinct(TextAnalysis.tokens(text))
    val bitBalance = (i: Column) =>
      aggregate(ts, lit(0L), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
    aggregate(
      transform(sequence(lit(0), lit(63)),
        i => when(bitBalance(i) > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Banded SimHash near-dup pairs: the scale path for [[simhash64]] (turns
    * "banding-ready fingerprint" into an actual candidate join). The 64-bit
    * fingerprint is cut into `bands` contiguous bit-slices; pairs meet when
    * any slice matches exactly (equi-join on (band, slice-value)), then the
    * exact Hamming distance reranks candidates.
    *
    * Unlike MinHash/Rp this is pigeonhole-EXACT, not probabilistic: a pair
    * at Hamming distance d touches at most d bands, so for
    * `maxHamming <= bands - 1` every qualifying pair shares at least one
    * unchanged band and is guaranteed to surface (recall 1.0; DedupSpec
    * asserts set-equality against the brute-force O(n²) twin). Choose
    * `bands = maxHamming + 1`: that is the TIGHTEST exact configuration,
    * and wider slices admit far fewer false candidates (on the sf0.1
    * corpus, whose simhash bits are biased by shared vocabulary, 4×16-bit
    * bands emit ~50× fewer candidates than 8×8-bit for the same exact
    * hamming ≤ 3 result). More bands only buy higher hamming budgets. The one
    * carve-out is [[Lsh.saltHotBuckets]]: a pair whose only unchanged bands
    * all sit in salt-split hot buckets can split apart — bounded compute on
    * pathological skew traded for completeness on it, same contract as
    * Rp/MinHash (fixture buckets are far under the cap, so fixture results
    * are bit-identical to the unsalted join).
    *
    * Shuffle profile at scale: fingerprints are computed scan-side (one
    * pass over text), the join moves only (band, 8-bit slice, 8-byte fp,
    * id) rows — no document bodies — and the rerank is a bit_count on two
    * longs. xxhash64-based ⇒ not DuckDB-replicable: q64 is rows-only with
    * the exactness property in DedupSpec standing in for the oracle. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = Lsh.DefaultMaxBucketSize,
      materialize: Boolean = true): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands ($maxHamming >= $bands)")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fp0 = docs.select(col("doc_id"), simhash64(col("text")).as("fp"))
    // cache: the fingerprint scan (nested 64-bit HOF fold over every token)
    // dominates; it feeds both self-join sides via the exploded signature
    val fp = if (materialize) fp0.cache() else fp0
    val sig = fp.select(
      col("doc_id"), col("fp"),
      explode(array((0 until bands).map { t =>
        struct(lit(t).as("t"),
          call_function("shiftright", col("fp"), lit(t * bits))
            .bitwiseAND(lit(mask)).as("k"))
      }: _*)).as("tb"))
      .select(col("doc_id"), col("fp"), col("tb.t").as("t"), col("tb.k").as("k"))
    val salted = Lsh.saltHotBuckets(sig, "doc_id", maxBucketSize)
    val a = salted.select(col("t"), col("k"), col("salt"),
      col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = salted.select(col("t"), col("k"), col("salt"),
      col("doc_id").as("id_b"), col("fp").as("fp_b"))
    val pairs0 = a.join(b, Seq("t", "k", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    if (!materialize) return pairs0
    val pairs = pairs0.localCheckpoint(true) // eager: see minhashPairs note
    fp.unpersist()
    pairs
  }

  /** MinHash-LSH near-duplicate candidate pairs over `k`-word shingles.
    * Seeded → deterministic; `distCol` is the exact Jaccard *distance* on the
    * hashed shingle space. Output (id_a, id_b, jaccard_dist), id_a < id_b. */
  // numHashTables = 5: OR-amplified collision probability for a true pair at
  // jaccard s is 1-(1-s)^T — at the s=0.5 contract boundary that is 96.9%
  // with 5 tables but only 87.5% with 3, below the 0.9 recall bound.
  def minhashPairs(
      docs: DataFrame,
      maxJaccardDist: Double = 0.6,
      numHashTables: Int = 5,
      seed: Long = 42L): DataFrame = {
    val shingled = docs
      .select(col("doc_id"), TextAnalysis.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    // cache: the self-join evaluates this subtree once per side per hash
    // stage; without it the shingle+TF pipeline recomputes several times
    val feats = tf.transform(shingled).cache()
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(feats)
    val pairs = model.approxSimilarityJoin(feats, feats, maxJaccardDist, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
      // eager localCheckpoint: materializes the (small) pair set with its
      // lineage cut, so the big feature cache can be released immediately and
      // the pair blocks self-release via ContextCleaner when the caller drops
      // the DataFrame (no unpersist contract leaking to callers)
      .localCheckpoint(true)
    feats.unpersist()
    pairs
  }

  /** Substring-level near-dup candidate pairs via shared WINNOWING
    * fingerprints ([[TextAnalysis.winnow]]): two documents sharing any
    * token run of length ≥ w+k-1 are guaranteed ≥1 shared selected hash
    * (the winnowing guarantee), so this surfaces partial-overlap pairs —
    * quote reuse, template text, cross-posted passages — that whole-document
    * jaccard/minhash miss when the rest of the documents differ. Unlike the
    * xxhash64-based MinHash/SimHash joins, the winnow hash is a sha256
    * prefix, so the WHOLE operator is DuckDB-replicable and oracle-checked
    * (q86), not rows-only.
    *
    * Shape is [[ngramJaccardPairs]]'s: explode to (hash, id) — the selected
    * set is ~2/(w+1) of the grams, so this stream is much smaller than the
    * shingle stream — one shuffle on the hash, pair aggregation, with the
    * same `maxDocFreq` stop-hash cap defusing the boilerplate skew bomb
    * (a hash in thousands of docs would put a quadratic partition on one
    * key; capped hashes drop from the join, so `n_shared` undercounts by at
    * most their contribution — same conservative contract as the shingle
    * cap). */
  def winnowPairs(
      docs: DataFrame,
      minShared: Long = 2,
      maxDocFreq: Int = 100,
      materialize: Boolean = true): DataFrame = {
    // cached: the winnow explode (sha256 per gram — the dominant scan cost)
    // feeds THREE subtrees (doc-frequency cap + both self-join sides); the
    // output is an eager localCheckpoint so the cache releases immediately
    // and callers inherit no unpersist contract — the ngramJaccardPairs
    // convention for exactly this multi-consumer shape
    val wn0 = docs
      .select(col("doc_id"), explode(TextAnalysis.winnow(col("text"))).as("h"))
    val wn = if (materialize) wn0.cache() else wn0
    val hot = wn.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("h")
    // no broadcast hint (round policy for data-dependent sides): the hot
    // set is usually tiny, but on a heavily-templated corpus it is not
    // bounded by construction — AQE sizes the post-aggregate side
    val sel = wn.join(hot, Seq("h"), "left_anti")
    val out0 = sel.as("a")
      .join(sel.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    if (!materialize) return out0
    val out = out0.localCheckpoint(true)
    wn.unpersist()
    out
  }

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.
    * Shuffle profile at scale: explode to (shingle, id), one shuffle on
    * shingle, then an aggregation keyed on the pair.
    *
    * `maxDocFreq` is the stop-shingle cap: a shingle appearing in more than
    * that many documents is excluded from the self-join (the standard
    * defense against the skew bomb — one shingle in 1% of a 100 TB corpus
    * would otherwise put a quadratic candidate partition on one key). The
    * true set sizes (denominators) are computed BEFORE the cap, so surviving
    * pairs score true Jaccard minus at most the capped shingles'
    * intersection contribution — a conservative undercount. Measured
    * fixture max doc-frequency: 25 over the full sf0.1 corpus, 11 inside
    * q33's doc_id<1000 slice — a 4× margin to the default cap, so oracle
    * results stay bit-identical; re-measure if fixtures are regenerated. */
  def ngramJaccardPairs(
      docs: DataFrame,
      minJaccard: Double,
      maxDocFreq: Int = 100,
      materialize: Boolean = true): DataFrame = {
    val shAll0 = docs
      .select(col("doc_id"), explode(TextAnalysis.shingles(col("text"))).as("shingle"))
    // cached: the exploded shingle relation feeds FOUR subtrees (doc-freq
    // cap, both self-join sides, set sizes) and the shingle construction is
    // the dominant scan cost — same lesson as MinHash.pairs. The output is
    // an eager localCheckpoint so the cache can release immediately and the
    // caller inherits no unpersist contract.
    val shAll = if (materialize) shAll0.cache() else shAll0
    val hot = shAll.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("shingle")
    // the hot set is usually tiny (few shingles can exceed the cap) but not
    // bounded by construction — no broadcast hint, AQE sizes it (round
    // policy for data-dependent sides)
    val sh = shAll.join(hot, Seq("shingle"), "left_anti")
    val sizes = shAll.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast("double") /
      (col("sa.n") + col("sb.n") - col("inter"))
    val out0 = pairs
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
    if (!materialize) return out0
    val out = out0.localCheckpoint(true)
    shAll.unpersist()
    out
  }

  /** Corpus diff — the "what changed between crawls" report: classify
    * CONTENT (by hash) as added / removed / retained between two corpus
    * versions, with distinct-content and per-side document counts. The
    * first question an incremental-ingest owner asks before re-running
    * anything expensive downstream: a crawl whose `added` mass is tiny can
    * skip re-dedup entirely; a huge `removed` signals an upstream filter
    * change.
    *
    * Scale shape: each side collapses to (32-byte digest, count) first —
    * map-side combine, bodies never travel (the exact-dedup invariant) —
    * then one digest-keyed full outer join and a 3-row aggregate. A status
    * with no content yields no row (an empty diff is an empty table, not
    * fabricated zeros). */
  def corpusDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      textCol: String = "text"): DataFrame = {
    def byHash(d: DataFrame, h: String, cnt: String) = d
      .groupBy(sha2(col(textCol), 256).as(h))
      .agg(count(lit(1)).as(cnt))
    // null-safe join key: sha2(NULL) is NULL, and a null-rejecting join
    // would report NULL-text content as simultaneously added AND removed
    // when nothing changed — the one lie a diff report must never tell
    byHash(oldDocs, "__ho", "__no")
      .join(byHash(newDocs, "__hn", "__nn"),
        col("__ho") <=> col("__hn"), "full_outer")
      .select(
        when(col("__no").isNull, lit("added"))
          .when(col("__nn").isNull, lit("removed"))
          .otherwise(lit("retained")).as("status"),
        col("__no"), col("__nn"))
      .groupBy("status")
      .agg(
        count(lit(1)).as("n_contents"),
        coalesce(sum("__no"), lit(0L)).as("n_docs_old"),
        coalesce(sum("__nn"), lit(0L)).as("n_docs_new"))
  }
}
