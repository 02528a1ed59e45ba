package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM data pipelines (B34/B36).
  *
  * All pure `Column` expressions — they stay inside Catalyst, vectorize over
  * the parquet scan, and never leave whole-stage codegen (the difference
  * between "works on 60k docs" and "works on 100 TB of docs": a Scala UDF
  * here would serialize every row through a boxed lambda).
  */
object TextAnalysis {

  /** Shared default stopword list — single source for q28's oracle SQL, the
    * corpus-prep enrichment, and quality scoring (keep in sync by reference,
    * not by copy). */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of")

  /** Whitespace tokenization (the baseline split). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Evaluate `expr` ONCE per row and expose it to `body` as a lambda
    * variable. Higher-order-function lambda bodies re-evaluate every outer
    * expression reference per element (interpreted HOFs have no common-
    * subexpression elimination), so e.g. `slice(ts, i+1, k)` inside a
    * per-gram lambda re-runs the whole `split()` per gram — and one more
    * nesting level multiplies again: the first registered winnow build
    * cost O(windows × grams × tokens) ≈ 6 MINUTES at sf0.1 vs seconds
    * with the bindings. `transform` over a one-element array is the
    * standard binding idiom: the argument is evaluated once, the lambda
    * sees the materialized value. */
  private[llm] def bound(expr: Column)(body: Column => Column): Column =
    element_at(transform(array(expr), body), 1)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-style pre-tokenizer pattern, restricted to the constructs Java
    * regex and RE2 (DuckDB) implement identically — letter runs, digit
    * runs, punctuation runs, each with an optional leading space, plus
    * residual whitespace. Whitespace is the EXPLICIT class [ \t\n\x0B\f\r]
    * rather than `\s`, because the shorthand itself differs between the
    * engines (Java's \s includes vertical tab, RE2's does not). (The
    * upstream GPT-2 pattern's `(?!\S)` lookahead and `'ll`-style
    * contraction branches are dropped: RE2 has no lookahead, and the
    * fixture has no apostrophes to split.) */
  val BpePretokenPattern =
    " ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  /** BPE-ish token count: matches of the pre-tokenizer pattern, the number
    * a byte-pair encoder would START from (merges only shrink it). Group 0
    * — the pattern is alternation-only, no capture groups. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePretokenPattern), lit(0))).cast("long")

  /** Fraction of tokens found in `stop` (quality-scoring signal). */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val ts = tokens(text)
    size(filter(ts, t => t.isin(stop.map(x => x: Any): _*))) / size(ts)
  }

  /** Language-ID by disjoint marker-word profiles: argmax of profile hits,
    * 'unk' on ties/zero. Deterministic and SQL-replicable (oracle-checkable);
    * a production profile would be larger but identical in shape. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "los", "de"),
    "fr" -> Seq("le", "et", "dans"))

  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(filter(ts, t => t.isin(words.map(x => x: Any): _*)))
    }
    scores.foldLeft(lit("unk")) { case (acc, (lang, score)) =>
      val others = scores.filter(_._1 != lang).map(_._2)
      when(others.foldLeft(score > 0)((c, o) => c && score > o), lang).otherwise(acc)
    }
  }

  /** Canonical-text fingerprint: lowercase, collapse whitespace, SHA-256.
    * Rolling/locality-sensitive variants: [[winnow]] (substring-level),
    * [[Dedup.simhash64]] (document-level). */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** MOSS-style winnowing fingerprint (Schleimer/Wilkerson/Aiken 2003): hash
    * every `k`-token gram IN SEQUENCE (positional, not distinct — the rolling
    * structure is the point), slide a window of `w` consecutive gram hashes,
    * and keep the minimum of each window. Guarantee: any shared token run of
    * length ≥ w+k-1 between two documents contributes at least one shared
    * selected hash, at an expected density of ~2/(w+1) of the grams — the
    * substring-matching fingerprint that exact/SimHash fingerprints can't
    * provide.
    *
    * The gram hash is a 16-hex-char SHA-256 prefix compared as a STRING:
    * lexicographic min over lowercase hex is identical in Spark and DuckDB,
    * which makes the whole operator oracle-checkable (q63) — unlike
    * xxhash64, which DuckDB cannot reproduce. Pure Column throughout; the
    * output is the sorted distinct selection (a set fingerprint: containment
    * joins on it find shared-substring candidates).
    *
    * Degenerate inputs: fewer than k tokens → empty fingerprint; fewer than
    * w grams → the single global-min hash (one window covering everything).
    */
  def winnow(text: Column, k: Int = 3, w: Int = 4): Column =
    bound(tokens(text)) { ts =>
      val gramsExpr = when(size(ts) >= k,
        transform(sequence(lit(0), size(ts) - k),
          i => substring(sha2(concat_ws(" ", slice(ts, i + 1, lit(k))), 256), 1, 16)))
        .otherwise(array().cast("array<string>"))
      bound(gramsExpr) { grams =>
        when(size(grams) >= w,
          array_sort(array_distinct(
            transform(sequence(lit(0), size(grams) - w),
              j => array_min(slice(grams, j + 1, lit(w)))))))
          .otherwise(when(size(grams) > 0, array(array_min(grams)))
            .otherwise(array().cast("array<string>")))
      }
    }

  /** Corpus token vocabulary: the `k` most frequent tokens with counts —
    * the heavy-hitters pass behind tokenizer-vocab building and stopword
    * discovery. Shape at 100 TB: explode → hash aggregate (map-side partial
    * combine collapses each partition to its distinct tokens before the
    * shuffle — token frequency follows Zipf, so the combine is ~100%
    * effective on hot tokens) → global top-k, which Spark plans as
    * TakeOrderedAndProject (per-partition heaps + k-row driver merge), not
    * a full sort. Ties break on the token string so the cut is
    * deterministic. */
  def tokenVocab(
      docs: org.apache.spark.sql.DataFrame,
      k: Int = 100): org.apache.spark.sql.DataFrame =
    docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)

  /** CCNet-style unigram log-probability quality score: fit a unigram LM on
    * the corpus itself (token → count / total) and score each document by
    * the average log-probability of its tokens. Documents full of rare or
    * garbled tokens score far below fluent text — the classic
    * perplexity-proxy gate run before anything expensive sees the corpus
    * (CCNet uses a pretrained KenLM; the self-fit unigram is the same
    * decision shape without shipping an external model).
    *
    * Scale shape: one explode + hash aggregate builds the LM (vocab-sized,
    * Zipf-collapsed map-side); the LM joins back against the token stream
    * and a second hash aggregate folds per-document averages — the corpus
    * shuffles (doc_id, token) once, bodies never. The LM side carries NO
    * broadcast hint on purpose: at web scale the raw vocabulary is 1e8+
    * rows of crawl garbage and a forced broadcast is a driver OOM — AQE
    * broadcasts it when the (accurately-sized, post-aggregate) table fits
    * and falls back to a shuffled join when it doesn't. `minCount` is the
    * production lever: dropping hapax/rare tokens from the LM shrinks it
    * ~10× under Zipf; tokens outside the LM score at the half-count
    * smoothing floor ln(0.5/total) — CCNet's fixed-vocab + OOV-penalty
    * decision shape. The default 1 keeps every token (exact self-fit LM).
    * The average is rounded to 4 decimals (q02's lesson: cross-engine
    * double-sum ordering differs in the last ulps, rounding makes it
    * checkable). NULL/tokenless documents survive with n_tokens = 0 and a
    * null score (the encodeCorpus convention — a quality gate that silently
    * DROPS empty documents would un-join them from the corpus without
    * signal; a null score lets the caller decide their fate). */
  def unigramLogProb(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"bad minCount: $minCount")
    val toks = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    // total over the FULL stream (capping the LM must not inflate the kept
    // tokens' probabilities); 1-row side, broadcast by construction
    val total = broadcast(counts.agg(sum("cnt").as("total")))
    val lm = counts.filter(col("cnt") >= minCount)
    val scored = toks
      .join(lm, Seq("token"), "left")
      .crossJoin(total)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(
          coalesce(col("cnt").cast("double"), lit(0.5)) / col("total"))), 4)
          .as("avg_logprob"))
    // tokenless docs never reach the explode; reinstate them scan-side
    val empties = docs
      .filter(size(filter(tokens(coalesce(col(textCol), lit(""))),
        t => t =!= "")) === 0)
      .select(col("doc_id"), lit(0L).as("n_tokens"),
        lit(null).cast("double").as("avg_logprob"))
    scored.unionByName(empties)
  }

  /** Exact TF-IDF top terms per document — the interpretable sibling of the
    * hashed [[tfidf]] pipeline (that one feeds models; this one answers
    * "what is this document about" and is value-checkable). tf = positional
    * term count in the doc; idf = ln((N+1)/(df+1)) with add-one smoothing;
    * top `k` terms by the ROUNDED score with a lexicographic tie-break, so
    * the cut is deterministic and engine-independent.
    *
    * Scale shape: tf is one (doc_id, term) hash aggregate; df is a distinct
    * + aggregate on the same exploded stream (vocab-sized — joined WITHOUT
    * a broadcast hint, same reasoning as [[unigramLogProb]]: AQE broadcasts
    * the accurately-sized aggregate when it fits, shuffles when a web-scale
    * vocabulary doesn't); N is a 1-row aggregate (broadcast by
    * construction). The final top-k per doc is a rank-limit window, which
    * Spark executes as WindowGroupLimit — per-partition top-k heaps before
    * the shuffle, not a full sort of the scored stream. */
  def tfIdfTopTerms(
      docs: org.apache.spark.sql.DataFrame,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r19 measured A/B, then reverted: spreading this scan raised par
    // 1.1 → 9 but the wall went 1.16 → 1.42 s across three passes — the
    // exchange + lost scan locality cost more than the serial stage here
    // (unlike bm25TopDocs, whose tf checkpoint amortizes the spread)
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 4))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "term", "tf", "score")
  }

  /** TF-IDF feature pipeline (B34): tokenize → stopwords → n-grams-optional
    * → hashed TF → IDF. Returns the fitted model's output frame with a
    * `tfidf` vector column; all stages are MLlib Transformers, so the same
    * pipeline object serves train and inference sides. */
  def tfidf(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      numFeatures: Int = 1 << 16): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF, StopWordsRemover, Tokenizer}
    val tok = new Tokenizer().setInputCol(textCol).setOutputCol("__tokens")
    val stop = new StopWordsRemover().setInputCol("__tokens").setOutputCol("__terms")
    val tf = new HashingTF().setInputCol("__terms").setOutputCol("__tf")
      .setNumFeatures(numFeatures)
    val pre = tf.transform(stop.transform(tok.transform(docs)))
    val idf = new IDF().setInputCol("__tf").setOutputCol("tfidf").fit(pre)
    idf.transform(pre).drop("__tokens", "__terms", "__tf")
  }

  /** PII scrub patterns, restricted (like [[BpePretokenPattern]]) to regex
    * constructs Java regex and RE2 implement identically — no lookarounds,
    * no backrefs; `\b`, classes and bounded repetition only. Order matters:
    * emails first (their local parts contain digit runs a later rule would
    * otherwise mangle mid-address). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // email addresses
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    // NANP-style phone numbers: 555-0100 forms with -, . or space separators
    "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b" -> "<PHONE>",
    // long bare digit runs (account ids, SSN-like 9+)
    "\\b[0-9]{9,}\\b" -> "<ID>")

  /** Redact PII in-place (B36 hygiene step): sequential `regexp_replace`
    * passes, all-occurrence semantics on both engines (Spark replaces all by
    * default; the oracle passes the 'g' option). Pure Column — the scrub
    * fuses into the corpus scan, which is the only shape that survives
    * 100 TB (a row-at-a-time scrubber UDF would bottleneck every pipeline
    * that embeds it). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** POSITIONAL `n`-grams, in sequence with repeats (contrast [[shingles]],
    * which is distinct — here the repeats ARE the signal). Empty for
    * documents with fewer than `n` tokens. */
  def positionalNgrams(text: Column, n: Int): Column =
    bound(tokens(text)) { ts =>
      when(size(ts) >= n,
        transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Fraction of positional `n`-grams that are repeats of an earlier one —
    * the Gopher/MassiveText "repetition" quality signal (duplicate-heavy
    * documents are boilerplate/spam and poison training). 0.0 for documents
    * with fewer than `n` tokens; (total - distinct) / total otherwise.
    * Integer-to-double division is IEEE-deterministic, so the value is
    * oracle-checkable bit-exactly. */
  def duplicateNgramFraction(text: Column, n: Int = 2): Column =
    bound(positionalNgrams(text, n)) { g =>
      when(size(g) > 0,
        (size(g) - size(array_distinct(g))).cast("double") / size(g).cast("double"))
        .otherwise(lit(0.0))
    }

  /** `k`-word shingles (distinct), the unit for Jaccard/MinHash dedup.
    * Guarded: `sequence(0, n-k)` would run *descending* for n < k. */
  def shingles(text: Column, k: Int = 3): Column =
    bound(tokens(text)) { ts =>
      when(size(ts) >= k,
        array_distinct(
          transform(sequence(lit(0), size(ts) - k),
            i => concat_ws(" ", slice(ts, i + 1, lit(k))))))
        .otherwise(array().cast("array<string>"))
    }

  /** POSITIONAL `k`-word shingles (NOT distinct — index i holds the
    * shingle starting at token i): the unit for span-level
    * decontamination, where the match's LOCATION matters, not just its
    * existence. Same guard as [[shingles]]. */
  def positionalShingles(text: Column, k: Int = 3): Column =
    bound(tokens(text)) { ts =>
      when(size(ts) >= k,
        transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Bigram-LM quality score — the sequential step past [[unigramLogProb]]:
    * fit a maximum-likelihood bigram model on the corpus itself
    * (P(b|a) = C(a,b)/ΣC(a,·), probabilities summing to 1 per context) and
    * score each document by the average log-probability of its bigrams.
    * Word-salad documents whose unigrams are individually common score far
    * below fluent text — the signal a unigram gate cannot see. Self-fit ⇒
    * every scored bigram exists in the model, so no OOV smoothing arm.
    *
    * Scale shape: the bigram fan-out is row-local (transform over the
    * token array — one row per adjacent pair, T−1 per document); ONE
    * (pair)-keyed shuffle builds the LM with map-side combine absorbing
    * the Zipf head; context totals aggregate the vocabulary-sized LM, not
    * the corpus; both join back WITHOUT broadcast hints (crawl-scale
    * bigram vocabularies are 1e9+ rows — AQE broadcasts the measured
    * post-aggregate table only when it fits, the unigramLogProb LM
    * precedent). The average is rounded to 4 decimals (cross-engine
    * double-sum ordering, q02's lesson) and guarded by
    * scripts/boundary_guard.py. Documents with <2 tokens survive with
    * n_bigrams = 0 and a null score (the encodeCorpus convention). */
  def bigramLogProb(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toksExpr = filter(tokens(coalesce(col(textCol), lit(""))), t => t =!= "")
    // bind the token array once per row ([[bound]]): element_at inside the
    // per-index lambda would otherwise re-run the whole split per bigram —
    // O(T²) splits per document (the winnow lesson, measured 12 s → ~1 s
    // at sf0.1 on this operator)
    val bigramsExpr = bound(toksExpr) { arr =>
      when(size(arr) >= 2,
        transform(sequence(lit(0), size(arr) - 2), i =>
          struct(element_at(arr, i + 1).as("ta"),
            element_at(arr, i + 2).as("tb"))))
        .otherwise(array().cast("array<struct<ta:string,tb:string>>"))
    }
    // r19 A/B, reverted: spread read 1.36 → 1.49 s (three passes) — the
    // bigram explode feeds two self-joins whose exchanges dominate
    val bg = docs
      .select(col("doc_id"), explode(bigramsExpr).as("bg"))
      .select(col("doc_id"), col("bg.ta").as("ta"), col("bg.tb").as("tb"))
    val lm = bg.groupBy("ta", "tb").agg(count(lit(1)).as("nab"))
    val ctx = lm.groupBy("ta").agg(sum("nab").as("na"))
    val scored = bg
      .join(lm, Seq("ta", "tb"))
      .join(ctx, Seq("ta"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("nab").cast("double") / col("na"))), 4)
          .as("avg_logprob2"))
    val empties = docs
      .filter(size(toksExpr) < 2)
      .select(col("doc_id"), lit(0L).as("n_bigrams"),
        lit(null).cast("double").as("avg_logprob2"))
    scored.unionByName(empties)
  }

  /** Windowed token co-occurrence counts — the raw material of PMI /
    * word-association analysis (word2vec's skip-gram statistic, computed
    * exactly). A pair is counted once per (position, offset) occurrence of
    * two tokens at distance 1..`window` in the same document, unordered
    * (the pair is emitted lexicographically so "a b" and "b a" collapse).
    * Emits the top `k` pairs with their exact count plus each member's
    * exact corpus frequency — everything integer, so callers derive PMI =
    * ln(n_ab·N / (n_a·n_b)) at whatever precision they want and the
    * emitted table is hash-exact cross-engine.
    *
    * Scale shape: this is deliberately WINDOWED, not per-document
    * all-pairs — a T-token document yields ≤ T·window pairs, not T², so
    * boilerplate mega-docs can't detonate the pair space. The pairing is
    * an equi-join of the positional token table to itself on
    * (doc_id, pos + offset) after a row-local explode of offsets 1..window
    * — no range join, no cartesian; Zipf-headed pair counts collapse in
    * map-side partial aggregation before the one (pair)-keyed shuffle. The
    * final top-k is a single `orderBy.limit` (per-partition heaps under
    * TakeOrderedAndProject, no global sort materialization). */
  def cooccurrence(
      docs: org.apache.spark.sql.DataFrame,
      window: Int = 2,
      k: Int = 100): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"bad window: $window")
    require(k >= 1, s"bad k: $k")
    val pos = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    val left = pos.select(col("doc_id"), col("pos"), col("token").as("__ta"))
      .withColumn("__d", explode(sequence(lit(1), lit(window))))
      .withColumn("__pb", col("pos") + col("__d"))
    val pairs = left.join(
        pos.select(col("doc_id"), col("pos").as("__pb"), col("token").as("__tb")),
        Seq("doc_id", "__pb"))
      .select(
        least(col("__ta"), col("__tb")).as("token_a"),
        greatest(col("__ta"), col("__tb")).as("token_b"))
      .groupBy("token_a", "token_b").agg(count(lit(1)).as("n_ab"))
    val freq = pos.groupBy("token").agg(count(lit(1)).as("n"))
    pairs
      .join(freq.select(col("token").as("token_a"), col("n").as("n_a")), "token_a")
      .join(freq.select(col("token").as("token_b"), col("n").as("n_b")), "token_b")
      .select("token_a", "token_b", "n_ab", "n_a", "n_b")
      .orderBy(col("n_ab").desc, col("token_a"), col("token_b"))
      .limit(k)
  }

  /** Cross-source vocabulary overlap — for every pair of corpus sources,
    * the exact distinct-token intersection and per-source vocabulary
    * sizes. The drift/contamination dashboard number: a source pair whose
    * overlap ratio jumps between crawls signals template bleed or
    * duplicated feeds; callers derive Jaccard = common/(a+b−common) from
    * the exact integers (never ship the division — hash the counts).
    *
    * Scale shape: one distinct on (source, token) collapses the corpus to
    * vocabulary size per source (map-side partial distinct absorbs the
    * Zipf head), then a self-equi-join ON TOKEN (never a source×source
    * cross join) counts intersections; vocab sizes join on the tiny
    * sources-sized key. Pair ordering `source_a < source_b` halves the
    * join output and fixes the output orientation. The sizes side carries
    * NO broadcast hint: its cardinality is data-dependent (sources may be
    * raw domains at crawl scale) — AQE broadcasts the post-aggregate table
    * when its measured size fits, the unigramLogProb LM precedent. */
  def vocabOverlap(
      docs: org.apache.spark.sql.DataFrame,
      sourceCol: String = "source"): org.apache.spark.sql.DataFrame = {
    val vocab = docs
      .select(col(sourceCol).as("source"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n_vocab"))
    val common = vocab.as("a")
      .join(vocab.as("b"), col("a.token") === col("b.token") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n_vocab", "n_vocab_a"), "source_a")
      .join(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n_vocab", "n_vocab_b"), "source_b")
      .select("source_a", "source_b", "n_common", "n_vocab_a", "n_vocab_b")
  }

  /** Character-level Shannon entropy of the text — the information-density
    * quality signal (boilerplate/binary-ish text sits far from natural
    * language's ~4 bits/char). Row-local via the codegen
    * [[graft.functions.CharEntropy]] expression: the explode→groupBy(doc,
    * char) formulation shuffles one row per CHARACTER of the corpus; this
    * shuffles nothing. */
  def charEntropy(text: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    call_function(graft.functions.GraftFunctions.CharEntropyName, text)
  }

  /** Exact heavy-hitter tokens via the two-phase sketch-screen shape:
    * a capacity-`capacity` Misra-Gries sketch over the token stream yields
    * ≤ capacity CANDIDATES (sound for any threshold ≥ n/(capacity+1): no
    * true heavy hitter can be absent — [[graft.functions.MisraGriesAgg]]),
    * then one broadcast semi-join + bounded aggregate exact-confirms
    * `count·denom > n`. At 100 TB the token stream aggregates map-side
    * into k-entry sketch buffers and only candidate-token rows reach the
    * confirming aggregate; the corpus never shuffles on token.
    *
    * Returns tokens with exact count strictly greater than n/denom.
    * Requires capacity ≥ denom (else the screen's error bound n/(k+1)
    * exceeds the threshold and candidates could be missed). */
  def heavyHitterTokens(
      docs: org.apache.spark.sql.DataFrame,
      capacity: Int,
      denom: Int): org.apache.spark.sql.DataFrame = {
    require(capacity >= denom,
      s"capacity $capacity < denom $denom: the MG bound n/(k+1) must not " +
        "exceed the n/denom threshold or the screen can miss heavy hitters")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs
      .select(explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val candidates = tok
      .agg(call_function(graft.functions.GraftFunctions.MisraGriesName,
        col("token"), lit(capacity)).as("sk"))
      .select(explode(col("sk")).as(Seq("token", "est")))
      .select("token")
    val total = tok.agg(count(lit(1)).as("n_total"))
    tok.join(broadcast(candidates), "token")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * denom > col("n_total"))
      .select("token", "cnt", "n_total")
  }

  /** One BM25 term contribution (Okapi, k1=1.2 b=0.75, the Lucene-style
    * always-positive idf) as a SHARED expression string — the oracle SQL
    * embeds the identical text, so both engines run the same IEEE op
    * sequence on the same bits and only `ln`'s libm ulp can differ
    * (guarded by the q142 boundary probe). Columns it references:
    * tf, df, dl, n_docs (longs) and avgdl (double). */
  val Bm25TermExpr: String =
    "ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))" +
      " * (CAST(tf AS DOUBLE) * 2.2)" +
      " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))"

  /** BM25 retrieval (B34): score documents against a set of term queries
    * through the inverted-posting equi-join — the decontamination /
    * eval-set-search shape ("which training docs score highest against
    * this eval query"). Per-term contributions are quantized to integer
    * 1e-4 units (`floor(w·1e4 + 0.5)` — same three IEEE ops both engines,
    * the q121 convention) BEFORE the per-(query, doc) sum, so the
    * cross-row fold is an exact BIGINT sum — order-free, hashable — and
    * ranking (quantized score desc, doc_id) is fully deterministic.
    * Scale shape: postings and doc-length join map-side-combined
    * aggregates; corpus stats ride a 1-row broadcast; top-k per query is
    * a rank-window over the (query, doc) aggregate, never the corpus.
    *
    * @param queries columns (`qid`: long, `term`: string), distinct terms
    * @return (qid, rk, doc_id, n_hit, score) — top `k` docs per query
    */
  def bm25TopDocs(
      docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      k: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one explode → tf; dl and df DERIVE from tf (Σtf per doc, rows per
    // term) instead of re-scanning the exploded tokens — at corpus scale
    // the token explode is the dominant cost and must run once.
    // r18: spread the scan before the explode — the corpus fixture arrives
    // as one split and the tokenize+tf stage ran near-serial (q142: par
    // ≈ 1.4 on 32 cores); no-op once inputs have real splits (guide §2.5)
    val toks = graft.operators.Parallelism.spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val meta = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum("dl").as("sum_dl")))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val perTerm = queries
      .join(tf, "term")
      .join(dl, "doc_id")
      .join(df, "term")
      .crossJoin(broadcast(meta))
      .withColumn("q4",
        expr(s"CAST(floor(($Bm25TermExpr) * 10000.0 + 0.5) AS BIGINT)"))
    val agg = perTerm.groupBy("qid", "doc_id")
      .agg(count(lit(1)).cast("int").as("n_hit"), sum("q4").as("s"))
    val w = Window.partitionBy("qid").orderBy(col("s").desc, col("doc_id"))
    agg
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .withColumn("score", col("s").cast("double") / lit(10000.0))
      .select("qid", "rk", "doc_id", "n_hit", "score")
  }
}
