package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document SUBSTRING-level duplication (B31's finest granularity):
  * find every length-`n` token window that recurs across ≥ `minDocs`
  * distinct documents — the construction behind "train-set memorization
  * comes from repeated substrings, not repeated documents" (Lee et al.
  * 2021's ExactSubstr, re-expressed relationally). [[Dedup]] removes
  * whole duplicate documents and q77 drops repeated SEGMENTS
  * (line-level); this operator finds the repeated spans that survive
  * both — boilerplate headers, licence blocks, quoted chunks — which a
  * training-data pipeline masks or down-weights rather than drops.
  *
  * Shape, all codegen (no UDF): tokenize → one `posexplode` of the
  * per-row window array (`transform(sequence(...), slice)` — row-local,
  * zero shuffle) → ONE shuffle keyed on the window to count distinct
  * docs per gram → left-semi join back (second shuffle, same key, so AQE
  * coalesces both onto one exchange footprint) → per-doc aggregate.
  *
  * Scale path (`hashKeys = true`, the default): the shuffle key is a
  * 128-bit xxhash64 pair of the gram instead of the gram string itself —
  * at 100 TB an 8-token window averages ~50 bytes and the key column
  * dominates the exchange; two independent 64-bit hashes make a
  * collision on any given key pair ~2⁻¹²⁸-improbable, and a collision
  * only ever OVERCOUNTS a span as repeated (conservative for masking).
  * `hashKeys = false` keeps the raw gram as the key so the whole
  * operator is DuckDB-replicable — q130's oracle runs that
  * configuration; SubstringDedupSpec pins hashKeys=true ≡ false on the
  * fixture.
  */
object SubstringDedup {

  /** Per-document summary of repeated spans: window positions whose
    * `n`-gram occurs in ≥ `minDocs` distinct documents. Columns
    * (doc_id, n_repeated_spans, n_repeated_grams, first_idx) are all
    * integers — hash-exact cross-engine. */
  def repeatedSpans(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      hashKeys: Boolean = true): DataFrame = {
    require(n >= 2, s"window must be >= 2 tokens, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val spans = spanGrams(docs, n)
    val key: Column =
      if (hashKeys) struct(xxhash64(col("gram")), xxhash64(col("gram"), lit(1L)))
      else col("gram")
    val keyed = spans.withColumn("k", key)
    val repeated = keyed
      .groupBy("k")
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("k")
    keyed
      .join(repeated, Seq("k"), "left_semi")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_repeated_spans"),
        count_distinct(col("k")).as("n_repeated_grams"),
        min(col("start_idx")).as("first_idx"))
  }

  /** (doc_id, start_idx, gram) for every length-`n` token window — the
    * row-local fan-out both [[repeatedSpans]] paths share. `start_idx`
    * is the 0-based token index of the window start. */
  private[llm] def spanGrams(docs: DataFrame, n: Int): DataFrame = {
    val ts = split(trim(col("text")), "\\s+")
    // spread: the window fan-out + per-window string build is the cpu-heavy
    // stage and inherits the scan's split count (r10 A/B: q130 2.96 → 2.49 s)
    graft.operators.Parallelism.spread(docs)
      .select(col("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("ts")) - n),
          i => array_join(slice(col("ts"), i + lit(1), lit(n)), " "))))
      .withColumnRenamed("pos", "start_idx")
      .withColumnRenamed("col", "gram")
  }
}
