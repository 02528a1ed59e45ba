package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trigram-postings substring search — `LIKE '%pattern%'` at corpus
  * scale without the full scan per query: a substring match must
  * contain every trigram of the pattern, so an inverted index of
  * distinct document trigrams prunes the corpus to candidate docs
  * first (the pg_trgm / Google Code Search design, Cox 2012), and the
  * exact `contains` check runs only on the candidates. q209's phrase
  * search needs tokenized positional postings; this answers arbitrary
  * substring literals, tokenization-free.
  *
  * Candidate soundness: contains(text, p) ⟹ every trigram of p is a
  * substring of text — so trigram-AND candidacy can only OVER-select,
  * never miss a true match (the screen-then-verify shape of the
  * MinHash/Bloom families). Docs shorter than 3 chars have no
  * trigrams and can match no ≥3-char pattern; they drop at the scan.
  *
  * Scale shape: postings build is one explode of DISTINCT per-doc
  * trigrams (codegen HOFs — sequence/transform/array_distinct, no
  * UDF) + one (tri)-keyed aggregate-free join; pattern trigrams are a
  * broadcast-sized literal frame; candidacy is one (pattern, doc)
  * aggregate; verification joins candidates (query-sized) back to the
  * docs by id. The corpus shuffles on trigram ONCE per index build —
  * a persisted index amortizes it across queries (the q93 digest-
  * index pattern). */
object TrigramIndex {

  /** (tri, doc_id) — distinct trigrams per document. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // r19: spread the scan before the trigram explode (guide §2.5 input
    // starvation — the r18 q142/q230 precedent: a few-MB fixture arrives
    // as ONE split and this codegen-heavy stage ran serial, q226 par ≈
    // 1.4 on 32 cores; no-op once inputs have real splits)
    graft.operators.Parallelism.spread(docs).filter(length(col(textCol)) >= 3)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, length($textCol) - 2), i -> substring($textCol, i, 3))")))
          .as("tri"))

  /** Distinct trigrams of each pattern, Scala-side (patterns are a
    * pinned query-sized set). */
  def patternTris(patterns: Seq[String]): Seq[(String, String)] =
    patterns.flatMap { p =>
      require(p.length >= 3, s"pattern needs >= 3 chars: '$p'")
      p.sliding(3).toSeq.distinct.map(t => (p, t))
    }

  /** Per pattern: candidate count from the index vs exact match count
    * — (pattern, n_candidates, n_matched). */
  def search(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val post = postings(docs, idCol, textCol)
    val pats = patternTris(patterns).toDF("pattern", "tri")
    val nTris = pats.groupBy("pattern").agg(count(lit(1)).as("n_tris"))
    // candidate: the doc holds EVERY distinct trigram of the pattern
    val cand = post.join(broadcast(pats), Seq("tri"))
      .groupBy("pattern", "doc_id")
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(nTris), Seq("pattern"))
      .filter(col("n_hit") === col("n_tris"))
      .select(col("pattern"), col("doc_id"))
    val counted = cand
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
        Seq("doc_id"))
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(expr("contains(__t, pattern)"), 1L).otherwise(0L))
          .as("n_matched"))
    // every pattern emits, 0/0 when the index pruned the whole corpus
    // — the result is query-shaped, never silently smaller
    patterns.distinct.toDF("pattern")
      .join(counted, Seq("pattern"), "left")
      .select(col("pattern"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
  }
}
