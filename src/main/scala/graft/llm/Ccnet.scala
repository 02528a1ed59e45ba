package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data"): per LANGUAGE, order documents by language-model score
  * (best first) and cut the corpus into three buckets at 1/3 and 2/3 of
  * the CUMULATIVE SIZE — not document count — so each bucket holds a
  * third of the data. Production pipelines then train on `head` (or
  * sample buckets at different rates); the bucket label is the
  * curation signal this tier exists to produce.
  *
  * A document is assigned by where it STARTS in the sorted prefix: with
  * `before` = cumulative chars of strictly-better docs, bucket = head if
  * 3·before < tot, middle if 3·before < 2·tot, else tail — so the
  * best-scoring doc is always head (even when it alone spans a third),
  * and a single-doc language is head, not an artifact tail.
  *
  * Determinism contract: the LM score is [[TextAnalysis.unigramLogProb]]'s
  * ROUNDED (4dp) per-doc average — cross-engine certified by q83 and the
  * boundary guard — with doc_id as the total tie-break; the size cuts are
  * CROSS-MULTIPLIED INTEGERS on exact char counts, so no division touches
  * the bucket decision. Docs with no tokens (null score) sort last within
  * their language (worst perplexity — nothing measurable about them).
  *
  * Scale shape: one LM fit (token hash-aggregate, AQE-sized join), then
  * ONE window shuffle partitioned by language. Languages are the natural
  * partition key at corpus scale; a skewed mega-language makes the
  * within-language running sum a single-partition scan — at that point
  * shard the window by (lang, hash-range) and merge cuts, the q88
  * calendar-chunking treatment. The cumulative sum itself is
  * unavoidable: the CUT RULE is defined on the sorted prefix. */
object Ccnet {

  /** Curriculum training order over [[buckets]] — the composite a
    * quality-bucketed corpus feeds a trainer with: every shard consumes
    * its docs head → middle → tail (curriculum learning on the CCNet
    * signal), deterministically shuffled WITHIN each bucket by the q89
    * multiplicative hash (reruns and retries see the same order, no
    * seeded rand). Positions are PER SHARD, not global — a global
    * sequence number is a single-partition sort; per-shard offsets are
    * how distributed training actually consumes data (the q178 shard
    * discipline). One window shuffle partitioned by shard. */
  def curriculum(docs: DataFrame, shards: Int = 8): DataFrame = {
    require(shards >= 1, s"bad shards: $shards")
    val hk = pmod(pmod(pmod(col("doc_id"), lit(1000003L))
      * lit(2654435761L), lit(999999937L)), lit(1000000L))
    val brank = when(col("bucket") === "head", lit(0))
      .when(col("bucket") === "middle", lit(1)).otherwise(lit(2))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("brank"), col("hk"), col("doc_id"))
    buckets(docs)
      .withColumn("hk", hk)
      .withColumn("shard", pmod(col("hk"), lit(shards.toLong)).cast("int"))
      .withColumn("brank", brank)
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("lang"), col("bucket"),
        col("shard"), col("pos"))
  }

  /** Per-doc bucket assignment: (doc_id, lang, n_chars, cum_chars,
    * bucket ∈ head|middle|tail). */
  def buckets(docs: DataFrame): DataFrame = {
    val lp = TextAnalysis.unigramLogProb(docs)
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(lp.select(col("doc_id"), col("avg_logprob")), Seq("doc_id"))
    val order = Window.partitionBy(col("lang"))
      .orderBy(col("avg_logprob").desc_nulls_last, col("doc_id"))
    val cum = sum(col("n_chars")).over(
      order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tot = sum(col("n_chars")).over(Window.partitionBy(col("lang")))
    base
      .withColumn("cum_chars", cum)
      .withColumn("tot_chars", tot)
      .withColumn("before", col("cum_chars") - col("n_chars"))
      .withColumn("bucket",
        when(lit(3) * col("before") < col("tot_chars"), lit("head"))
          .when(lit(3) * col("before") < lit(2) * col("tot_chars"),
            lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("cum_chars"), col("bucket"))
  }
}
