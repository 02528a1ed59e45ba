package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation over a document corpus — the
  * composite an LLM-data engineer actually runs, wired from the operator
  * family: quality filter → exact dedup → near-dup dedup → enrichment
  * (lang-ID, token stats, fingerprint) → partitioned layout.
  *
  * Shuffle budget at 100 TB (the whole point of the composition order):
  *  1. quality filter: scan-side, zero shuffle, drops rows *before*
  *     anything pays for them;
  *  2. exact dedup: one shuffle on the 32-byte content digest (bodies
  *     travel once, only winners survive);
  *  3. near-dup dedup: MinHash-LSH on the (already much smaller) survivor
  *     set — candidates meet in buckets, never O(n²);
  *  4. enrichment: pure column expressions, fused into the scan;
  *  5. layout: partitionBy(lang) so downstream per-language training jobs
  *     prune at the directory level.
  */
object CorpusPrep {

  final case class Config(
      minChars: Long = 100,
      allowedLangs: Seq[String] = Seq("en", "es", "fr", "de", "zh"),
      nearDupMaxJaccardDist: Double = 0.2,
      stop: Seq[String] = TextAnalysis.DefaultStopwords)

  /** Quality gate (B36): scan-side predicates only. */
  def qualityFilter(docs: DataFrame, cfg: Config): DataFrame =
    docs.filter(
      col("n_chars") >= cfg.minChars &&
        col("lang").isin(cfg.allowedLangs.map(x => x: Any): _*) &&
        TextAnalysis.tokenCount(col("text")) > 0)

  /** Exact dedup keeping the lowest doc_id per content hash (B31). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val survivors = Dedup.exactSurvivors(docs).select(col("keep_id").as("doc_id"))
    docs.join(survivors, "doc_id")
  }

  /** Near-dup dedup (B32): drop the higher-id member of each seeded
    * MinHash candidate pair within the distance bound. The pair set from
    * minhashPairs arrives as an eager lineage-free localCheckpoint, so the
    * loser-id projection here is cheap and the blocks self-release via
    * ContextCleaner once this DataFrame goes out of scope. */
  def nearDedup(docs: DataFrame, cfg: Config): DataFrame = {
    val pairs = MinHash.pairs(docs, cfg.nearDupMaxJaccardDist)
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Enrichment columns (B34): all pure Column expressions. */
  def enrich(docs: DataFrame, cfg: Config): DataFrame =
    docs
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("stop_ratio", round(TextAnalysis.stopwordRatio(col("text"), cfg.stop), 4))
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))

  /** The full pipeline; returns the prepared frame (call `.write
    * .partitionBy("lang")` for the layout step). */
  def prepare(docs: DataFrame, cfg: Config = Config()): DataFrame =
    enrich(nearDedup(exactDedup(qualityFilter(docs, cfg)), cfg), cfg)
}
