package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CorpusPrepSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf0001, "documents")
  private val cfg = CorpusPrep.Config()

  test("prepared corpus holds every invariant of the pipeline") {
    val out = CorpusPrep.prepare(docs, cfg).cache()
    assert(out.count() > 0)
    // quality gate
    assert(out.filter(col("n_chars") < cfg.minChars).count() == 0)
    assert(out.filter(!col("lang").isin(cfg.allowedLangs.map(x => x: Any): _*)).count() == 0)
    // exact dedup: content hashes unique
    val n = out.count()
    assert(out.select(sha2(col("text"), 256)).distinct().count() == n)
    // near-dup: no surviving pair within the distance bound — checked with
    // the SAME generator nearDedup uses (MinHash.pairs); the MLlib twin
    // bucketizes in a different hash family and scores hashed-space
    // jaccard, so a zero-survivor invariant only holds generator-vs-itself
    assert(MinHash.pairs(out.select("doc_id", "text"),
      cfg.nearDupMaxJaccardDist).count() == 0)
    // enrichment columns present and sane
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    assert(out.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(out.filter(length(col("fingerprint")) =!= 64).count() == 0)
    out.unpersist()
  }

  test("pipeline is idempotent: preparing a prepared corpus is identity") {
    val once = CorpusPrep.prepare(docs, cfg)
      .select("doc_id", "text", "lang", "source", "n_chars").cache()
    val twice = CorpusPrep.prepare(once, cfg)
    assert(twice.count() == once.count())
    assert(once.select("doc_id").exceptAll(twice.select("doc_id")).count() == 0)
    once.unpersist()
  }
}
