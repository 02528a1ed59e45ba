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

  test("near-dedup keeps exactly the component minima of its pair graph") {
    val input = CorpusPrep.exactDedup(CorpusPrep.qualityFilter(docs, cfg)).cache()
    val out = CorpusPrep.nearDedup(input, cfg)
    val comps = Components.connected(
      MinHash.pairs(input.select("doc_id", "text"), cfg.nearDupMaxJaccardDist))
    val minima = comps.filter(col("id") === col("component"))
      .select(col("id").as("doc_id"))
    val paired = comps.select(col("id").as("doc_id"))
    // survivors = (docs in no pair at all) ∪ (min id of each family)
    val expected = input.select("doc_id").exceptAll(paired).unionByName(minima)
    assert(out.select("doc_id").exceptAll(expected).count() == 0)
    assert(expected.exceptAll(out.select("doc_id")).count() == 0)
    input.unpersist()
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
