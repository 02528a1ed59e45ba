package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted dedup-history index: build/update maintenance and value-
  * identity between the index-backed and corpus-rescan incremental paths. */
class DedupIndexSpec extends SparkSpec {

  private def tmpIndex(tag: String): String =
    Files.createTempDirectory(s"graft_idx_$tag").resolve("index").toString

  test("build writes one distinct 32-byte digest per distinct text") {
    import spark.implicits._
    val docs = ((0 until 50).map(i => (i.toLong, s"doc body $i")) ++
      (0 until 10).map(i => (100L + i, s"doc body $i"))) // 10 exact copies
      .toDF("doc_id", "text")
    val path = tmpIndex("build")
    DedupIndex.build(docs, path)
    val idx = spark.read.parquet(path)
    assert(idx.count() == 50)
    assert(idx.columns.toSeq == Seq(DedupIndex.HashCol))
    assert(idx.select(max(length(col(DedupIndex.HashCol)))).head().getInt(0) == 32)
  }

  test("update appends only unseen digests and is idempotent") {
    import spark.implicits._
    val history = (0 until 40).map(i => (i.toLong, s"hist $i")).toDF("doc_id", "text")
    val path = tmpIndex("update")
    DedupIndex.build(history, path)
    // batch: 10 re-ingests + 15 new
    val batch = ((0 until 10).map(i => (500L + i, s"hist $i")) ++
      (0 until 15).map(i => (600L + i, s"new doc $i"))).toDF("doc_id", "text")
    DedupIndex.update(batch, path)
    assert(spark.read.parquet(path).count() == 55)
    DedupIndex.update(batch, path) // replaying the same batch adds nothing
    assert(spark.read.parquet(path).count() == 55)
    assert(spark.read.parquet(path).distinct().count() == 55)
  }

  test("index-backed incremental dedup equals the corpus-rescan path exactly") {
    import spark.implicits._
    val history = (0 until 300).map(i => (i.toLong, s"hist doc $i body")).toDF("doc_id", "text")
    val batch = ((0 until 25).map(i => (1000L + i, s"hist doc ${i * 7} body")) ++
      (0 until 60).map(i => (2000L + i, s"fresh doc $i"))).toDF("doc_id", "text")
    val path = tmpIndex("parity")
    DedupIndex.build(history, path)
    val viaIndex = DedupIndex.incrementalNewDocs(batch, path, expectedHistoryRows = 1000L)
      .select("doc_id").as[Long].collect().toSet
    val viaRescan = Dedup.incrementalNewDocs(batch, history, expectedHistoryRows = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == viaRescan)
    assert(viaIndex == (0 until 60).map(2000L + _).toSet)
  }

  test("multi-batch ingest loop: screen, accept, update, repeat") {
    import spark.implicits._
    val path = tmpIndex("loop")
    DedupIndex.build((0 until 100).map(i => (i.toLong, s"base $i")).toDF("doc_id", "text"), path)
    // batch 1 introduces docs that batch 2 then partially re-ingests — the
    // update between batches must make batch 1's docs visible to the screen
    val b1 = (0 until 20).map(i => (1000L + i, s"wave one $i")).toDF("doc_id", "text")
    val n1 = DedupIndex.incrementalNewDocs(b1, path, expectedHistoryRows = 1000L)
    assert(n1.count() == 20)
    DedupIndex.update(b1, path)
    val b2 = ((0 until 8).map(i => (3000L + i, s"wave one $i")) ++ // dups of b1
      (0 until 5).map(i => (4000L + i, s"base ${i * 3}")) ++       // dups of base
      (0 until 11).map(i => (5000L + i, s"wave two $i")))          // new
      .toDF("doc_id", "text")
    val n2 = DedupIndex.incrementalNewDocs(b2, path, expectedHistoryRows = 1000L)
    assert(n2.select("doc_id").as[Long].collect().toSet ==
      (0 until 11).map(5000L + _).toSet)
  }

  test("bloom aggregate refuses absurd filter sizes at plan time") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      // ~4e12 expected rows → numBits over the 2^36 (8 GB/task) ceiling
      Dedup.incrementalNewDocs(docs, docs, expectedHistoryRows = 4000000000000L)
        .count()
    }
    assert(e.getMessage.contains("ceiling"))
  }
}
