package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.llm.DedupIndex

/** SURVEY §2.9 streaming DedupIndex maintenance: the foreachBatch ingest
  * loop equals the batch-sequential composition of the same operators, the
  * index stays duplicate-free and complete, and a replayed batch is a
  * no-op on the accepted corpus. */
class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).resolve("x").toString

  private val history = Seq((0L, "alpha"), (1L, "beta"))
  // overlapping batches: dup-vs-history (beta, alpha), dup-vs-earlier-batch
  // (delta, epsilon), dup-within-batch (gamma twice)
  private val batches = Seq(
    Seq((10L, "beta"), (11L, "gamma"), (12L, "gamma"), (13L, "delta")),
    Seq((20L, "alpha"), (21L, "delta"), (22L, "epsilon")),
    Seq((30L, "epsilon"), (31L, "zeta")))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("streaming ingest ≡ batch-sequential composition; index stays clean") {
    // --- streaming path: file source, one file per micro-batch
    val (sIdx, sAcc) = (tmp("graft-sdedup-idx"), tmp("graft-sdedup-acc"))
    val streamDir = tmp("graft-sdedup-in")
    Files.createDirectories(java.nio.file.Paths.get(streamDir))
    val ckpt = tmp("graft-sdedup-ckpt")
    DedupIndex.build(df(history), sIdx)
    val q = StreamingDedup.ingest(
        spark.readStream.schema(df(batches.head).schema).parquet(streamDir),
        sIdx, sAcc, ckpt)
      .start()
    try batches.foreach { b =>
      df(b).coalesce(1).write.mode("append").parquet(streamDir)
      q.processAllAvailable()
    } finally q.stop()

    // --- batch-sequential path: the same composition, called directly
    val (bIdx, bAcc) = (tmp("graft-bdedup-idx"), tmp("graft-bdedup-acc"))
    DedupIndex.build(df(history), bIdx)
    batches.foreach(b => StreamingDedup.ingestBatch(df(b), bIdx, bAcc))

    // accepted corpora agree (by content — which of gamma's two copies
    // survives is contractually arbitrary, so compare texts)
    val sTexts = spark.read.parquet(sAcc).select("text").as[String]
      .collect().sorted.toSeq
    val bTexts = spark.read.parquet(bAcc).select("text").as[String]
      .collect().sorted.toSeq
    assert(sTexts == bTexts)
    assert(sTexts == Seq("delta", "epsilon", "gamma", "zeta"))

    // index: duplicate-free and complete (history ∪ accepted digests)
    for (idx <- Seq(sIdx, bIdx)) {
      val h = spark.read.parquet(idx)
      assert(h.count() == 6L, s"index $idx should hold 6 digests")
      assert(h.distinct().count() == 6L, s"index $idx has duplicate digests")
    }

    // replayed batch (same data re-ingested after full commit) is a no-op:
    // every digest is in the index, so the screen drops everything
    StreamingDedup.ingestBatch(df(batches(2)), sIdx, sAcc)
    assert(spark.read.parquet(sAcc).count() == 4L)
    assert(spark.read.parquet(sIdx).count() == 6L)
  }
}
