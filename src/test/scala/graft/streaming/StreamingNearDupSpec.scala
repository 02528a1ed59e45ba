package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.llm.NearDupIndex

/** SURVEY §2.9 streaming NearDupIndex maintenance: the foreachBatch loop
  * equals the batch-sequential composition, near-dups are dropped against
  * history / within batch (keep-first) / against earlier batches, novel
  * docs survive, short docs are rejected, and replay is a no-op. */
class StreamingNearDupSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).resolve("x").toString

  // ≥3-token texts; near-dup = LAST word swapped, so only the final 3-word
  // shingle differs (13-word sentence: 11 shingles, 10 shared → Jaccard
  // 10/12 ≈ 0.83; the 9-word "novel text" family: 7 shingles, 6 shared →
  // 6/8 = 0.75) — both far above minSim=0.5 even with the 64-hash
  // estimator's ~0.06 stderr. Distinct docs share no vocabulary (Jaccard 0).
  private def sent(lastWord: String): String =
    s"the quick brown fox jumps over the lazy dog near the riverbank $lastWord"

  private val history = Seq(
    (0L, sent("today")),
    (1L, "completely different historical content about spark physical plans"))
  private val batches = Seq(
    Seq(
      (10L, sent("tonight")),     // near-dup of history doc 0 → drop
      (11L, "novel text one about banded minhash signature index estimates"),
      (12L, "novel text one about banded minhash signature index estimate"), // near-dup of 11 → keep-first drops it
      (13L, "too short")),        // unshingleable → rejected
    Seq(
      (20L, "novel text one about banded minhash signature index estimating"), // near-dup of accepted 11 → drop
      (21L, "second wave fresh document mentioning watermarks state stores and triggers")),
    Seq(
      (30L, "second wave fresh document mentioning watermarks state stores and trigger"), // near-dup of 21 → drop
      (31L, "final unrelated corpus entry on parquet row groups and min max pruning")))

  private val minSim = 0.5

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("streaming ingest ≡ batch-sequential; near-dup screen semantics hold") {
    // --- streaming path: file source, one file per micro-batch
    val (sIdx, sAcc) = (tmp("graft-sndup-idx"), tmp("graft-sndup-acc"))
    val streamDir = tmp("graft-sndup-in")
    Files.createDirectories(java.nio.file.Paths.get(streamDir))
    val ckpt = tmp("graft-sndup-ckpt")
    NearDupIndex.build(df(history), sIdx)
    val q = StreamingNearDup.ingest(
        spark.readStream.schema(df(batches.head).schema).parquet(streamDir),
        sIdx, sAcc, ckpt, minSim)
      .start()
    try batches.foreach { b =>
      df(b).coalesce(1).write.mode("append").parquet(streamDir)
      q.processAllAvailable()
    } finally q.stop()

    // --- batch-sequential path: the same composition, called directly
    val (bIdx, bAcc) = (tmp("graft-bndup-idx"), tmp("graft-bndup-acc"))
    NearDupIndex.build(df(history), bIdx)
    batches.foreach(b => StreamingNearDup.ingestBatch(df(b), bIdx, bAcc, minSim))

    val sIds = spark.read.parquet(sAcc).select("doc_id").as[Long]
      .collect().sorted.toSeq
    val bIds = spark.read.parquet(bAcc).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(sIds == bIds)
    assert(sIds == Seq(11L, 21L, 31L))

    // index sketch counts: (history 2 + accepted 3) docs; bands = 8 per doc
    for (idx <- Seq(sIdx, bIdx)) {
      assert(spark.read.parquet(idx + "/sigs").count() == 5L)
      assert(spark.read.parquet(idx + "/bands").count() == 40L)
      // signatures are fixed-width
      assert(spark.read.parquet(idx + "/sigs")
        .selectExpr("size(sig) AS n").distinct().as[Int].collect().toSeq == Seq(64))
    }

    // replay of a fully-committed batch is a no-op: its docs' own
    // signatures are in the index (estimate 1.0 ≥ minSim)
    StreamingNearDup.ingestBatch(df(batches(2)), sIdx, sAcc, minSim)
    assert(spark.read.parquet(sAcc).count() == 3L)
    assert(spark.read.parquet(sIdx + "/sigs").count() == 5L)
  }

  test("signature estimate tracks exact shingle Jaccard within sketch error") {
    val docs = df(Seq(
      (0L, sent("today")), (1L, sent("tonight")),
      (2L, "entirely disjoint vocabulary sentence with zero overlap whatsoever here")))
    val sigs = NearDupIndex.signatures(docs)
    val est = sigs.as("a").join(sigs.as("b"))
      .where($"a.doc_id" < $"b.doc_id")
      .selectExpr("a.doc_id AS ia", "b.doc_id AS ib",
        "aggregate(zip_with(a.sig, b.sig, (x, y) -> CAST(x = y AS INT)), 0, (acc, v) -> acc + v) / CAST(size(a.sig) AS DOUBLE) AS est")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // exact shingle Jaccard of (0,1): only the last word differs, so only
    // the final 3-word shingle differs per side: |A∩B|=10, |A∪B|=12
    val exact = 10.0 / 12.0
    assert(math.abs(est((0L, 1L)) - exact) < 0.2, s"est=${est((0L, 1L))}")
    assert(est((0L, 2L)) < 0.2 && est((1L, 2L)) < 0.2)
  }
}
