package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted MinHash *signature* index for incremental NEAR-duplicate
  * screening — the [[DedupIndex]] move applied to [[MinHash]]: instead of
  * re-shingling the whole accepted corpus on every ingest, the index stores
  * per accepted doc a fixed-width signature (`numHashes` salted min-hashes,
  * 8 B each) plus its `numBands` banded bucket keys. Screening a batch
  * touches index *sketches*, never corpus bodies: at 1e9 accepted docs a
  * 64-hash/8-band index is ~0.6 KB/doc ≈ 0.6 TB scanned — vs ~100 TB of
  * text re-shingled — and the candidate join shuffles 24-byte band keys
  * only; signatures are joined in solely for the candidate pairs.
  *
  * The near-dup decision is the signature estimate itself (fraction of
  * agreeing min-hash positions ≈ Jaccard, the standard Broder estimator;
  * stderr ≈ sqrt(s(1−s)/numHashes) ≈ 0.06 at s=0.5, numHashes=64), NOT an
  * exact rerank on shingle sets — deliberately, so the index never needs
  * document bodies. Seeded → deterministic. Candidate recall is the usual
  * banded OR-amplification 1−(1−s^r)^b with r = numHashes/numBands
  * (64/8 → r=8: ≥97% at s=0.8, ~50% at s=0.5 — tune bands per threshold).
  *
  * Layout under `indexPath`: `bands/` rows (band, key, doc_id) — the join
  * side; `sigs/` rows (doc_id, sig ARRAY<LONG>) — the verify side. Both
  * append-only; [[update]] inherits [[DedupIndex.update]]'s single-writer
  * contract (one ingest query per index; a failed mid-append leaves partial
  * files a later read picks up — rebuild or clear before the next update).
  *
  * Reference scope: generalizes `/root/reference/` preprocessing dedup the
  * same way [[MinHash]] does (SURVEY §2.6 B32); construction is the
  * standard banded MinHash of Broder 1997 / MMDS ch.3.
  */
object NearDupIndex {

  val DefaultNumHashes = 64
  val DefaultNumBands = 8
  private val Gamma = 0x9E3779B97F4A7C15L

  private def bandsDir(indexPath: String) = indexPath + "/bands"
  private def sigsDir(indexPath: String) = indexPath + "/sigs"

  /** (doc_id, sig) — sig(i) = min over the doc's shingles of the salt(i)-
    * keyed 64-bit hash; one pure-codegen fold per position, no UDF. Docs
    * with no shingles (shorter than the shingle width) get no signature and
    * are never near-dup candidates. */
  def signatures(
      docs: DataFrame,
      numHashes: Int = DefaultNumHashes,
      seed: Long = 42L): DataFrame = {
    val perHash: Seq[Column] = (0 until numHashes).map { i =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(seed + Gamma * (i + 1)))))
    }
    docs
      .select(col("doc_id"), TextAnalysis.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), array(perHash: _*).as("sig"))
  }

  /** (band, key, doc_id) — key = hash of the band's signature slice
    * (band width derived from the stored signature width). */
  def bandKeys(sigs: DataFrame, numBands: Int = DefaultNumBands): DataFrame =
    sigs.select(
        col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"))
      .select(
        col("band"),
        xxhash64(
          slice(col("sig"),
            col("band") * lit(size(col("sig")) / numBands) + lit(1),
            lit(size(col("sig")) / numBands)),
          col("band")).as("key"),
        col("doc_id"))

  /** Estimated Jaccard: fraction of agreeing positions of two signatures. */
  private def estSim(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x === y).cast("int")),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** Create the index at `indexPath` from the initial accepted corpus. */
  def build(
      history: DataFrame,
      indexPath: String,
      numHashes: Int = DefaultNumHashes,
      numBands: Int = DefaultNumBands,
      seed: Long = 42L): Unit = {
    val sigs = signatures(history, numHashes, seed)
    sigs.write.mode("overwrite").parquet(sigsDir(indexPath))
    val persisted = history.sparkSession.read.parquet(sigsDir(indexPath))
    bandKeys(persisted, numBands).write.mode("overwrite").parquet(bandsDir(indexPath))
  }

  /** Batch docs that are near-dups of NO accepted doc and of no
    * smaller-`doc_id` batch doc ("keep first" within the batch, so a batch
    * containing a near-dup family keeps exactly its smallest id). A doc is
    * a near-dup when the signature estimate meets `minSim` for some
    * candidate sharing a band bucket. Output keeps the batch docs' full
    * rows. Docs too short to shingle (< 3 tokens) have no signature, so
    * they are NOT screenable and are REJECTED here (not silently accepted:
    * an unindexed accept would break replay idempotence) — route them
    * through the exact-digest ingest ([[DedupIndex]]) instead. */
  def newDocs(
      batch: DataFrame,
      indexPath: String,
      minSim: Double = 0.8,
      numHashes: Int = DefaultNumHashes,
      numBands: Int = DefaultNumBands,
      seed: Long = 42L): DataFrame = {
    val spark = batch.sparkSession
    // signatures read 3× (band keys + both verify sides) — materialize once
    val bSigs = signatures(batch, numHashes, seed).localCheckpoint(true)
    val bBands = bandKeys(bSigs, numBands)
    val hSigs = spark.read.parquet(sigsDir(indexPath))
    val hBands = spark.read.parquet(bandsDir(indexPath))

    def dupIds(candBands: DataFrame, candSigs: DataFrame, vsHistory: Boolean) = {
      val pairFilter =
        if (vsHistory) lit(true) else col("doc_id") > col("cand_id") // keep-first
      bBands
        .join(
          candBands.select(
            col("band"), col("key"), col("doc_id").as("cand_id")),
          Seq("band", "key"))
        .filter(pairFilter)
        .select("doc_id", "cand_id").distinct()
        .join(bSigs.select(col("doc_id"), col("sig").as("sig_a")), "doc_id")
        .join(candSigs.select(col("doc_id").as("cand_id"), col("sig").as("sig_b")),
          "cand_id")
        .filter(estSim(col("sig_a"), col("sig_b")) >= minSim)
        .select("doc_id")
    }

    val vsHist = dupIds(hBands, hSigs, vsHistory = true)
    val inBatch = dupIds(bBands, bSigs, vsHistory = false)
    batch
      .join(bSigs.select("doc_id"), Seq("doc_id"), "left_semi") // shingle-able
      .join(vsHist.union(inBatch).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Append `survivors`' sketches to the index. `survivors` must already be
    * near-dup-free vs the index AND within itself ([[newDocs]] output) —
    * like [[DedupIndex.update]] this does not re-screen. */
  def update(
      survivors: DataFrame,
      indexPath: String,
      numHashes: Int = DefaultNumHashes,
      numBands: Int = DefaultNumBands,
      seed: Long = 42L): Unit = {
    val sigs = signatures(survivors, numHashes, seed).localCheckpoint(true)
    sigs.write.mode("append").parquet(sigsDir(indexPath))
    bandKeys(sigs, numBands).write.mode("append").parquet(bandsDir(indexPath))
  }
}
