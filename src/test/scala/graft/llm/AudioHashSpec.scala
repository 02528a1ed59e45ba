package graft.llm

import graft.SparkSpec

class AudioHashSpec extends SparkSpec {

  private def wave(n: Int, step: Int, amp: Int = 1): Array[Short] =
    Array.tabulate[Short](n)(j => (((j.toLong * step) % 4096 - 2048) * amp * 4).toShort)

  test("aHash is invariant under amplitude scaling") {
    val base = AudioHash.aHashBits(wave(220, 41))
    for (amp <- 2 to 3)
      assert(AudioHash.aHashBits(wave(220, 41, amp)) == base,
        s"amplitude x$amp changed the hash")
  }

  test("aHash matches a naive double-precision mean-energy recomputation") {
    val s = wave(237, 53)
    val n = s.length
    val e = new Array[Double](33)
    val c = new Array[Long](33)
    for (j <- 0 until n) {
      val f = (j.toLong * 33 / n).toInt
      e(f) += s(j).toDouble * s(j); c(f) += 1
    }
    var expect = 0L
    for (f <- 0 until 32)
      if (e(f) / c(f) > e(f + 1) / c(f + 1)) expect |= 1L << f
    assert(AudioHash.aHashBits(s) == expect)
  }

  test("quarantine: stereo, too-short, over-cap, undecodable") {
    val spark2 = spark
    import spark2.implicits._
    val blobs = Seq(
      Multimodal.Blob(1L, Wav.encodePcm16(8000, wave(220, 41))),
      Multimodal.Blob(2L, Wav.encodePcm16(8000, wave(220, 41), channels = 2)),
      Multimodal.Blob(3L, Wav.encodePcm16(8000, wave(20, 41))), // < 33 samples
      Multimodal.Blob(4L, "junk".getBytes("UTF-8"))).toDS()
    val rows = AudioHash.aHash(blobs).collect().sortBy(_.doc_id)
    assert(rows(0).valid && rows(0).n_samples == 220)
    assert(!rows(1).valid && !rows(2).valid && !rows(3).valid)
  }

  test("banded pairs == brute-force hamming<=3 pairs (pigeonhole exactness)") {
    val spark2 = spark
    import spark2.implicits._
    val blobs = (0L until 60L).map { id =>
      val g = id / 3
      Multimodal.Blob(id, Wav.encodePcm16(8000,
        wave((200 + g % 50).toInt, (37 + g % 27).toInt, (1 + id % 3).toInt)))
    }.toDS()
    val hashes = AudioHash.aHash(blobs)
    val banded = AudioHash.nearDupPairs(hashes.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.filter(_.valid).collect()
    val brute = (for {
      a <- hs; b <- hs if a.doc_id < b.doc_id
      ham = java.lang.Long.bitCount(a.ahash ^ b.ahash)
      if ham <= 3
    } yield (a.doc_id, b.doc_id, ham)).toSet
    assert(banded.nonEmpty, "fixture planted no near-dup pairs — vacuous")
    assert(banded == brute)
  }
}
