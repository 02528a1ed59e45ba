package graft.llm

import graft.SparkSpec

class G711Spec extends SparkSpec {

  test("published table landmarks: zeros, silences, full-scale extremes") {
    // μ-law: 0x7F and 0xFF both decode to 0; 0x00 is the negative
    // full-scale -32124; complementing the sign bit negates
    assert(G711.mulaw(0x7f) == 0)
    assert(G711.mulaw(0xff) == 0)
    assert(G711.mulaw(0x00) == -32124)
    assert(G711.mulaw(0x80) == 32124)
    // A-law: 0x55/0xD5 are the ∓8 silence codes; 0x2A/0xAA the ∓32256
    // full-scale pair
    assert(G711.alaw(0x55) == -8)
    assert(G711.alaw(0xd5) == 8)
    assert(G711.alaw(0x2a) == -32256)
    assert(G711.alaw(0xaa) == 32256)
    // interior samples pinned against an independent reference replay
    assert(Seq(1, 16, 100, 200, 231).map(G711.mulaw) ==
      Seq(-31100, -15996, -308, 1372, 260))
    assert(Seq(1, 16, 100, 200, 231).map(G711.alaw) ==
      Seq(-5248, -2752, -1120, 472, 1184))
  }

  test("full-range table properties: odd symmetry, zero sum, magnitudes") {
    // sign-bit complement negates in both laws (the companding symmetry)
    for (b <- 0 until 128) {
      assert(G711.mulaw(b) == -G711.mulaw(b | 0x80))
      assert(G711.alaw(b) == -G711.alaw(b ^ 0x80))
    }
    val mus = (0 until 256).map(G711.mulaw)
    val als = (0 until 256).map(G711.alaw)
    assert(mus.sum == 0 && als.sum == 0)
    assert(mus.map(math.abs).sum == 1532928)
    assert(als.map(math.abs).sum == 1564672)
    // every expansion fits PCM-16
    assert(mus.forall(s => s >= -32768 && s <= 32767))
    assert(als.forall(s => s >= -32768 && s <= 32767))
    // μ-law magnitude is non-increasing in the byte value per sign half
    // (the companding monotonicity the tables are defined by)
    assert((0 until 127).forall(b => G711.mulaw(b) <= G711.mulaw(b + 1)))
  }

  test("decodeAll: one row per byte, both laws; empty/null quarantine") {
    import spark.implicits._
    val blobs = Seq(
      Multimodal.Blob(1L, Array[Byte](0x00, 0x7f, 0xaa.toByte)),
      Multimodal.Blob(2L, Array.emptyByteArray),
      Multimodal.Blob(3L, null)).toDS()
    val rows = G711.decodeAll(blobs).collect().sortBy(r => (r.doc_id, r.i))
    assert(rows.toSeq == Seq(
      G711.SampleRow(1L, 0, -32124, G711.alaw(0x00)),
      G711.SampleRow(1L, 1, 0, G711.alaw(0x7f)),
      G711.SampleRow(1L, 2, G711.mulaw(0xaa), 32256)))
  }
}
