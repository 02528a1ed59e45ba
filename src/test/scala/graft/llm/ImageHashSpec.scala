package graft.llm

import graft.SparkSpec

class ImageHashSpec extends SparkSpec {

  private def img(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def pattern(w: Int, h: Int, shift: Int = 0): Array[Int] =
    img(w, h, (x, y) =>
      ((((x * 7 + y * 3) % 252 + shift)) << 16) |
        ((((x * 5 + y * 11) % 252 + shift)) << 8) |
        (((x * 13 + y) % 252 + shift)))

  private def hashOf(w: Int, h: Int, px: Array[Int]): (Long, Long) =
    ImageHash.dHashBits(w, h, px)

  test("dHash is invariant under uniform brightness shifts") {
    for (shift <- 1 to 3)
      assert(hashOf(18, 13, pattern(18, 13)) == hashOf(18, 13, pattern(18, 13, shift)),
        s"shift $shift changed the hash")
  }

  test("dHash matches a naive per-cell-mean recomputation") {
    val (w, h) = (20, 14)
    val px = pattern(w, h)
    // independent derivation: double-precision cell means, then compare
    val sums = Array.ofDim[Double](9 * 8)
    val ns = Array.ofDim[Long](9 * 8)
    for (i <- px.indices) {
      val x = i % w; val y = i / w
      val cell = (y.toLong * 8 / h).toInt * 9 + (x.toLong * 9 / w).toInt
      val p = px(i)
      sums(cell) += 299.0 * ((p >> 16) & 0xff) + 587.0 * ((p >> 8) & 0xff) +
        114.0 * (p & 0xff)
      ns(cell) += 1
    }
    var expectHi = 0L; var expectLo = 0L
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val l = cy * 9 + cx
      if (sums(l) / ns(l) > sums(l + 1) / ns(l + 1)) {
        val bit = cy * 8 + cx
        if (bit >= 32) expectHi |= 1L << (bit - 32) else expectLo |= 1L << bit
      }
    }
    assert(hashOf(w, h, px) == (expectHi, expectLo))
  }

  test("a sharp edit flips bits; small hamming for local edits") {
    val (w, h) = (18, 13)
    val base = pattern(w, h)
    val edited = base.clone()
    // blow out one grid cell's worth of pixels to white
    for (y <- 0 until 2; x <- 0 until 2) edited(y * w + x) = 0xffffff
    val (h1, l1) = hashOf(w, h, base)
    val (h2, l2) = hashOf(w, h, edited)
    val ham = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    assert(ham >= 1 && ham <= 6, s"local edit moved hamming to $ham")
  }

  test("images smaller than the 9x8 grid quarantine as invalid") {
    val spark2 = spark
    import spark2.implicits._
    val blobs = Seq(
      Multimodal.Blob(1L, Bmp.encode24(18, 13, pattern(18, 13))),
      Multimodal.Blob(2L, Bmp.encode24(8, 4, pattern(8, 4))), // too small
      Multimodal.Blob(3L, "junk".getBytes("UTF-8"))).toDS()
    val rows = ImageHash.dHash(blobs).collect().sortBy(_.doc_id)
    assert(rows(0).valid)
    assert(!rows(1).valid && !rows(2).valid)
  }

  test("banded pairs == brute-force hamming<=3 pairs (pigeonhole exactness)") {
    val spark2 = spark
    import spark2.implicits._
    val d = dhashBlobs()
    val hashes = ImageHash.dHash(d)
    val banded = ImageHash.nearDupPairs(hashes.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.filter(_.valid).collect()
    val brute = (for {
      a <- hs; b <- hs if a.doc_id < b.doc_id
      ham = java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi) +
        java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo)
      if ham <= 3
    } yield (a.doc_id, b.doc_id, ham)).toSet
    assert(banded.nonEmpty, "fixture planted no near-dup pairs — vacuous")
    assert(banded == brute)
  }

  /** Small planted fixture: brightness-shifted groups of 3 + distinct images. */
  private def dhashBlobs() = {
    val spark2 = spark
    import spark2.implicits._
    (0L until 60L).map { id =>
      val g = id / 3
      val w = (16 + g % 6).toInt
      val h = (12 + g % 4).toInt
      val sh = (id % 3).toInt
      val px = img(w, h, (x, y) =>
        ((((x * 7 + y * 3 + g.toInt) % 252 + sh)) << 16) |
          ((((x * 5 + y * 11 + 2 * g.toInt) % 252 + sh)) << 8) |
          (((x * 13 + y + 3 * g.toInt) % 252 + sh)))
      Multimodal.Blob(id, Bmp.encode24(w, h, px))
    }.toDS()
  }
}
