package graft.llm

import graft.SparkSpec

class GifSpec extends SparkSpec {

  private val palette: Array[Int] =
    Array.tabulate(16)(k => (((k * 17) % 256) << 16) | (((k * 29) % 256) << 8) |
      ((k * 13) % 256))

  private def indices(w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 3 + y * 5) % 16).toByte
    }

  test("encodeIndexed → parse round-trip applies the palette exactly") {
    for ((w, h) <- Seq((1, 1), (10, 6), (33, 9))) {
      val idx = indices(w, h)
      val parsed = Gif.parse(Gif.encodeIndexed(w, h, palette, idx))
        .getOrElse(fail(s"parse failed at ${w}x$h"))
      assert(parsed.width == w && parsed.height == h)
      val expect = idx.map(i => palette(i & 0xff))
      assert(parsed.pixels.sameElements(expect), s"pixels diverged at ${w}x$h")
    }
  }

  test("full 256-color palette and channel extremes survive LZW") {
    val pal = Array.tabulate(256)(k => (k << 16) | ((255 - k) << 8) | ((k * 7) % 256))
    val idx = Array.tabulate[Byte](256)(i => i.toByte)
    val parsed = Gif.parse(Gif.encodeIndexed(16, 16, pal, idx))
      .getOrElse(fail("parse failed"))
    assert(parsed.pixels.sameElements(idx.map(i => pal(i & 0xff))))
  }

  test("encodeIndexed validates palette size and index range") {
    intercept[IllegalArgumentException](
      Gif.encodeIndexed(2, 1, Array.empty[Int], Array[Byte](0, 0)))
    intercept[IllegalArgumentException](
      Gif.encodeIndexed(2, 1, Array.fill(257)(0), Array[Byte](0, 0)))
    intercept[IllegalArgumentException](
      Gif.encodeIndexed(2, 1, palette, Array[Byte](0, 16))) // index 16 of 16-entry palette
  }

  test("malformed payloads are rejected, never thrown on") {
    val good = Gif.encodeIndexed(10, 6, palette, indices(10, 6))
    val cases: Seq[(String, Array[Byte])] = Seq(
      "null" -> null,
      "empty" -> Array.emptyByteArray,
      "text bytes" -> "not an image".getBytes("UTF-8"),
      "wrong magic" -> { val b = good.clone(); b(0) = 'X'; b },
      "truncated mid-LZW" -> java.util.Arrays.copyOfRange(good, 0, good.length / 2),
      "signature only" -> java.util.Arrays.copyOfRange(good, 0, 6),
      "a valid PNG" -> Png.encodeRgb(2, 2, Array(1, 2, 3, 4)))
    for ((label, bytes) <- cases)
      assert(Gif.parse(bytes).isEmpty, s"parser accepted: $label")
  }

  test("crafted logical-screen dimensions hit the pixel cap, not an OOM") {
    val good = Gif.encodeIndexed(10, 6, palette, indices(10, 6))
    // an honest image above the caller's cap quarantines
    assert(Gif.parse(good, maxPixels = 10L).isEmpty)
    assert(Gif.parse(good).nonEmpty)
  }

  test("decodeGif quarantines junk rows while decoding real ones") {
    val spark2 = spark
    import spark2.implicits._
    val idx = indices(10, 6)
    val blobs = Seq(
      Multimodal.Blob(1L, Gif.encodeIndexed(10, 6, palette, idx)),
      Multimodal.Blob(2L, "junk".getBytes("UTF-8"))).toDS()
    val rows = Multimodal.decodeGif(blobs).collect().sortBy(_.doc_id)
    assert(rows(0).valid && rows(0).width == 10 && rows(0).height == 6)
    val expect = idx.map(i => palette(i & 0xff))
    assert(rows(0).sum_r == expect.map(p => ((p >> 16) & 0xff).toLong).sum)
    assert(!rows(1).valid && rows(1).n_pixels == 0L)
  }
}
