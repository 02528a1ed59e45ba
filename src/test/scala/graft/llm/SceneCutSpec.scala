package graft.llm

import graft.SparkSpec

class SceneCutSpec extends SparkSpec {

  private def flat(w: Int, h: Int, c: Int): Array[Int] =
    Array.fill(w * h)((c << 16) | (c << 8) | c)

  test("frame signature is the exact channel sum") {
    assert(SceneCut.frameSig(Bmp.Img(2, 2, flat(2, 2, 10))) == 4L * 30)
    assert(SceneCut.frameSig(Bmp.Img(1, 1, Array(0xff0000))) == 255L)
    assert(SceneCut.frameSig(Bmp.Img(1, 1, Array(0x010203))) == 6L)
  }

  test("cuts fire strictly above threshold, never at the first frame") {
    def img(c: Int) = Bmp.Img(2, 2, flat(2, 2, c))
    val frames = Seq(0 -> img(10), 1 -> img(10), 2 -> img(60), 3 -> img(60))
    // delta at frame 2: 4*(180-30) = 600
    assert(SceneCut.cuts(frames, 599L) == Seq((2, 600L)))
    assert(SceneCut.cuts(frames, 600L).isEmpty) // strict
    // negative delta detected with sign preserved
    val down = Seq(0 -> img(60), 1 -> img(10))
    assert(SceneCut.cuts(down, 100L) == Seq((1, -600L)))
    assert(SceneCut.cuts(Seq(0 -> img(10)), 0L).isEmpty) // single frame
    assert(SceneCut.cuts(Nil, 0L).isEmpty)
  }

  test("cutsAll: real AVI decode, quarantine for junk") {
    import spark.implicits._
    val frames = Seq.tabulate(4) { f =>
      val c = if (f < 2) 10 else 200
      flat(4, 2, c)
    }
    val avi = Avi.encode(4, 2, usPerFrame = 33000, frames = frames)
    val blobs = Seq(
      Multimodal.Blob(1L, avi),
      Multimodal.Blob(2L, "junk".getBytes("UTF-8"))).toDS()
    val cuts = SceneCut.cutsAll(blobs, threshold = 1000L).collect().toSeq
    // delta at frame 2: 8 px * 3 ch * (200-10) = 4560
    assert(cuts == Seq(SceneCut.Cut(1L, 0, 2, 4560L)))
  }
}
