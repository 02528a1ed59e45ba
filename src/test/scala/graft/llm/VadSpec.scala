package graft.llm

import graft.SparkSpec

class VadSpec extends SparkSpec {

  private def block(a: Int, n: Int): Array[Short] =
    Array.tabulate[Short](n)(i => (if (i % 2 == 0) a else -a).toShort)

  test("maximal runs with exact energies; strict threshold") {
    // 4 frames of 4 samples: quiet(1) loud(100) loud(100) quiet(1)
    val pcm = block(1, 4) ++ block(100, 4) ++ block(100, 4) ++ block(1, 4)
    // frame energy: 4*a^2 → 4 vs 40000
    assert(Vad.segments(pcm, 4, 100L) == Seq((1, 2, 80000L)))
    // threshold is STRICT: energy == threshold is silence
    assert(Vad.segments(block(5, 4), 4, 100L).isEmpty)
    assert(Vad.segments(block(5, 4), 4, 99L) == Seq((0, 0, 100L)))
  }

  test("boundary conventions: trailing run, ragged tail, empty") {
    // trailing speech run closes at the last frame
    val pcm = block(1, 4) ++ block(100, 8)
    assert(Vad.segments(pcm, 4, 1000L) == Seq((1, 2, 80000L)))
    // ragged tail dropped: 10 samples at frame 4 → 2 frames only
    val ragged = block(100, 10)
    assert(Vad.segments(ragged, 4, 1000L) == Seq((0, 1, 80000L)))
    assert(Vad.segments(Array.empty[Short], 4, 0L).isEmpty)
    // all silence → no segments
    assert(Vad.segments(block(1, 16), 4, 1000L).isEmpty)
    // two separated runs
    val two = block(100, 4) ++ block(1, 4) ++ block(100, 4)
    assert(Vad.segments(two, 4, 1000L) ==
      Seq((0, 0, 40000L), (2, 2, 40000L)))
  }

  test("segmentsAll: decode, quarantine for stereo and junk") {
    import spark.implicits._
    val mono = Wav.encodePcm16(8000, block(1, 64) ++ block(1000, 64))
    val stereo = Wav.encodePcm16(8000, block(1000, 128), channels = 2)
    val blobs = Seq(
      Multimodal.Blob(1L, mono),
      Multimodal.Blob(2L, stereo),
      Multimodal.Blob(3L, "junk".getBytes("UTF-8"))).toDS()
    val segs = Vad.segmentsAll(blobs, frameLen = 64, threshold = 1000000L)
      .collect().toSeq
    assert(segs == Seq(Vad.Segment(1L, 0, 1, 1, 1, 64L * 1000000)))
  }
}
