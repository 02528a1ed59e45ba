package graft.llm

import graft.SparkSpec

class VttSpec extends SparkSpec {

  test("signature, optional ids, optional hours, dot millis, settings") {
    val vtt =
      """WEBVTT - demo track
        |
        |NOTE this block is
        |ignored entirely
        |
        |intro
        |00:01.000 --> 00:04.500 align:start position:10%
        |Hello there
        |second line
        |
        |01:02:03.250 --> 01:02:05.000
        |No id, with hours
        |""".stripMargin
    val cues = Vtt.parse(vtt).get
    assert(cues.size == 2)
    assert(cues(0) == Vtt.Cue("intro", 1000000L, 4500000L,
      "align:start position:10%", "Hello there\nsecond line"))
    assert(cues(1).cueId == "" && cues(1).settings == "")
    assert(cues(1).startUs == ((1L * 3600 + 2 * 60 + 3) * 1000 + 250) * 1000)
    assert(cues(1).text == "No id, with hours")
  }

  test("quarantine: missing signature, comma millis, bad fields, end<=start") {
    assert(Vtt.parse("1\n00:01.000 --> 00:02.000\nx\n").isEmpty)
    assert(Vtt.parse("WEBVTT\n\n00:00:01,000 --> 00:00:02,000\nx\n").isEmpty)
    assert(Vtt.parse("WEBVTT\n\n00:61.000 --> 01:02.000\nx\n").isEmpty)
    assert(Vtt.parse("WEBVTT\n\n00:02.000 --> 00:02.000\nx\n").isEmpty)
    assert(Vtt.parse("WEBVTT\n\nid only then EOF\n").isEmpty)
    assert(Vtt.parse("WEBVTT\n\n00:01.000 --> 00:02.000\n").isEmpty) // no payload
    assert(Vtt.parse("WEBVTTX\n\n00:01.000 --> 00:02.000\nx\n").isEmpty)
    assert(Vtt.parse("").isEmpty)
    assert(Vtt.parse(null).isEmpty)
  }

  test("parseAll emits typed rows; bad docs drop by omission") {
    import spark.implicits._
    val good = "WEBVTT\n\n00:01.000 --> 00:02.000\nhi\n"
    val rows = Vtt.parseAll(Seq((1L, good), (2L, "junk")).toDS())
      .collect().toSeq
    assert(rows == Seq(Vtt.CueRow(1L, 0, "", 1000000L, 2000000L, "", "hi")))
  }
}
