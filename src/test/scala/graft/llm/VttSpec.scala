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

  test("header metadata, NOTE-prefixed ids, and missing separators") {
    // YouTube-style header lines before the first blank are discarded
    val yt = "WEBVTT\nKind: captions\nLanguage: en\n\n" +
      "00:01.000 --> 00:02.000\nhi\n"
    assert(Vtt.parse(yt).get.map(_.text) == Seq("hi"))
    // a cue id that merely BEGINS with NOTE is a cue, not a comment
    val noteId = "WEBVTT\n\nNOTES on timing\n00:01.000 --> 00:02.000\ntext\n"
    assert(Vtt.parse(noteId).get.head.cueId == "NOTES on timing")
    // a real NOTE block (keyword + space) still skips
    val note = "WEBVTT\n\nNOTE real comment\n\n00:01.000 --> 00:02.000\nx\n"
    assert(Vtt.parse(note).get.size == 1)
    // a payload line containing --> means a missing blank separator
    // swallowed the next cue's timing line — quarantine, never absorb
    val merged = "WEBVTT\n\n00:01.000 --> 00:02.000\nfirst\n" +
      "00:05.000 --> 00:06.000\nsecond\n"
    assert(Vtt.parse(merged).isEmpty)
    // no blank line after the signature: the header swallows everything
    assert(Vtt.parse("WEBVTT\n00:01.000 --> 00:02.000\nx\n").isEmpty)
  }

  test("parseAll emits typed rows; bad docs drop by omission") {
    import spark.implicits._
    val good = "WEBVTT\n\n00:01.000 --> 00:02.000\nhi\n"
    val rows = Vtt.parseAll(Seq((1L, good), (2L, "junk")).toDS())
      .collect().toSeq
    assert(rows == Seq(Vtt.CueRow(1L, 0, "", 1000000L, 2000000L, "", "hi")))
  }
}
