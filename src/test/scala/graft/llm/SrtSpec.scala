package graft.llm

import graft.SparkSpec

class SrtSpec extends SparkSpec {

  test("encode → parse round-trips cues incl. hour fields and multi-line") {
    val cues = Seq(
      (0L, 900L, "hello"),
      (1100L, 2000L, "two\nlines"),
      (3661000L, 3662500L, "past the hour"))
    val parsed = Srt.parse(Srt.encode(cues)).getOrElse(fail("parse failed"))
    assert(parsed.map(_.idx) == Seq(1, 2, 3))
    assert(parsed.map(c => (c.startUs, c.endUs, c.text)) ==
      cues.map { case (s, e, t) => (s * 1000, e * 1000, t) })
  }

  test("CRLF endings, BOM, and trailing blank lines are tolerated") {
    val srt = "﻿1\r\n00:00:00,000 --> 00:00:00,900\r\nhey\r\n\r\n\r\n"
    val parsed = Srt.parse(srt).getOrElse(fail("parse failed"))
    assert(parsed == Seq(Srt.Cue(1, 0L, 900000L, "hey")))
  }

  test("malformed SRT quarantines, never throws") {
    val good = Srt.encode(Seq((0L, 900L, "a"), (1000L, 1900L, "b")))
    val bad = Seq(
      "null" -> null,
      "empty" -> "",
      "not srt" -> "just some text\nwith lines",
      "non-numeric index" -> good.replaceFirst("^1", "one"),
      "index gap (dropped cue)" -> good.replaceFirst("\n2\n", "\n3\n"),
      "bad arrow" -> good.replace(" --> ", " -> "),
      "minutes > 59" -> good.replace("00:00:00,000", "00:61:00,000"),
      "seconds > 59" -> good.replace("00:00:00,000", "00:00:61,000"),
      "2-digit millis" -> good.replace("00:00:00,000", "00:00:00,00"),
      "dot separator" -> good.replace("00:00:00,000", "00:00:00.000"),
      "end before start" -> good.replace("00:00:00,900", "00:00:00,000"),
      "missing timing line" -> "1\nhello\n",
      "missing payload" -> "1\n00:00:00,000 --> 00:00:00,900\n")
    bad.foreach { case (label, s) =>
      assert(Srt.parse(s).isEmpty, s"accepted: $label")
    }
  }

  test("parseAll dataset: quarantine-by-omission") {
    import spark.implicits._
    val rows = Srt.parseAll(Seq(
      1L -> Srt.encode(Seq((0L, 900L, "x"), (1000L, 1900L, "y"))),
      2L -> "garbage").toDS()).collect().sortBy(r => (r.doc_id, r.idx))
    assert(rows.map(_.doc_id).forall(_ == 1L))
    assert(rows.map(_.text).toSeq == Seq("x", "y"))
    assert(rows.map(_.start_us).toSeq == Seq(0L, 1000000L))
  }
}
