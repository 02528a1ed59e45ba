package graft.llm

/** WebVTT (.vtt) subtitle codec — [[Srt]]'s modern sibling and the web
  * default (HTML5 `<track>`, YouTube exports): the other transcript
  * format a multimodal pipeline aligns against decoded frames. The
  * grammar differs from SRT everywhere a parser can get it wrong, which
  * is the point of carrying both:
  *   - a `WEBVTT` signature line (optionally followed by a space/tab
  *     and free text), then a blank line
  *   - DOT millisecond separator (`00:00:01.000`), not SRT's comma
  *   - the HOURS FIELD IS OPTIONAL (`MM:SS.mmm`)
  *   - cues carry an OPTIONAL IDENTIFIER line (any line without
  *     `-->`) instead of SRT's mandatory sequential index
  *   - the timing line may carry CUE SETTINGS after the end stamp
  *     (`align:start position:10%`) — preserved verbatim
  *   - `NOTE`/`STYLE`/`REGION` blocks are skipped whole
  *
  * Strict rules (spec-tested): missing signature, malformed stamps,
  * MM/SS > 59, end ≤ start, or an empty payload quarantine the document
  * (None) — the [[Srt]] contract.
  *
  * Scale shape: row-local parse, no shuffle, streaming-safe. */
object Vtt {

  final case class Cue(cueId: String, startUs: Long, endUs: Long,
      settings: String, text: String)

  final case class CueRow(doc_id: Long, seq: Int, cue_id: String,
      start_us: Long, end_us: Long, settings: String, text: String)

  def parseAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[CueRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (id, raw) =>
      parse(raw).iterator.flatMap(_.iterator.zipWithIndex.map { case (c, i) =>
        CueRow(id, i, c.cueId, c.startUs, c.endUs, c.settings, c.text)
      })
    })
  }

  def parse(raw: String): Option[Seq[Cue]] = {
    if (raw == null || raw.isEmpty) return None
    val body = if (raw.charAt(0) == '﻿') raw.substring(1) else raw
    val lines = body.split("\r\n|\n", -1)
    if (lines.isEmpty) return None
    val sig = lines(0)
    if (!(sig == "WEBVTT" || sig.startsWith("WEBVTT ") || sig.startsWith("WEBVTT\t")))
      return None
    val cues = Vector.newBuilder[Cue]
    var i = 1
    // header block: the spec discards everything up to the first blank
    // line (YouTube exports carry "Kind: captions" / "Language: en" here)
    while (i < lines.length && lines(i).nonEmpty) i += 1
    // a comment/style/region block starts with the keyword ALONE or
    // followed by whitespace — a cue identifier that merely BEGINS with
    // "NOTE…" must not be swallowed (spec: NOTE then space/tab/EOL)
    def blockKeyword(l: String): Boolean =
      l == "NOTE" || l.startsWith("NOTE ") || l.startsWith("NOTE\t") ||
        l == "STYLE" ||
        l == "REGION" || l.startsWith("REGION ") || l.startsWith("REGION\t")
    while (i < lines.length) {
      if (lines(i).isEmpty) i += 1
      else if (blockKeyword(lines(i))) {
        // skip the block to the next blank line
        while (i < lines.length && lines(i).nonEmpty) i += 1
      } else {
        // optional identifier line: any line NOT containing "-->"
        var cueId = ""
        if (!lines(i).contains("-->")) {
          cueId = lines(i)
          i += 1
          if (i >= lines.length || !lines(i).contains("-->")) return None
        }
        val (times, settings) = parseTiming(lines(i)) match {
          case Some(ts) => ts
          case None     => return None
        }
        var j = i + 1
        val payload = Vector.newBuilder[String]
        while (j < lines.length && lines(j).nonEmpty) {
          // "-->" may not appear in cue text (spec); hitting one here
          // means a missing blank separator swallowed the NEXT cue's
          // timing line — quarantine, never absorb it as text
          if (lines(j).contains("-->")) return None
          payload += lines(j); j += 1
        }
        val text = payload.result()
        if (text.isEmpty) return None
        cues += Cue(cueId, times._1, times._2, settings, text.mkString("\n"))
        i = j
      }
    }
    val out = cues.result()
    if (out.isEmpty) None else Some(out)
  }

  /** `[HH:]MM:SS.mmm --> [HH:]MM:SS.mmm [settings…]` */
  private def parseTiming(line: String): Option[((Long, Long), String)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val left = line.substring(0, arrow).trim
    val rightAll = line.substring(arrow + 3).trim
    // end stamp runs to the first whitespace; the rest is settings
    val sp = rightAll.indexWhere(c => c == ' ' || c == '\t')
    val (right, settings) =
      if (sp < 0) (rightAll, "")
      else (rightAll.substring(0, sp), rightAll.substring(sp).trim)
    for {
      s <- parseTs(left)
      e <- parseTs(right)
      if e > s
    } yield ((s * 1000L, e * 1000L), settings)
  }

  private val WithHours = "^(\\d{2,4}):(\\d{2}):(\\d{2})\\.(\\d{3})$".r
  private val NoHours = "^(\\d{2}):(\\d{2})\\.(\\d{3})$".r

  private def parseTs(t: String): Option[Long] = t match {
    case WithHours(h, mm, ss, f) =>
      val mi = mm.toInt; val si = ss.toInt
      if (mi > 59 || si > 59) None
      else Some(((h.toLong * 60 + mi) * 60 + si) * 1000 + f.toInt)
    case NoHours(mm, ss, f) =>
      val mi = mm.toInt; val si = ss.toInt
      if (mi > 59 || si > 59) None
      else Some((mi * 60L + si) * 1000 + f.toInt)
    case _ => None
  }
}
