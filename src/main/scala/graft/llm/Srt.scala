package graft.llm

/** SubRip (.srt) subtitle codec — the text-side twin of the media codecs
  * ([[Wav]]/[[Bmp]]/[[Avi]]): subtitles are the transcript track a
  * multimodal training pipeline aligns against decoded frames (q143), and
  * SRT is their lingua franca. Spec-complete for the format as it exists
  * in the wild: numbered cues separated by blank lines, a
  * `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line (comma decimal separator —
  * the format's French origin), one or more payload lines per cue, CRLF
  * or LF line endings. Quarantine-not-throw (`None`) for malformed input.
  *
  * Parsing rules honored (each spec-tested in SrtSpec):
  *   - cue index must be a positive integer; indexes must be 1,2,3,… in
  *     order (a renumbering gap means a dropped cue — quarantine, the
  *     contract a training pipeline wants when aligning against audio)
  *   - timing line: exactly `HH:MM:SS,mmm --> HH:MM:SS,mmm` with 2/2/2/3
  *     digit fields, MM/SS ≤ 59, end strictly after start
  *   - payload: at least one non-empty line; multi-line payloads joined
  *     with '\n'
  *   - trailing blank lines and a UTF-8 BOM tolerated (both ubiquitous)
  */
object Srt {

  /** One cue: start/end in microseconds (the [[Avi]]/q143 time base). */
  final case class Cue(idx: Int, startUs: Long, endUs: Long, text: String)

  /** One parsed cue row per (doc, cue) — 0..n typed rows per document,
    * quarantine-by-omission for unparseable payloads (the
    * [[Multimodal.videoFrames]] contract). */
  final case class CueRow(doc_id: Long, idx: Int, start_us: Long, end_us: Long, text: String)

  def parseAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[CueRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.flatMap { case (id, raw) =>
        parse(raw).iterator.flatMap(_.iterator.map(c =>
          CueRow(id, c.idx, c.startUs, c.endUs, c.text)))
      }
    }
  }

  /** Canonical SRT text for a cue list (LF endings, no BOM). */
  def encode(cues: Seq[(Long, Long, String)]): String = {
    require(cues.nonEmpty, "empty cue list")
    cues.zipWithIndex.map { case ((sMs, eMs, text), i) =>
      require(sMs >= 0 && eMs > sMs, s"bad cue times: $sMs -> $eMs")
      // a leading/trailing '\n' or embedded '\r' would emit payload the
      // parser itself rejects (blank first line) or silently rewrites
      require(text.nonEmpty && !text.contains("\n\n") && !text.contains('\r') &&
        !text.startsWith("\n") && !text.endsWith("\n"), s"bad cue text: $text")
      s"${i + 1}\n${fmt(sMs)} --> ${fmt(eMs)}\n$text"
    }.mkString("", "\n\n", "\n")
  }

  private def fmt(ms: Long): String = {
    val h = ms / 3600000; val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d,$f%03d"
  }

  def parse(raw: String): Option[Seq[Cue]] = {
    if (raw == null || raw.isEmpty) return None
    val body = if (raw.charAt(0) == '\uFEFF') raw.substring(1) else raw
    val lines = body.split("\r\n|\n", -1)
    val cues = Vector.newBuilder[Cue]
    var i = 0
    var expectIdx = 1
    while (i < lines.length) {
      if (lines(i).isEmpty) i += 1 // blank separators / trailing newline
      else {
        // cue index line
        val idxLine = lines(i).trim
        if (idxLine.isEmpty || idxLine.length > 9 || !idxLine.forall(_.isDigit))
          return None
        val idx = idxLine.toInt
        if (idx != expectIdx) return None // gap or reorder: dropped cue
        if (i + 1 >= lines.length) return None
        val times = parseTiming(lines(i + 1)) match {
          case Some(t) => t
          case None    => return None
        }
        // payload: lines until blank or EOF
        var j = i + 2
        val payload = Vector.newBuilder[String]
        while (j < lines.length && lines(j).nonEmpty) {
          payload += lines(j); j += 1
        }
        val text = payload.result()
        if (text.isEmpty) return None
        cues += Cue(idx, times._1, times._2, text.mkString("\n"))
        expectIdx += 1
        i = j
      }
    }
    val out = cues.result()
    if (out.isEmpty) None else Some(out)
  }

  /** `HH:MM:SS,mmm --> HH:MM:SS,mmm` → (startUs, endUs). */
  private def parseTiming(line: String): Option[(Long, Long)] = {
    val parts = line.split(" --> ", -1)
    if (parts.length != 2) return None
    for {
      s <- parseTs(parts(0))
      e <- parseTs(parts(1))
      if e > s
    } yield (s * 1000L, e * 1000L)
  }

  private def parseTs(t: String): Option[Long] = {
    // HH:MM:SS,mmm — fixed widths 2/2/2/3 (HH may exceed 2 digits in
    // marathon streams; accept 2..4)
    val m = t.trim
    val re = "^(\\d{2,4}):(\\d{2}):(\\d{2}),(\\d{3})$".r
    m match {
      case re(h, mm, ss, f) =>
        val mi = mm.toInt; val si = ss.toInt
        if (mi > 59 || si > 59) None
        else Some(((h.toLong * 60 + mi) * 60 + si) * 1000 + f.toInt)
      case _ => None
    }
  }
}
