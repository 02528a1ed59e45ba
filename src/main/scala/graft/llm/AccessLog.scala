package graft.llm

import org.apache.spark.sql.Dataset

/** Apache/nginx combined-log-format parser — the web-facing sibling of
  * the WARC/robots/sitemap crawl tier: access logs are the raw
  * material of traffic analytics (the q216/q220 funnels start from
  * exactly these lines in production), and CLF is position-delimited
  * with three quoted/bracketed islands, so a split-on-space parser
  * corrupts every request line with a path containing a space.
  *
  * Grammar (one line):
  *   host SP ident SP user SP '[' timestamp ']' SP '"' request '"'
  *   SP status SP bytes [SP '"' referer '"' SP '"' user-agent '"']
  * where request = method SP path SP protocol, status is an integer,
  * and bytes is an integer or '-' (no body). The two trailing quoted
  * fields are the "combined" extension — absent means plain CLF and
  * both surface as None.
  *
  * Rule-explicit char walk, no regex (the Sentences/CsvSniff
  * discipline). Historic CLF has NO escape syntax inside quotes —
  * a quoted island simply ends at the next '"' (documented contract;
  * an embedded quote in a UA string truncates that field, exactly as
  * it does in Apache's own writer pre-2.0.49). STRICT bounds: any
  * missing island, non-integer status/bytes, or malformed request
  * line quarantines the LINE (None) — at corpus scale a half-parsed
  * line poisons aggregates downstream (the Zip CRC lesson).
  *
  * Row-local — [[parseAll]] is a flatMap, no shuffle. */
object AccessLog extends Serializable {

  final case class LogLine(
      doc_id: Long,
      host: String,
      user: String,
      ts_raw: String,
      method: String,
      path: String,
      proto: String,
      status: Int,
      bytes: Long,       // -1 when the log wrote '-' (no body)
      referer: Option[String],
      user_agent: Option[String])

  /** Parse one line; None quarantines. */
  def parse(docId: Long, line: String): Option[LogLine] = {
    if (line == null || line.isEmpty) return None
    var i = 0
    val n = line.length
    def token(): Option[String] = {
      if (i >= n) return None
      val start = i
      while (i < n && line.charAt(i) != ' ') i += 1
      if (i == start) None else Some(line.substring(start, i))
    }
    def skipSp(): Boolean = {
      if (i >= n || line.charAt(i) != ' ') return false
      i += 1 // exactly one delimiter space — CLF is single-space framed
      true
    }
    def island(open: Char, close: Char): Option[String] = {
      if (i >= n || line.charAt(i) != open) return None
      i += 1
      val start = i
      while (i < n && line.charAt(i) != close) i += 1
      if (i >= n) return None // unterminated island
      val s = line.substring(start, i)
      i += 1
      Some(s)
    }
    def intOf(s: String): Option[Long] = {
      if (s.isEmpty || !s.forall(c => c >= '0' && c <= '9')) None
      else
        try Some(s.toLong)
        catch { case _: NumberFormatException => None }
    }
    for {
      host <- token(); _ <- if (skipSp()) Some(()) else None
      _ <- token(); _ <- if (skipSp()) Some(()) else None // ident, unused
      user <- token(); _ <- if (skipSp()) Some(()) else None
      ts <- island('[', ']'); _ <- if (skipSp()) Some(()) else None
      req <- island('"', '"'); _ <- if (skipSp()) Some(()) else None
      statusTok <- token()
      status <- intOf(statusTok).filter(s => s >= 100 && s <= 999)
      _ <- if (skipSp()) Some(()) else None
      bytesTok <- token()
      bytes <- if (bytesTok == "-") Some(-1L) else intOf(bytesTok)
      reqParts <- splitRequest(req)
    } yield {
      // trailing combined extension: optional, both-or-neither
      val (ref, ua) =
        if (i < n && line.charAt(i) == ' ') {
          i += 1
          val r = island('"', '"')
          val u = if (r.isDefined && i < n && line.charAt(i) == ' ') {
            i += 1; island('"', '"')
          } else None
          (r, u)
        } else (None, None)
      LogLine(docId, host, user, ts, reqParts._1, reqParts._2, reqParts._3,
        status.toInt, bytes, ref, ua)
    }
  }

  /** method SP path SP proto — path may NOT contain a space in a wire
    * request line (spaces are %-encoded), so the outer splits are the
    * first and LAST space. */
  private def splitRequest(req: String): Option[(String, String, String)] = {
    val first = req.indexOf(' ')
    val last = req.lastIndexOf(' ')
    if (first <= 0 || last <= first + 1 || last >= req.length - 1) None
    else Some((req.substring(0, first), req.substring(first + 1, last),
      req.substring(last + 1)))
  }

  def parseAll(lines: Dataset[(Long, String)]): Dataset[LogLine] = {
    import lines.sparkSession.implicits._
    lines.flatMap { case (id, line) => parse(id, line) }
  }
}
