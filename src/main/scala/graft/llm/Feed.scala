package graft.llm

import scala.collection.mutable.ArrayBuffer

/** RSS 2.0 / Atom feed parsing — the third crawl-source format next to
  * [[Robots]] (what MAY be fetched) and [[Sitemap]] (what the site wants
  * fetched): feeds are how a crawler discovers FRESH content, and a
  * recrawl scheduler seeds its queue from exactly these entries. The two
  * formats differ in the ways that make a shared parser interesting:
  * RSS carries the entry URL as ELEMENT TEXT (`<link>…</link>`) and
  * RFC-1123 dates (`Mon, 02 Jan 2020 15:04:05 GMT`); Atom carries the
  * URL as an ATTRIBUTE (`<link href="…"/>`, rel-dispatched) and
  * ISO-8601 dates (`2020-01-02T15:04:05Z`).
  *
  * Best-effort TOTAL like [[Sitemap]] (crawl reality) but
  * byte-deterministic so q161 can hash-check every rule:
  *
  *   - format dispatch on the root: `<rss>`/`<channel>` → "rss",
  *     `<feed>` → "atom"; anything else yields format "" and no entries
  *   - entry containers `<item>` (rss) / `<entry>` (atom), matched by
  *     LOCAL name case-insensitively (namespace prefixes tolerated);
  *     entries only start once the format is known
  *   - captured fields: `title` (both), `link` element text (rss),
  *     `pubDate` (rss), `updated` (atom); `<![CDATA[…]]>` passes
  *     through verbatim, entities decode via the shared
  *     [[Html.reference]] decoder, values whitespace-trimmed
  *   - Atom `<link>`: FIRST link whose `rel` is absent or `alternate`
  *     wins (a feed's `rel="self"` link is the feed, not the entry);
  *     attributes through the shared [[Html.attrPairs]] tokenizer
  *   - unknown elements inside an entry (e.g. `<description>` whose
  *     body may contain a decoy `<title>`) suspend capture to their
  *     matching close — the [[Sitemap]] extension-block rule
  *   - an entry with no URL is DROPPED (the one required field)
  *   - `ts_epoch`: the published date parsed to epoch seconds — RFC
  *     1123 for rss (GMT/UT/UTC/Z or numeric `±hhmm` zones; weekday
  *     ignored), ISO 8601 for atom (`Z`, `±hh:mm`, or `±hhmm`;
  *     fractional seconds truncated); missing/unparseable → -1, never
  *     a throw. Both paths are integer civil-date arithmetic (the
  *     Hinnant days-from-civil formula), so the value is
  *     oracle-re-derivable without any date library.
  */
object Feed {

  final case class Entry(title: String, url: String, published: String,
      tsEpoch: Long)

  private val Months = Vector("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")

  /** Days since 1970-01-01 for a civil date (valid for all practical
    * years; Hinnant's days_from_civil). */
  private def daysFromCivil(y: Int, m: Int, d: Int): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365L + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  private def civilEpoch(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int): Long =
    daysFromCivil(y, mo, d) * 86400L + h * 3600L + mi * 60L + s

  /** `±hhmm` / GMT-family zone designator → offset seconds east of UTC;
    * Long.MinValue when unrecognized (named zones like EST are
    * ambiguous folklore, not data). */
  private def zoneOffset(z: String): Long = z.toUpperCase match {
    case "GMT" | "UT" | "UTC" | "Z" => 0L
    case s if s.length == 5 && (s(0) == '+' || s(0) == '-') &&
        s.substring(1).forall(_.isDigit) =>
      val v = s.substring(1, 3).toInt * 3600L + s.substring(3, 5).toInt * 60L
      if (s(0) == '-') -v else v
    case _ => Long.MinValue
  }

  /** RFC 1123 (`[Wdy,] DD Mon YYYY HH:MM:SS zone`) → epoch seconds;
    * -1 when malformed. */
  def parseRfc1123(raw: String): Long = {
    if (raw == null) return -1L
    val s = raw.trim
    val comma = s.indexOf(',')
    val body = (if (comma >= 0) s.substring(comma + 1) else s).trim
    val parts = body.split("\\s+")
    if (parts.length != 5) return -1L
    try {
      val d = parts(0).toInt
      val mon = Months.indexOf(parts(1).toLowerCase) + 1
      if (mon == 0 || parts(2).length != 4) return -1L
      val y = parts(2).toInt
      val hms = parts(3).split(":")
      if (hms.length != 3) return -1L
      val h = hms(0).toInt; val mi = hms(1).toInt; val sec = hms(2).toInt
      if (d < 1 || d > 31 || h > 23 || mi > 59 || sec > 60) return -1L
      val off = zoneOffset(parts(4))
      if (off == Long.MinValue) return -1L
      civilEpoch(y, mon, d, h, mi, sec) - off
    } catch { case _: NumberFormatException => -1L }
  }

  /** ISO 8601 (`YYYY-MM-DDThh:mm:ss[.frac](Z|±hh:mm|±hhmm)`) → epoch
    * seconds; -1 when malformed or zone-less (Atom requires a zone). */
  def parseIso8601(raw: String): Long = {
    if (raw == null) return -1L
    val s = raw.trim
    if (s.length < 20) return -1L
    def digits(from: Int, to: Int): Int = {
      var v = 0
      var i = from
      while (i < to) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') return -1
        v = v * 10 + (c - '0')
        i += 1
      }
      v
    }
    if (s.charAt(4) != '-' || s.charAt(7) != '-' ||
      (s.charAt(10) != 'T' && s.charAt(10) != 't') ||
      s.charAt(13) != ':' || s.charAt(16) != ':') return -1L
    val y = digits(0, 4); val mo = digits(5, 7); val d = digits(8, 10)
    val h = digits(11, 13); val mi = digits(14, 16); val sec = digits(17, 19)
    if (y < 0 || mo < 1 || mo > 12 || d < 1 || d > 31 ||
      h < 0 || h > 23 || mi < 0 || mi > 59 || sec < 0 || sec > 60) return -1L
    var i = 19
    if (i < s.length && s.charAt(i) == '.') { // truncate fractional seconds
      i += 1
      while (i < s.length && s.charAt(i).isDigit) i += 1
    }
    if (i >= s.length) return -1L
    val zone = s.substring(i)
    val off =
      if (zone == "Z" || zone == "z") 0L
      else if ((zone.startsWith("+") || zone.startsWith("-")) &&
        (zone.length == 6 && zone.charAt(3) == ':')) {
        val hh = digits(i + 1, i + 3); val mm = digits(i + 4, i + 6)
        if (hh < 0 || mm < 0 || hh > 23 || mm > 59) return -1L
        val v = hh * 3600L + mm * 60L
        if (zone.charAt(0) == '-') -v else v
      } else zoneOffset(zone)
    if (off == Long.MinValue) return -1L
    civilEpoch(y, mo, d, h, mi, sec) - off
  }

  /** Parse one feed document: (format, entries). */
  def parse(xml: String): (String, Seq[Entry]) = {
    if (xml == null || xml.isEmpty) return ("", Nil)
    val out = ArrayBuffer.empty[Entry]
    var format = ""
    val n = xml.length
    var i = 0
    var inEntry = false
    var unknownDepth = 0
    var title = ""
    var url: String = null
    var published = ""
    var field: String = null
    val text = new StringBuilder
    def localName(rawTag: String): String = {
      var e = rawTag.length
      var j = 0
      var done = false
      while (j < rawTag.length && !done) {
        val c = rawTag.charAt(j)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/') {
          e = j; done = true
        } else j += 1
      }
      var s = 0
      j = 0
      while (j < e) { if (rawTag.charAt(j) == ':') s = j + 1; j += 1 }
      rawTag.substring(s, e).toLowerCase
    }
    def storeField(): Unit = {
      val v = text.toString.trim
      field match {
        case "title"   => title = v
        case "link"    => url = v // rss: element text
        case "pubdate" | "updated" => published = v
        case _ => ()
      }
      field = null
      text.clear()
    }
    def emit(): Unit = {
      if (field != null) storeField() // unclosed field: best effort
      if (url != null && url.nonEmpty) {
        val ts =
          if (published.isEmpty) -1L
          else if (format == "rss") parseRfc1123(published)
          else parseIso8601(published)
        out += Entry(title, url, published, ts)
      }
      inEntry = false
    }
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.regionMatches(i, "<!--", 0, 4)) {
          val close = xml.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (xml.regionMatches(i, "<![CDATA[", 0, 9)) {
          val close = xml.indexOf("]]>", i + 9)
          val end = if (close < 0) n else close
          if (field != null && unknownDepth == 0)
            text.append(xml.substring(i + 9, end))
          i = if (close < 0) n else close + 3
        } else if (xml.regionMatches(i, "<?", 0, 2)) {
          val close = xml.indexOf("?>", i + 2)
          i = if (close < 0) n else close + 2
        } else if (xml.regionMatches(i, "<!", 0, 2)) {
          val gt = xml.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
        } else {
          val gt = xml.indexOf('>', i)
          val end = if (gt < 0) n else gt
          val rawTag = xml.substring(i + 1, end)
          val closing = rawTag.startsWith("/")
          val selfClosing = rawTag.endsWith("/")
          val name = localName(if (closing) rawTag.substring(1) else rawTag)
          if (!closing) {
            name match {
              case "rss" | "channel" => if (format.isEmpty) format = "rss"
              case "feed"            => if (format.isEmpty) format = "atom"
              case "item" if format == "rss" =>
                inEntry = true; unknownDepth = 0
                title = ""; url = null; published = ""; field = null
              case "entry" if format == "atom" =>
                inEntry = true; unknownDepth = 0
                title = ""; url = null; published = ""; field = null
              case "link" if format == "atom" && inEntry && unknownDepth == 0 =>
                // attribute-borne URL; first rel-less/alternate link wins
                if (url == null || url.isEmpty) {
                  val sp = rawTag.indexWhere(_.isWhitespace)
                  val pairs =
                    if (sp < 0) Nil
                    else Html.attrPairs(rawTag.substring(sp))
                  val rel = pairs.collectFirst { case ("rel", v) => v }
                  if (rel.forall(_.equalsIgnoreCase("alternate")))
                    pairs.collectFirst { case ("href", v) => v }
                      .foreach(h => url = h)
                }
              case "title" if inEntry && unknownDepth == 0 && !selfClosing =>
                field = "title"; text.clear()
              case "link" if format == "rss" && inEntry && unknownDepth == 0 &&
                  !selfClosing =>
                field = "link"; text.clear()
              case "pubdate" if format == "rss" && inEntry &&
                  unknownDepth == 0 && !selfClosing =>
                field = "pubdate"; text.clear()
              case "updated" if format == "atom" && inEntry &&
                  unknownDepth == 0 && !selfClosing =>
                field = "updated"; text.clear()
              case _ if inEntry && !selfClosing => unknownDepth += 1
              case _ => ()
            }
          } else {
            name match {
              case "item" | "entry" if inEntry && unknownDepth == 0 => emit()
              case f if field != null && f == field => storeField()
              case _ if unknownDepth > 0 => unknownDepth -= 1
              case _ => ()
            }
          }
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&' && field != null && unknownDepth == 0) {
        val (decoded, next) = Html.reference(xml, i)
        text.append(decoded)
        i = next
      } else {
        if (field != null && unknownDepth == 0) text.append(c)
        i += 1
      }
    }
    if (inEntry) emit() // unclosed entry at EOF: best effort
    (format, out.toSeq)
  }

  /** Per-doc feed rows — row-local parse + explode, no shuffle beyond
    * the source scan; streaming-safe. */
  final case class FeedRow(doc_id: Long, seq: Int, format: String,
      title: String, url: String, ts_epoch: Long)

  def entries(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[FeedRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.flatMap { case (id, xml) =>
        val (fmt, es) = parse(xml)
        es.iterator.zipWithIndex.map { case (e, k) =>
          FeedRow(id, k, fmt, e.title, e.url, e.tsEpoch)
        }
      }
    }
  }
}
