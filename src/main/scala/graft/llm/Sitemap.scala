package graft.llm

import scala.collection.mutable.ArrayBuffer

/** sitemap.xml parsing (sitemaps.org protocol) — [[Robots]]'s companion:
  * robots.txt says what a crawler MAY fetch, the sitemap says what the
  * site WANTS fetched, and a crawl pipeline seeds its URL frontier from
  * exactly this join. Handles both document kinds: `<urlset>` of
  * `<url>` page entries and `<sitemapindex>` of `<sitemap>` pointers to
  * sub-sitemaps (the 50k-entry sharding rule makes indexes the norm on
  * large sites).
  *
  * Like [[Html]] this is a best-effort TOTAL parser (crawl reality —
  * sites emit broken XML, extension namespaces, and junk elements), but
  * byte-deterministic so q152 can hash-check every rule:
  *
  *   - XML declaration / DOCTYPE / `<!-- comments -->` / processing
  *     instructions skipped; an unterminated comment drops the rest
  *     (the same safe direction as Html's rule)
  *   - namespace prefixes tolerated everywhere: `<sm:url>` is matched
  *     by LOCAL name, case-insensitively
  *   - `<loc>` values entity-decoded (`&amp;` is REQUIRED escaping for
  *     `&` in sitemap URLs) via the shared [[Html.reference]] decoder;
  *     `<![CDATA[...]]>` sections pass through verbatim (XML: CDATA is
  *     never entity-decoded)
  *   - field values whitespace-trimmed; `<priority>` parsed as a
  *     double with the protocol's 0.5 default when absent or
  *     unparseable; `<lastmod>`/`<changefreq>` default to ""
  *   - an entry with no `<loc>` is DROPPED (the one required field);
  *     unknown elements — incl. extension blocks like
  *     `<image:image><image:loc>…` whose inner `loc` must NOT leak
  *     into the entry — are skipped
  */
object Sitemap {

  /** One sitemap entry; `index` marks a `<sitemap>` pointer from a
    * `<sitemapindex>` (vs a `<url>` page entry). */
  final case class Entry(loc: String, lastmod: String, changefreq: String,
      priority: Double, index: Boolean)

  def parse(xml: String): Seq[Entry] = {
    if (xml == null || xml.isEmpty) return Nil
    val out = ArrayBuffer.empty[Entry]
    val n = xml.length
    var i = 0
    var inEntry = false
    var entryIndex = false
    // depth of open unknown elements inside the current entry: while
    // >0 we are inside an extension block and capture nothing
    var unknownDepth = 0
    var loc: String = null
    var lastmod = ""
    var changefreq = ""
    var priority = 0.5
    var field: String = null // local name of the element being captured
    val text = new StringBuilder
    def localName(rawTag: String): String = {
      var s = 0
      var e = rawTag.length
      var j = 0
      var done = false
      while (j < rawTag.length && !done) {
        val c = rawTag.charAt(j)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/') {
          e = j; done = true
        } else j += 1
      }
      j = s
      while (j < e) { if (rawTag.charAt(j) == ':') s = j + 1; j += 1 }
      rawTag.substring(s, e).toLowerCase
    }
    def resetEntry(index: Boolean): Unit = {
      inEntry = true; entryIndex = index; unknownDepth = 0
      loc = null; lastmod = ""; changefreq = ""; priority = 0.5
      field = null
    }
    def storeField(): Unit = {
      val v = text.toString.trim
      field match {
        case "loc"        => loc = v
        case "lastmod"    => lastmod = v
        case "changefreq" => changefreq = v
        case "priority" =>
          priority = try v.toDouble catch { case _: NumberFormatException => 0.5 }
        case _ => ()
      }
      field = null
      text.clear()
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
              case "url"     => resetEntry(index = false)
              case "sitemap" => resetEntry(index = true)
              case "loc" | "lastmod" | "changefreq" | "priority"
                  if inEntry && unknownDepth == 0 && !selfClosing =>
                field = name; text.clear()
              case "urlset" | "sitemapindex" => () // containers
              case _ if inEntry && !selfClosing =>
                // unknown element inside an entry: an extension block —
                // suspend capture until its matching close
                unknownDepth += 1
              case _ => ()
            }
          } else {
            name match {
              case "url" | "sitemap" if inEntry =>
                if (field != null) storeField() // unclosed field: best effort
                if (loc != null && loc.nonEmpty)
                  out += Entry(loc, lastmod, changefreq, priority, entryIndex)
                inEntry = false
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
    out.toSeq
  }

  /** Per-doc frontier rows — row-local parse + explode, no shuffle
    * beyond the source scan; `seq` is the entry's position within its
    * document. */
  final case class UrlRow(doc_id: Long, seq: Int, loc: String, lastmod: String,
      changefreq: String, priority: Double, is_index: Boolean)

  def entries(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[UrlRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.flatMap { case (id, xml) =>
        parse(xml).iterator.zipWithIndex.map { case (e, k) =>
          UrlRow(id, k, e.loc, e.lastmod, e.changefreq, e.priority, e.index)
        }
      }
    }
  }
}
