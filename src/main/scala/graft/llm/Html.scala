package graft.llm

/** HTML-to-text extraction — the step between [[Warc]]'s HTTP bodies and
  * every text operator: a crawl corpus is HTML, and quality scoring /
  * dedup / tokenization all want the rendered text. Best-effort TOTAL
  * extraction (malformed HTML is the NORM in crawl data, so unlike the
  * binary codecs there is no quarantine path — a tag soup still yields
  * its text), but deterministic to the byte, which is what lets q148
  * hash-check the extractor against an arithmetic oracle.
  *
  * Extraction rules (each spec-tested in HtmlSpec):
  *   - `<script>`/`<style>` elements are dropped WITH their content
  *     (case-insensitive, attribute-tolerant open tags)
  *   - `<!-- comments -->` vanish entirely (no separator — `a<!-- -->b`
  *     renders "ab"); an unterminated comment drops the rest of the
  *     document (the HTML5 rule, and the safe direction for training
  *     data — commented-out markup never renders)
  *   - every other tag (incl. `</closers>` and `<self-closers/>`)
  *     becomes a single space — block/inline distinction doesn't matter
  *     downstream of whitespace collapse
  *   - character references decoded: the five predefined named entities
  *     (`&amp; &lt; &gt; &quot; &apos;`) + `&nbsp;` (ubiquitous; decodes
  *     to a plain space here), numeric `&#NN;` and hex `&#xHH;` for
  *     code points ≤ 0xFFFF; unknown/malformed references pass through
  *     literally (crawl reality: `&foo` is usually literal text)
  *   - whitespace (incl. newlines/tabs) collapsed to single spaces,
  *     result trimmed
  *   - `title` = the first `<title>` element's collapsed content
  */
object Html {

  final case class Extracted(title: String, text: String)

  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  def extract(html: String): Extracted = {
    if (html == null || html.isEmpty) return Extracted("", "")
    val text = new StringBuilder(html.length)
    var title = ""
    var titleFound = false
    var inTitle = false
    val titleBuf = new StringBuilder
    var i = 0
    val n = html.length
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val closer = if (lowerAt(i, "<script")) "</script" else "</style"
          var j = i + 1
          var stop = -1
          while (stop < 0 && j < n) {
            if (html.charAt(j) == '<' && lowerAt(j, closer)) stop = j
            j += 1
          }
          i = if (stop < 0) n
          else {
            val gt = html.indexOf('>', stop)
            if (gt < 0) n else gt + 1
          }
          text.append(' ')
        } else {
          if (lowerAt(i, "<title")) { if (!titleFound) inTitle = true }
          else if (lowerAt(i, "</title")) {
            if (inTitle) { title = collapse(titleBuf.toString); titleFound = true }
            inTitle = false
          }
          val gt = html.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
          text.append(' ')
        }
      } else if (c == '&') {
        val (decoded, next) = reference(html, i)
        if (inTitle) titleBuf.append(decoded) else text.append(decoded)
        i = next
      } else {
        if (inTitle) titleBuf.append(c) else text.append(c)
        i += 1
      }
    }
    if (inTitle && !titleFound) title = collapse(titleBuf.toString)
    Extracted(title, collapse(text.toString))
  }

  /** Decode one character reference at `i` (which points at '&');
    * returns (replacement, next index). Malformed → literal '&'.
    * Shared with [[Sitemap]] — sitemap `<loc>` values carry the same
    * five predefined XML entities. */
  private[llm] def reference(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    // HTML5 maps surrogate-range references to U+FFFD: a lone surrogate
    // is not valid Unicode, and letting one through diverges from any
    // byte-level oracle the moment UTF-8 encoding replaces it
    def codePoint(cp: Int): String =
      if (cp >= 0xd800 && cp <= 0xdfff) "�" else cp.toChar.toString
    if (body.startsWith("#x") || body.startsWith("#X")) {
      val hex = body.substring(2)
      if (hex.nonEmpty && hex.length <= 4 && hex.forall(c => Character.digit(c, 16) >= 0))
        (codePoint(Integer.parseInt(hex, 16)), semi + 1)
      else ("&", i + 1)
    } else if (body.startsWith("#")) {
      val dec = body.substring(1)
      if (dec.nonEmpty && dec.length <= 5 && dec.forall(_.isDigit) && dec.toInt <= 0xffff)
        (codePoint(dec.toInt), semi + 1)
      else ("&", i + 1)
    } else Named.get(body) match {
      case Some(r) => (r, semi + 1)
      case None    => ("&", i + 1)
    }
  }

  /** `<a href>` extraction in document order — the crawl chain's link
    * discovery step (frontier expansion + the edge list of the link
    * graph that quality signals like PageRank run over). Same walk rules
    * as [[extract]]: anchors inside comments or script/style content do
    * NOT extract (commented-out or script-embedded markup never renders
    * a link), unterminated comments drop the rest. Per anchor tag the
    * FIRST `href` attribute wins; values may be double-quoted,
    * single-quoted, or unquoted (terminated by whitespace), and are
    * entity-decoded ("&amp;" is required escaping inside attribute
    * values). An `<a>` without `href` yields nothing. */
  def links(html: String): Seq[String] = {
    if (html == null || html.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = html.length
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val closer = if (lowerAt(i, "<script")) "</script" else "</style"
          var j = i + 1
          var stop = -1
          while (stop < 0 && j < n) {
            if (html.charAt(j) == '<' && lowerAt(j, closer)) stop = j
            j += 1
          }
          i = if (stop < 0) n
          else {
            val gt = html.indexOf('>', stop)
            if (gt < 0) n else gt + 1
          }
        } else {
          val gt = html.indexOf('>', i)
          val end = if (gt < 0) n else gt
          if ((lowerAt(i, "<a ") || lowerAt(i, "<a\t") || lowerAt(i, "<a\n") ||
              lowerAt(i, "<a\r")) && end > i) {
            href(html.substring(i + 2, end)).foreach(out += _)
          }
          i = if (gt < 0) n else gt + 1
        }
      } else i += 1
    }
    out.toSeq
  }

  /** First href attribute value inside an anchor tag's attribute text,
    * entity-decoded; None when absent. A real attribute TOKENIZER (name,
    * optional `= value`), not a substring scan — "href" appearing inside
    * another attribute's value (`title="see href=..."`) must not match.
    * A bare valueless `href` counts as absent. */
  private def href(attrs: String): Option[String] =
    attrLookup(attrs, "href")

  /** All VALUED attributes of a tag's attribute text, in document order,
    * names lowercased, values entity-decoded. A valueless attribute
    * (`<meta charset>` boolean form) is omitted — callers here only ever
    * consume name=value pairs. First occurrence of a repeated name is the
    * one [[attrLookup]] surfaces (browsers keep the first too). */
  private[llm] def attrPairs(attrs: String): List[(String, String)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val n = attrs.length
    var i = 0
    while (i < n) {
      while (i < n && (attrs.charAt(i).isWhitespace || attrs.charAt(i) == '/')) i += 1
      if (i < n) {
        val nameStart = i
        while (i < n && !attrs.charAt(i).isWhitespace &&
          attrs.charAt(i) != '=' && attrs.charAt(i) != '/') i += 1
        val name = attrs.substring(nameStart, i)
        while (i < n && attrs.charAt(i).isWhitespace) i += 1
        var value: String = null
        if (i < n && attrs.charAt(i) == '=') {
          i += 1
          while (i < n && attrs.charAt(i).isWhitespace) i += 1
          if (i < n) {
            val q = attrs.charAt(i)
            if (q == '"' || q == '\'') {
              val close = attrs.indexOf(q, i + 1)
              value = attrs.substring(i + 1, if (close < 0) n else close)
              i = if (close < 0) n else close + 1
            } else {
              val s = i
              while (i < n && !attrs.charAt(i).isWhitespace) i += 1
              value = attrs.substring(s, i)
            }
          } else value = ""
        }
        if (name.nonEmpty && value != null) {
          // entity-decode through the shared reference decoder
          val sb = new StringBuilder(value.length)
          var k = 0
          while (k < value.length) {
            val c = value.charAt(k)
            if (c == '&') {
              val (decoded, next) = reference(value, k)
              sb.append(decoded); k = next
            } else { sb.append(c); k += 1 }
          }
          out += ((name.toLowerCase(java.util.Locale.ROOT), sb.toString))
        }
        if (i == nameStart) i += 1 // junk char neither name nor '=': advance
      }
    }
    out.toList
  }

  /** First valued occurrence of `name` (give it lowercased) in a tag's
    * attribute text, entity-decoded. */
  private[llm] def attrLookup(attrs: String, name: String): Option[String] =
    attrPairs(attrs).collectFirst { case (k, v) if k == name => v }

  /** Page-metadata harvest — the head-of-document fields crawl curation
    * reads before it ever renders the body: the canonical URL feeds
    * canonical-URL dedup (q141's input in real pipelines), robots
    * `noindex` is a hard keep-out signal, the declared `lang` routes
    * documents before any detector runs, and title/description are the
    * retrieval-display fields. Same walk rules as [[extract]]/[[links]]
    * (markup inside comments or script/style content does NOT count;
    * unterminated comments drop the rest), first occurrence wins per
    * field, attribute values through the same tokenizer + entity
    * decoder. Field rules, each spec-tested in HtmlSpec:
    *   - `title`       first `<title>` element content, collapsed
    *   - `description` first `<meta name=description content=…>` (name
    *                   matched case-insensitively), collapsed
    *   - `og_title`    first `<meta property=og:title content=…>`
    *   - `canonical`   first `<link>` whose `rel` value contains the
    *                   whitespace-separated token `canonical` (case-
    *                   insensitive; `rel` is a token LIST per the spec)
    *   - `lang`        first `<html lang=…>`, lowercased (BCP 47 tags
    *                   are case-insensitive; lowercase is the canonical
    *                   comparison form)
    *   - `noindex`     true iff any `<meta name=robots content=…>`
    *                   carries the comma/space-separated token `noindex`
    *                   (token match — `noindexplease` must not fire)
    *   - `n_meta`      count of `<meta>` tags carrying BOTH a name or
    *                   property AND a content value (the harvestable
    *                   ones; charset/http-equiv forms don't count)
    * Absent string fields are empty "" (not null) — TOTAL like the rest
    * of the crawl chain, and byte-deterministic for the q159 hash gate. */
  final case class Meta(title: String, description: String, ogTitle: String,
      canonical: String, lang: String, noindex: Boolean, nMeta: Int)

  def metadata(html: String): Meta = {
    if (html == null || html.isEmpty) return Meta("", "", "", "", "", false, 0)
    var title = ""; var titleFound = false
    var inTitle = false
    val titleBuf = new StringBuilder
    var description = ""; var ogTitle = ""; var canonical = ""; var lang = ""
    var noindex = false
    var nMeta = 0
    var i = 0
    val n = html.length
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    def relHasToken(rel: String, token: String): Boolean =
      rel.split("\\s+").exists(_.equalsIgnoreCase(token))
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val closer = if (lowerAt(i, "<script")) "</script" else "</style"
          var j = i + 1
          var stop = -1
          while (stop < 0 && j < n) {
            if (html.charAt(j) == '<' && lowerAt(j, closer)) stop = j
            j += 1
          }
          i = if (stop < 0) n
          else {
            val gt = html.indexOf('>', stop)
            if (gt < 0) n else gt + 1
          }
        } else {
          val gt = html.indexOf('>', i)
          val end = if (gt < 0) n else gt
          if (lowerAt(i, "<title")) { if (!titleFound) inTitle = true }
          else if (lowerAt(i, "</title")) {
            if (inTitle) { title = collapse(titleBuf.toString); titleFound = true }
            inTitle = false
          } else if (lowerAt(i, "<meta") && end > i + 5 &&
              !Character.isLetterOrDigit(html.charAt(i + 5))) {
            val pairs = attrPairs(html.substring(i + 5, end))
            def first(k: String) = pairs.collectFirst { case (`k`, v) => v }
            val name = first("name"); val prop = first("property")
            val content = first("content")
            if ((name.nonEmpty || prop.nonEmpty) && content.nonEmpty) {
              nMeta += 1
              val key = name.orElse(prop).get.toLowerCase(java.util.Locale.ROOT)
              if (key == "description" && name.nonEmpty && description.isEmpty)
                description = collapse(content.get)
              else if (key == "og:title" && prop.nonEmpty && ogTitle.isEmpty)
                ogTitle = collapse(content.get)
              else if (key == "robots" && name.nonEmpty &&
                content.get.split("[,\\s]+").exists(_.equalsIgnoreCase("noindex")))
                noindex = true
            }
          } else if (lowerAt(i, "<link") && end > i + 5 &&
              !Character.isLetterOrDigit(html.charAt(i + 5))) {
            val attrs = html.substring(i + 5, end)
            if (canonical.isEmpty &&
                attrLookup(attrs, "rel").exists(relHasToken(_, "canonical")))
              canonical = attrLookup(attrs, "href").getOrElse("")
          } else if (lowerAt(i, "<html") && end > i + 5 &&
              !Character.isLetterOrDigit(html.charAt(i + 5))) {
            if (lang.isEmpty)
              lang = attrLookup(html.substring(i + 5, end), "lang")
                .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
          }
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val (decoded, next) = reference(html, i)
        if (inTitle) titleBuf.append(decoded)
        i = next
      } else {
        if (inTitle) titleBuf.append(c)
        i += 1
      }
    }
    if (inTitle && !titleFound) title = collapse(titleBuf.toString)
    Meta(title, description, ogTitle, canonical, lang, noindex, nMeta)
  }

  /** JSON-LD structured-data harvest — the crawl-curation signal after
    * [[metadata]]'s head harvest: schema.org entities (Article, Product,
    * Organization…) ship as `<script type="application/ld+json">`
    * payloads, the ONE case where script CONTENT is signal rather than
    * noise. Harvest rules, each spec-tested:
    *
    *   - a script tag qualifies iff its `type` attribute value — trimmed,
    *     case-insensitive, ignoring any `;parameter` suffix — is
    *     `application/ld+json`; other scripts (typeless ones included)
    *     drop with their content as everywhere else in the chain
    *   - the payload is the RAW text to the first `</script`, trimmed but
    *     NOT entity-decoded (the HTML spec treats script content as raw
    *     text; `&amp;` inside JSON-LD is literal bytes) and NOT parsed —
    *     emitting strings and letting the JSON function family (B28)
    *     parse keeps malformed payloads quarantined per-block downstream
    *   - blocks inside comments do not harvest; an unterminated comment
    *     or script drops the rest of the document (the [[extract]] rule)
    *   - blocks emit in document order
    */
  def jsonLd(html: String): Seq[String] = {
    if (html == null || html.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = html.length
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<style")) {
          // style content skips whole (a literal "<script" inside CSS
          // must not open a capture) — the [[links]] rule
          var j = i + 1
          var stop = -1
          while (stop < 0 && j < n) {
            if (html.charAt(j) == '<' && lowerAt(j, "</style")) stop = j
            j += 1
          }
          i = if (stop < 0) n
          else {
            val gt = html.indexOf('>', stop)
            if (gt < 0) n else gt + 1
          }
        } else if (lowerAt(i, "<script")) {
          val gt = html.indexOf('>', i)
          if (gt < 0) { i = n } // unterminated tag: rest drops
          else {
            val typ = attrLookup(html.substring(i + 7, gt), "type")
              .map { v =>
                val semi = v.indexOf(';')
                (if (semi >= 0) v.substring(0, semi) else v)
                  .trim.toLowerCase(java.util.Locale.ROOT)
              }
            // find the closing tag; content is raw text up to it
            var j = gt + 1
            var stop = -1
            while (stop < 0 && j < n) {
              if (html.charAt(j) == '<' && lowerAt(j, "</script")) stop = j
              j += 1
            }
            if (stop < 0) { i = n } // unterminated script: rest drops
            else {
              if (typ.contains("application/ld+json"))
                out += html.substring(gt + 1, stop).trim
              val gt2 = html.indexOf('>', stop)
              i = if (gt2 < 0) n else gt2 + 1
            }
          }
        } else {
          val gt = html.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
        }
      } else i += 1
    }
    out.toSeq
  }

  /** Table-cell extraction — the STRUCTURED-data harvest from page
    * bodies (the `<table>` counterpart of [[jsonLd]]'s script harvest:
    * statistics, specs, and rankings ship as HTML tables, and a tabular
    * corpus wants them as cells, not prose). Walk rules, each
    * spec-tested:
    *
    *   - cells are `<td>`/`<th>` content at table depth 1 — one row per
    *     cell as (table, row, col), all 0-based, `<tr>` advancing the
    *     row and resetting the column; NESTED tables are skipped whole
    *     (their cells belong to no flat grid) and do not consume
    *     indexes of the outer table
    *   - `colspan="N"` advances the NEXT cell's column by N (clamped to
    *     [1, 1000]; non-numeric → 1), so grids with wide cells stay
    *     aligned; ROWSPAN is NOT tracked — a cell spanning rows occupies
    *     only its own row's grid, and later rows' columns do not shift
    *     around it (the documented limitation: honoring rowspan needs a
    *     per-table occupancy grid, which this single-pass walk avoids)
    *   - cell text follows the [[extract]] rules: inner markup becomes
    *     separators, entities decode, comments/script/style content
    *     drops, whitespace collapses
    *   - `<th>` flags `header=true` (the schema row a consumer needs);
    *     cells outside `<tr>`, text outside cells, and tables inside
    *     comments contribute nothing; unterminated comments drop the
    *     rest (the house rule)
    */
  final case class TableCell(table: Int, row: Int, col: Int,
      header: Boolean, text: String)

  /** Parse `colspan=N` from a cell's open tag (chars in `[from, until)`)
    * through the SHARED attribute tokenizer ([[attrPairs]], the same
    * walk [[href]] and [[metadata]] use) — name, optional `=`, optional
    * quoted/unquoted value — which is what makes the lookup exact on
    * tag soup: `colspan=3` inside another attribute's QUOTED value
    * never matches (the value is consumed whole), a stray apostrophe in
    * an UNQUOTED value is value data rather than a quote-open,
    * `data-colspan` is a different attribute name, and
    * `class="a"colspan=2` (missing inter-attribute space — browsers
    * recover by starting a new attribute after the closing quote) still
    * finds colspan. Absent / non-numeric / <1 → 1, clamped to 1000 (the
    * HTML spec's own cap). Only a TRUNCATED tag (no closing '>',
    * until = document end) caps the walk at 512 chars so a
    * colspan-shaped string in page text can't be consumed; well-formed
    * tags walk to their real end however long their inline CSS runs. */
  private def colspanOf(html: String, from: Int, until: Int,
      truncated: Boolean): Int = {
    val stop = if (truncated) math.min(until, from + 512) else until
    var p = from + 1 // past '<'
    while (p < stop && !Character.isWhitespace(html.charAt(p))) p += 1 // tag name
    if (p >= stop) return 1
    attrLookup(html.substring(p, stop), "colspan") match {
      case Some(v) =>
        var n = 0
        var any = false
        var i = 0
        while (i < v.length && n <= 1000 && Character.isDigit(v.charAt(i))) {
          n = n * 10 + (v.charAt(i) - '0'); any = true; i += 1
        }
        if (!any || n < 1) 1 else math.min(n, 1000)
      case None => 1
    }
  }

  def tables(html: String): Seq[TableCell] = {
    if (html == null || html.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[TableCell]
    val n = html.length
    var i = 0
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    var depth = 0      // <table> nesting
    var tableIdx = -1  // current depth-1 table
    var row = -1
    var col = -1
    var nextCol = 0    // column the next cell lands on (colspan-aware)
    var inRow = false
    var inCell = false
    var cellHeader = false
    val buf = new StringBuilder
    def closeCell(): Unit =
      if (inCell) {
        out += TableCell(tableIdx, row, col, cellHeader, collapse(buf.toString))
        inCell = false
      }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val closer = if (lowerAt(i, "<script")) "</script" else "</style"
          var j = i + 1
          var stop = -1
          while (stop < 0 && j < n) {
            if (html.charAt(j) == '<' && lowerAt(j, closer)) stop = j
            j += 1
          }
          i = if (stop < 0) n
          else {
            val gt = html.indexOf('>', stop)
            if (gt < 0) n else gt + 1
          }
        } else {
          val gt = html.indexOf('>', i)
          val end = if (gt < 0) n else gt
          def tag(s: String): Boolean = lowerAt(i, s) && end > i &&
            (i + s.length >= end ||
              !Character.isLetterOrDigit(html.charAt(i + s.length)))
          if (tag("<table")) {
            depth += 1
            if (depth == 1) { tableIdx += 1; row = -1; inRow = false }
          } else if (tag("</table")) {
            if (depth == 1) { closeCell(); inRow = false }
            if (depth > 0) depth -= 1
          } else if (depth == 1) {
            if (tag("<tr")) { closeCell(); row += 1; nextCol = 0; inRow = true }
            else if (tag("</tr")) { closeCell(); inRow = false }
            else if (tag("<td") || tag("<th")) {
              closeCell()
              if (inRow) {
                col = nextCol
                nextCol = col + colspanOf(html, i, end, gt < 0)
                inCell = true
                cellHeader = lowerAt(i, "<th")
                buf.clear()
              }
            } else if (tag("</td") || tag("</th")) closeCell()
            else if (inCell) buf.append(' ') // inner markup separates
          }
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val (decoded, next) = reference(html, i)
        if (depth == 1 && inCell) buf ++= decoded
        i = next
      } else {
        if (depth == 1 && inCell) buf += c
        i += 1
      }
    }
    closeCell() // unterminated cell at EOF: lenient
    out.toSeq
  }

  /** Main-content extraction — block-level boilerplate removal, the step
    * between [[extract]]'s whole-page text and quality scoring: nav bars,
    * footers, and link farms score as "text" to q148 but poison training
    * data. The justext-family heuristic, kept INTEGER-ONLY so the
    * decision boundary is bit-deterministic and oracle-re-derivable:
    *
    *   - the document splits into BLOCKS at block-level tag boundaries
    *     (`p div h1..h6 li ul ol br hr table tr td th blockquote pre
    *     article section header footer nav aside main form` — open or
    *     close; inline tags like `<a> <b> <span>` do NOT split)
    *   - per block, count non-whitespace chars (`nonWs`) and the subset
    *     inside `<a>` elements (`linkNonWs`) — counted on DECODED chars
    *     before whitespace collapse, so the counts are independent of
    *     how the markup spells its whitespace
    *   - a block is GOOD iff `nonWs >= 10 && 2*linkNonWs <= nonWs`
    *     (too-short blocks are furniture; majority-link blocks are
    *     navigation — both integer comparisons, no float density)
    *   - content = good blocks' collapsed text joined by single spaces
    *
    * Same walk rules as [[extract]] (comments/script/style drop with
    * content, unterminated comment drops the rest); `<title>` content is
    * head furniture, not body, and is excluded from blocks. TOTAL and
    * byte-deterministic — the q160 hash gate certifies the classifier's
    * decision boundary, not just the plumbing. */
  final case class Block(text: String, nonWs: Int, linkNonWs: Int) {
    def good: Boolean = nonWs >= 10 && 2 * linkNonWs <= nonWs
  }

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "hr", "table", "tr", "td", "th", "blockquote", "pre",
    "article", "section", "header", "footer", "nav", "aside", "main",
    "form", "body", "html", "head")

  def blocks(html: String): Seq[Block] = {
    if (html == null || html.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val buf = new StringBuilder
    var nonWs = 0
    var linkNonWs = 0
    var linkDepth = 0
    var inTitle = false
    var i = 0
    val n = html.length
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    def flush(): Unit = {
      val text = collapse(buf.toString)
      if (text.nonEmpty) out += Block(text, nonWs, linkNonWs)
      buf.clear(); nonWs = 0; linkNonWs = 0; linkDepth = 0
    }
    def append(s: String): Unit = {
      if (!inTitle) {
        var k = 0
        while (k < s.length) {
          val c = s.charAt(k)
          buf.append(c)
          if (!c.isWhitespace) {
            nonWs += 1
            if (linkDepth > 0) linkNonWs += 1
          }
          k += 1
        }
      }
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val closer = if (lowerAt(i, "<script")) "</script" else "</style"
          var j = i + 1
          var stop = -1
          while (stop < 0 && j < n) {
            if (html.charAt(j) == '<' && lowerAt(j, closer)) stop = j
            j += 1
          }
          i = if (stop < 0) n
          else {
            val gt = html.indexOf('>', stop)
            if (gt < 0) n else gt + 1
          }
        } else {
          // tag name: letters/digits after '<' or '</'
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          var p = i + (if (closing) 2 else 1)
          val nameStart = p
          while (p < n && Character.isLetterOrDigit(html.charAt(p))) p += 1
          val name = html.substring(nameStart, p).toLowerCase(java.util.Locale.ROOT)
          if (name == "title") inTitle = !closing
          else if (BlockTags.contains(name)) flush()
          else if (name == "a") {
            if (closing) { if (linkDepth > 0) linkDepth -= 1 }
            else linkDepth += 1
          } else buf.append(' ') // other inline tags separate like extract()
          if (name.nonEmpty && (BlockTags.contains(name) || name == "a"))
            buf.append(' ') // tag still separates adjacent text runs
          val gt = html.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val (decoded, next) = reference(html, i)
        append(decoded)
        i = next
      } else {
        append(c.toString)
        i += 1
      }
    }
    flush()
    out.toSeq
  }

  final case class Content(content: String, nBlocks: Int, nGood: Int)

  def mainContent(html: String): Content = {
    val bs = blocks(html)
    val good = bs.filter(_.good)
    Content(good.map(_.text).mkString(" "), bs.size, good.size)
  }

  private def collapse(s: String): String = {
    val out = new StringBuilder(s.length)
    var space = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        space = true
      else {
        if (space && out.nonEmpty) out.append(' ')
        out.append(c)
        space = false
      }
      i += 1
    }
    out.toString
  }

  /** Per-doc metadata rows — row-local, no shuffle; runs unchanged under
    * Structured Streaming (StreamingTextIngestSpec). */
  final case class MetaRow(doc_id: Long, title: String, description: String,
      og_title: String, canonical: String, lang: String, noindex: Boolean,
      n_meta: Int)

  def metadataAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[MetaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, html) =>
        val m = metadata(html)
        MetaRow(id, m.title, m.description, m.ogTitle, m.canonical, m.lang,
          m.noindex, m.nMeta)
      }
    }
  }

  /** Per-doc main-content rows — row-local, no shuffle; streaming-safe. */
  final case class ContentRow(doc_id: Long, content: String, n_blocks: Int,
      n_good: Int)

  def mainContentAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[ContentRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, html) =>
        val c = mainContent(html)
        ContentRow(id, c.content, c.nBlocks, c.nGood)
      }
    }
  }

  /** Per-block JSON-LD rows (doc_id, seq, json) — row-local flatMap, no
    * shuffle; streaming-safe. Payloads stay raw strings: the JSON
    * function family (B28) parses downstream. */
  final case class JsonLdRow(doc_id: Long, seq: Int, json: String)

  def jsonLdAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[JsonLdRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.flatMap { case (id, html) =>
        jsonLd(html).zipWithIndex.map { case (j, k) => JsonLdRow(id, k, j) }
      }
    }
  }

  /** Per-doc extraction rows — row-local, no shuffle. */
  final case class HtmlRow(doc_id: Long, title: String, text: String, n_chars: Int)

  def extractAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[HtmlRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, html) =>
        val e = extract(html)
        HtmlRow(id, e.title, e.text, e.text.length)
      }
    }
  }

  /** Per-doc table-cell rows ([[tables]] with doc_id) — row-local
    * explode, no shuffle, streaming-safe. */
  final case class TableCellRow(doc_id: Long, tbl: Int, row: Int, col: Int,
      header: Boolean, text: String)

  def tablesAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[TableCellRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (id, html) =>
      tables(html).map(c =>
        TableCellRow(id, c.table, c.row, c.col, c.header, c.text))
    })
  }
}
