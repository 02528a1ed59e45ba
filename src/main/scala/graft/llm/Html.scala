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
    if (body.startsWith("#x") || body.startsWith("#X")) {
      val hex = body.substring(2)
      if (hex.nonEmpty && hex.length <= 4 && hex.forall(c => Character.digit(c, 16) >= 0))
        (Integer.parseInt(hex, 16).toChar.toString, semi + 1)
      else ("&", i + 1)
    } else if (body.startsWith("#")) {
      val dec = body.substring(1)
      if (dec.nonEmpty && dec.length <= 5 && dec.forall(_.isDigit) && dec.toInt <= 0xffff)
        (dec.toInt.toChar.toString, semi + 1)
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
  private def href(attrs: String): Option[String] = {
    val n = attrs.length
    var i = 0
    while (i < n) {
      while (i < n && (attrs.charAt(i).isWhitespace || attrs.charAt(i) == '/')) i += 1
      if (i >= n) return None
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
      if (name.equalsIgnoreCase("href") && value != null) {
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
        return Some(sb.toString)
      }
      if (i == nameStart) i += 1 // junk char neither name nor '=': advance
    }
    None
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
}
