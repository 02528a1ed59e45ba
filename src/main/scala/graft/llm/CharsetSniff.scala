package graft.llm

import java.nio.charset.{Charset, StandardCharsets}

/** HTTP/HTML charset sniffing + decode — the byte-to-text step a real
  * crawl chain needs between the HTTP split ([[Warc]]) and HTML
  * extraction ([[Html]]): a third of the web still serves legacy
  * encodings, and decoding them as UTF-8 either mangles text or (with a
  * replacing decoder) silently destroys it. WHATWG-style precedence,
  * each rule spec-tested:
  *
  *   1. `charset=` parameter of the Content-Type header (quotes
  *      optional, case-insensitive) — the transport wins;
  *   2. else a byte-order mark: UTF-8 (EF BB BF), UTF-16LE (FF FE),
  *      UTF-16BE (FE FF) — stripped before decode;
  *   3. else a `<meta charset=…>` or
  *      `<meta http-equiv=… content="…; charset=…">` inside the first
  *      1024 bytes (scanned as Latin-1 — the prescan is byte-level);
  *   4. else STRICT-probe UTF-8; valid → UTF-8;
  *   5. else windows-1252, the standard crawl fallback (total: every
  *      byte decodes).
  *
  * Declared charsets decode in REPLACE mode (a page with a correct
  * label and three bad bytes is still a page — crawl reality); only the
  * UNLABELED probe (rule 4) is strict, since its whole point is
  * deciding validity. Unknown labels fall through to rules 2–5.
  */
object CharsetSniff {

  final case class Decoded(text: String, charset: String, source: String)

  private val Win1252: Charset = Charset.forName("windows-1252")

  def sniff(contentType: String, body: Array[Byte]): Decoded = {
    val b = if (body == null) Array.emptyByteArray else body
    headerCharset(contentType).orElse(None) match {
      case Some(cs) => Decoded(new String(b, cs), label(cs), "header")
      case None =>
        bom(b) match {
          case Some((cs, skip)) =>
            Decoded(new String(b, skip, b.length - skip, cs), label(cs), "bom")
          case None =>
            metaCharset(b) match {
              case Some(cs) => Decoded(new String(b, cs), label(cs), "meta")
              case None =>
                strictUtf8(b) match {
                  case Some(text) => Decoded(text, "utf-8", "utf8")
                  case None => Decoded(new String(b, Win1252),
                    label(Win1252), "fallback")
                }
            }
        }
    }
  }

  // Locale.ROOT everywhere case is folded: the default locale leaks in
  // otherwise (Turkish 'I'→'ı' breaks "iso-8859-1" labels and scans)
  private def label(cs: Charset): String =
    cs.name.toLowerCase(java.util.Locale.ROOT)

  /** charset= parameter of a Content-Type value; None if absent or the
    * label is unknown to the JVM. */
  private[llm] def headerCharset(contentType: String): Option[Charset] =
    if (contentType == null) None
    else charsetParam(contentType).flatMap(lookup)

  private def lookup(name: String): Option[Charset] =
    try Some(Charset.forName(name))
    catch { case _: IllegalArgumentException => None }

  /** Extract the value of a `charset=` parameter from a header-ish
    * string, tolerating quotes and trailing junk. */
  private def charsetParam(s: String): Option[String] = {
    // case-insensitive scan of the ORIGINAL string via regionMatches:
    // toLowerCase can change LENGTH ('İ' lowers to 'i' + combining dot),
    // so offsets computed on a lowered copy don't transfer back
    var at = -1
    var p = 0
    while (at < 0 && p + 7 <= s.length) {
      if (s.regionMatches(true, p, "charset", 0, 7)) at = p else p += 1
    }
    if (at < 0) return None
    var i = at + 7
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    if (i >= s.length || s.charAt(i) != '=') return None
    i += 1
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    if (i >= s.length) return None
    val quoted = s.charAt(i) == '"' || s.charAt(i) == '\''
    val q = if (quoted) s.charAt(i) else ' '
    if (quoted) i += 1
    val start = i
    // unquoted values also end at a quote or '>': inside a meta tag's
    // content attribute the label's terminator is the attribute's own
    // closing quote (content="text/html; charset=iso-8859-1")
    def ends(c: Char): Boolean =
      if (quoted) c == q
      else c == ';' || c == ' ' || c == '\t' || c == '"' || c == '\'' || c == '>'
    while (i < s.length && !ends(s.charAt(i))) i += 1
    val v = s.substring(start, i).trim
    if (v.isEmpty) None else Some(v)
  }

  private def bom(b: Array[Byte]): Option[(Charset, Int)] =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
      b(2) == 0xBF.toByte) Some((StandardCharsets.UTF_8, 3))
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      Some((StandardCharsets.UTF_16LE, 2))
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      Some((StandardCharsets.UTF_16BE, 2))
    else None

  /** `<meta charset=…>` / `<meta … content="…charset=…">` in the first
    * 1024 bytes. The prescan reads bytes as Latin-1 (charset labels are
    * ASCII; non-ASCII bytes just ride along). */
  private[llm] def metaCharset(b: Array[Byte]): Option[Charset] = {
    val window = new String(b, 0, math.min(b.length, 1024),
      StandardCharsets.ISO_8859_1)
    val lower = window.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < lower.length) {
      val at = lower.indexOf("<meta", i)
      if (at < 0) return None
      val gt = lower.indexOf('>', at)
      val end = if (gt < 0) lower.length else gt
      val tag = window.substring(at, end)
      charsetParam(tag) match {
        case Some(name) =>
          lookup(name) match {
            case some @ Some(_) => return some
            case None => () // unknown label: keep scanning later metas
          }
        case None => ()
      }
      i = end + 1
    }
    None
  }

  private def strictUtf8(b: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8.newDecoder() // REPORT mode
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  final case class Row(doc_id: Long, text: String, charset: String, source: String)

  /** Row-local sniff+decode over (doc_id, content_type, payload). */
  def decodeAll(docs: org.apache.spark.sql.Dataset[(Long, String, Array[Byte])])
      : org.apache.spark.sql.Dataset[Row] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, ct, payload) =>
        val d = sniff(ct, payload)
        Row(id, d.text, d.charset, d.source)
      }
    }
  }
}
