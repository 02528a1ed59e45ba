package graft.llm

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** RFC 5322 / MIME email parsing — the mail-archive tier of a document
  * corpus (mailing lists and public archives are classic high-quality
  * prose sources, and their text sits behind real wire structure no
  * regex reaches). Spec-aware in the [[Zip]]/[[Warc]] sense:
  *
  *   - header section to the first blank line: `Name: value` fields
  *     with RFC 5322 FOLDING (continuation lines start with WS and
  *     join with a single space), names case-insensitive, first
  *     occurrence wins
  *   - RFC 2047 encoded-words in header values: `=?charset?B?…?=`
  *     (base64) and `=?charset?Q?…?=` (Q-encoding: `_` is SPACE, `=XX`
  *     is a hex byte) decode; UTF-8/ISO-8859-1/US-ASCII charsets
  *     honored, unknown charsets leave the word verbatim; malformed
  *     words pass through literally (crawl reality)
  *   - `Content-Type` params through a quote-tolerant parser; a
  *     multipart type splits the body on `--boundary` delimiter lines
  *     (the closing `--boundary--` ends the walk; preamble and
  *     epilogue drop per RFC 2046), one nesting level — each part has
  *     its own headers + body
  *   - `Content-Transfer-Encoding`: `base64` through the JDK MIME
  *     decoder (whitespace-tolerant), `quoted-printable` with `=XX`
  *     bytes and soft `=\n` line breaks (malformed escapes pass
  *     through literally), 7bit/8bit/absent copy verbatim
  *   - `text` = the FIRST `text/plain` part's decoded body (the
  *     training-text payload; HTML parts route to [[Html.extract]]
  *     downstream), or the decoded body itself when not multipart
  *   - quarantine: no header section at all → None; a part whose
  *     base64 payload is corrupt yields that part empty, not a
  *     poisoned message
  *
  * Row-local, no shuffle; streaming-safe.
  */
object Eml {

  final case class Mail(subject: String, from: String, nParts: Int,
      text: String)

  private[llm] def decodeQp(s: String): String = {
    val out = new StringBuilder(s.length)
    val bytes = ArrayBuffer.empty[Byte]
    def flush(): Unit =
      if (bytes.nonEmpty) {
        out ++= new String(bytes.toArray, UTF_8)
        bytes.clear()
      }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft break
        else if (i + 2 < s.length && s.charAt(i + 1) == '\r' &&
          s.charAt(i + 2) == '\n') i += 3
        else if (i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
          bytes += ((Character.digit(s.charAt(i + 1), 16) << 4) |
            Character.digit(s.charAt(i + 2), 16)).toByte
          i += 3
        } else { flush(); out += c; i += 1 } // malformed: literal
      } else { flush(); out += c; i += 1 }
    }
    flush()
    out.toString
  }

  /** Byte-level QP for encoded-words: literals are ASCII, `=XX` is one
    * byte — the CHARSET then renders the bytes (a latin1 Q-word's =E9
    * must become 'é' via ISO-8859-1, not a UTF-8 replacement char). */
  private def qpBytes(s: String): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 &&
        Character.digit(s.charAt(i + 2), 16) >= 0) {
        out += ((Character.digit(s.charAt(i + 1), 16) << 4) |
          Character.digit(s.charAt(i + 2), 16)).toByte
        i += 3
      } else { out += c.toByte; i += 1 }
    }
    out.toArray
  }

  private def charsetOf(label: String): Option[java.nio.charset.Charset] =
    label.toLowerCase(java.util.Locale.ROOT) match {
      case "utf-8" | "utf8" => Some(UTF_8)
      case "iso-8859-1" | "latin1" => Some(java.nio.charset.StandardCharsets.ISO_8859_1)
      case "us-ascii" | "ascii" => Some(java.nio.charset.StandardCharsets.US_ASCII)
      case _ => None
    }

  /** RFC 2047 encoded-word decoding within a header value. */
  private[llm] def decodeWords(v: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < v.length) {
      val at = v.indexOf("=?", i)
      if (at < 0) { out ++= v.substring(i); i = v.length }
      else {
        val q1 = v.indexOf('?', at + 2)
        val q2 = if (q1 < 0) -1 else v.indexOf('?', q1 + 1)
        val end = if (q2 < 0) -1 else v.indexOf("?=", q2 + 1)
        val decoded: Option[String] =
          if (end < 0) None
          else {
            val cs = charsetOf(v.substring(at + 2, q1))
            val enc = v.substring(q1 + 1, q2).toLowerCase(java.util.Locale.ROOT)
            val payload = v.substring(q2 + 1, end)
            cs.flatMap { charset =>
              enc match {
                case "b" =>
                  try Some(new String(
                    java.util.Base64.getMimeDecoder.decode(payload), charset))
                  catch { case _: IllegalArgumentException => None }
                case "q" =>
                  Some(new String(qpBytes(payload.replace('_', ' ')), charset))
                case _ => None
              }
            }
          }
        decoded match {
          case Some(d) =>
            out ++= v.substring(i, at); out ++= d; i = end + 2
          case None =>
            out ++= v.substring(i, at + 2); i = at + 2 // literal, keep going
        }
      }
    }
    out.toString
  }

  /** Folded header block → (lowercased name, decoded value) pairs. */
  private[llm] def headers(block: String): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    block.split("\n", -1).foreach { raw =>
      val line = raw.stripSuffix("\r")
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (out.nonEmpty) {
          val (n, v) = out(out.length - 1)
          out(out.length - 1) = (n, v + " " + line.trim)
        }
      } else {
        val colon = line.indexOf(':')
        if (colon > 0)
          out += ((line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT),
            line.substring(colon + 1).trim))
      }
    }
    out.toSeq.map { case (n, v) => (n, decodeWords(v)) }
  }

  private def first(hs: Seq[(String, String)], name: String): String =
    hs.collectFirst { case (`name`, v) => v }.getOrElse("")

  private def param(headerValue: String, key: String): Option[String] =
    headerValue.split(';').iterator.map(_.trim).collectFirst {
      case p if p.toLowerCase(java.util.Locale.ROOT).startsWith(key + "=") =>
        val v = p.substring(key.length + 1).trim
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
          v.substring(1, v.length - 1)
        else v
    }

  private def decodeBody(body: String, cte: String): String =
    cte.toLowerCase(java.util.Locale.ROOT) match {
      case "base64" =>
        try new String(java.util.Base64.getMimeDecoder.decode(body), UTF_8)
        catch { case _: IllegalArgumentException => "" } // corrupt part: empty
      case "quoted-printable" => decodeQp(body)
      case _ => body
    }

  def parse(raw: String): Option[Mail] = {
    if (raw == null || raw.isEmpty) return None
    val norm = raw.replace("\r\n", "\n")
    val split = norm.indexOf("\n\n")
    val (headBlock, body) =
      if (split < 0) (norm, "") else (norm.substring(0, split), norm.substring(split + 2))
    val hs = headers(headBlock)
    if (hs.isEmpty) return None // not a message
    val ct = first(hs, "content-type")
    val isMultipart = ct.toLowerCase(java.util.Locale.ROOT).startsWith("multipart/")
    if (!isMultipart) {
      val text = decodeBody(body, first(hs, "content-transfer-encoding")).trim
      Some(Mail(first(hs, "subject"), first(hs, "from"), 1, text))
    } else {
      param(ct, "boundary") match {
        case None => Some(Mail(first(hs, "subject"), first(hs, "from"), 0, ""))
        case Some(b) =>
          val delim = "--" + b
          val parts = ArrayBuffer.empty[(Seq[(String, String)], String)]
          var segStart = -1
          var done = false
          val lines = body.split("\n", -1)
          val seg = new StringBuilder
          def closeSeg(): Unit =
            if (segStart >= 0) {
              val partRaw = seg.toString.stripSuffix("\n")
              val sp = partRaw.indexOf("\n\n")
              val (ph, pb) =
                if (sp < 0) (partRaw, "") else (partRaw.substring(0, sp), partRaw.substring(sp + 2))
              parts += ((headers(ph), pb))
              seg.clear()
            }
          lines.foreach { l =>
            if (!done) {
              // RFC 2046 §5.1.1: delimiter lines may carry trailing
              // transport padding (WSP) — strip it before comparing.
              val lt = {
                var e = l.length
                while (e > 0 && (l.charAt(e - 1) == ' ' || l.charAt(e - 1) == '\t')) e -= 1
                if (e == l.length) l else l.substring(0, e)
              }
              if (lt == delim + "--") { closeSeg(); done = true }
              else if (lt == delim) { closeSeg(); segStart = parts.length }
              else if (segStart >= 0) seg.append(l).append('\n')
              // else: preamble drops
            } // epilogue drops
          }
          if (!done) closeSeg() // missing close delimiter: lenient
          val text = parts.iterator.collectFirst {
            case (ph, pb) if first(ph, "content-type")
              .toLowerCase(java.util.Locale.ROOT).startsWith("text/plain") ||
              first(ph, "content-type").isEmpty =>
              decodeBody(pb, first(ph, "content-transfer-encoding")).trim
          }.getOrElse("")
          Some(Mail(first(hs, "subject"), first(hs, "from"), parts.length, text))
      }
    }
  }

  /** Threading headers for conversation reconstruction: (Message-ID,
    * In-Reply-To) — empty strings when absent; None when the doc has no
    * header section at all. The angle-bracket msg-id tokens compare as
    * raw strings (RFC 5322 msg-ids are case-sensitive exact tokens). */
  def refs(raw: String): Option[(String, String)] = {
    if (raw == null || raw.isEmpty) return None
    val norm = raw.replace("\r\n", "\n")
    val split = norm.indexOf("\n\n")
    val head = if (split < 0) norm else norm.substring(0, split)
    val hs = headers(head)
    if (hs.isEmpty) None
    else Some((first(hs, "message-id"), first(hs, "in-reply-to")))
  }

  /** Row-local parse over (doc_id, raw) rows; streaming-safe. */
  final case class MailRow(doc_id: Long, subject: String, from: String,
      n_parts: Int, text: String)

  def parseAll(docs: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[MailRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (id, raw) =>
      parse(raw).map(m => MailRow(id, m.subject, m.from, m.nParts, m.text))
    })
  }
}
