package graft.llm

/** RFC-3986-style URL canonicalizer for web-corpus curation — the
  * normalization pass that turns "the same page fetched through three
  * differently-mangled links" into ONE dedup key. Same contract family
  * as the codecs ([[Wav]]/[[Bmp]]/[[Avi]]): a spec-complete pure parser,
  * quarantine-not-throw (`None`) for anything malformed, deterministic
  * output byte-for-byte reproducible cross-engine.
  *
  * Normalization rules (each load-bearing for dedup recall, each
  * spec-tested in UrlSpec):
  *   - scheme and host lowercased (RFC 3986 §6.2.2.1)
  *   - default port stripped (http:80, https:443); other ports kept
  *   - path dot-segments resolved (§5.2.4: "/a/b/../c" → "/a/c",
  *     "/p/./q/" → "/p/q/"); empty path → "/"
  *   - percent-escapes of UNRESERVED chars decoded (%41 → A, %7E → ~,
  *     §6.2.2.2); all other escapes kept with UPPERCASE hex (%2f → %2F
  *     — decoding a reserved escape would change URL structure)
  *   - tracking params dropped (utm_* prefix + fbclid/gclid/msclkid),
  *     remaining query params stably sorted by key (§6.2.2 allows
  *     scheme-specific normalization; sorted-query is the standard
  *     crawl-dedup convention), fragment dropped (never sent to servers)
  *
  * Quarantined as `None` (malformed, not normalized): missing "://",
  * empty/invalid scheme or host, userinfo ("@" — a phishing vector in
  * crawl data), IPv6 literals (out of scope), non-numeric/out-of-range
  * or empty port, truncated/non-hex percent escapes, and any character
  * outside printable ASCII (0x21–0x7E) — control chars and spaces are
  * never valid in a URL on the wire.
  */
object Url {

  final case class Canonical(url: String, host: String)

  /** Per-doc canonicalization over a (doc_id, url) dataset — row-local
    * (mapPartitions, no shuffle); malformed URLs surface as valid=false
    * with empty fields, the audit-not-drop contract of [[Multimodal]]'s
    * decoders. The canonical string is THE web-dedup key: group on it
    * and raw-URL mangling (case, dot-segments, tracking params, escape
    * casing, fragments) stops splitting duplicate groups. */
  final case class UrlRow(doc_id: Long, valid: Boolean, canonical: String, host: String)

  def canonicalizeAll(urls: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[UrlRow] = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.mapPartitions { it =>
      it.map { case (id, raw) =>
        canonicalize(raw) match {
          case Some(c) => UrlRow(id, valid = true, c.url, c.host)
          case None    => UrlRow(id, valid = false, "", "")
        }
      }
    }
  }

  private val TrackingKeys = Set("fbclid", "gclid", "msclkid")

  /** Pinned public-suffix subset (the q42a fixed-parameters discipline:
    * the real PSL is a moving external resource; an engine ships a
    * pinned snapshot and swapping it in is a constants change). Multi-
    * label entries first-class — "co.uk" is a suffix, "uk" alone too. */
  private[llm] val PublicSuffixes: Set[String] = Set(
    "com", "org", "net", "edu", "gov", "io", "ai", "dev",
    "de", "fr", "uk", "au", "br", "jp", "cn", "ru",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "com.br", "co.jp", "com.cn")

  /** Registrable domain (eTLD+1) — the GROUPING key domain-level
    * operations actually want: domain mixing (q74), leakage-safe splits
    * (q122), and host-level dedup must group "www.blog.x.co.uk" and
    * "x.co.uk" together, and grouping on the raw host silently splits
    * them. The PSL algorithm over the pinned suffix set:
    *
    *   - longest (most-label) matching suffix wins ("co.uk" beats "uk")
    *   - registrable = suffix + exactly ONE preceding label
    *   - a host EQUAL to a suffix has no registrable domain → None
    *   - unlisted TLDs follow the PSL default "*" rule: the last label
    *     is the suffix (so "x.example.zzz" → "example.zzz")
    *   - IPv4 literals have no registrable domain → None
    *   - expects the lowercased host [[canonicalize]] emits; empty/null
    *     and single-label hosts → None
    *
    * Row-local, the suffix set is 26 strings in the closure. */
  def registrableDomain(host: String): Option[String] = {
    if (host == null || host.isEmpty) return None
    if (host.forall(c => (c >= '0' && c <= '9') || c == '.')) return None
    // A single trailing dot is the DNS root label ("example.com." is the
    // same FQDN as "example.com") — strip it DELIBERATELY rather than
    // ride String.split's drop-trailing-empty accident; more than one
    // trailing dot, or a leading dot, stays malformed (empty label → None).
    val fqdn = if (host.endsWith(".")) host.dropRight(1) else host
    // split drops trailing empty strings, so "a.b.." would sneak through
    // the exists(_.isEmpty) check after one strip — reject it here.
    if (fqdn.isEmpty || fqdn.endsWith(".")) return None
    val labels = fqdn.split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return None
    var best = 0
    var k = 1
    while (k <= labels.length) {
      if (PublicSuffixes.contains(labels.takeRight(k).mkString("."))) best = k
      k += 1
    }
    val suffixLabels = if (best == 0) 1 else best // PSL "*" default rule
    if (labels.length <= suffixLabels) None
    else Some(labels.takeRight(suffixLabels + 1).mkString("."))
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  def canonicalize(raw: String): Option[Canonical] = {
    if (raw == null || raw.isEmpty) return None
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c < 0x21 || c > 0x7e) return None
      i += 1
    }
    val sep = raw.indexOf("://")
    if (sep <= 0) return None
    val scheme = raw.substring(0, sep).toLowerCase
    if (!scheme.charAt(0).isLetter ||
      !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return None

    val rest = raw.substring(sep + 3)
    var authEnd = rest.length
    var j = 0
    while (j < authEnd) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') authEnd = j else j += 1
    }
    val authority = rest.substring(0, authEnd)
    if (authority.isEmpty || authority.contains('@') || authority.contains('['))
      return None
    val colon = authority.lastIndexOf(':')
    val (hostRaw, port) =
      if (colon < 0) (authority, -1)
      else {
        val p = authority.substring(colon + 1)
        if (p.isEmpty || p.length > 5 || !p.forall(_.isDigit)) return None
        val pn = p.toInt
        if (pn < 1 || pn > 65535) return None
        (authority.substring(0, colon), pn)
      }
    val host = hostRaw.toLowerCase
    if (host.isEmpty || !host.forall(c =>
      (c >= 'a' && c <= 'z') || c.isDigit || c == '.' || c == '-' || c == '_'))
      return None

    val tail = {
      val t = rest.substring(authEnd)
      val hash = t.indexOf('#')
      if (hash < 0) t else t.substring(0, hash) // fragment dropped
    }
    val qMark = tail.indexOf('?')
    val rawPath = if (qMark < 0) tail else tail.substring(0, qMark)
    val rawQuery = if (qMark < 0) "" else tail.substring(qMark + 1)

    val path = percentNormalize(if (rawPath.isEmpty) "/" else rawPath) match {
      case Some(p) => removeDotSegments(p)
      case None    => return None
    }
    val query = percentNormalize(rawQuery) match {
      case Some(q) =>
        val params = q.split("&").toSeq.filter(_.nonEmpty).filterNot { p =>
          val key = p.takeWhile(_ != '=').toLowerCase
          key.startsWith("utm_") || TrackingKeys.contains(key)
        }
        // stable sort: duplicate keys keep their relative order
        params.sortBy(_.takeWhile(_ != '=')).mkString("&")
      case None => return None
    }

    val defaultPort = (scheme == "http" && port == 80) ||
      (scheme == "https" && port == 443)
    val portPart = if (port > 0 && !defaultPort) s":$port" else ""
    val queryPart = if (query.isEmpty) "" else s"?$query"
    Some(Canonical(s"$scheme://$host$portPart$path$queryPart", host))
  }

  /** Decode unreserved percent-escapes, uppercase the hex of the rest;
    * None on a truncated or non-hex escape. */
  private def percentNormalize(s: String): Option[String] = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return None
        val h1 = Character.digit(s.charAt(i + 1), 16)
        val h2 = Character.digit(s.charAt(i + 2), 16)
        if (h1 < 0 || h2 < 0) return None
        val v = (h1 << 4 | h2).toChar
        if (isUnreserved(v)) out.append(v)
        else out.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else {
        out.append(c)
        i += 1
      }
    }
    Some(out.toString)
  }

  /** RFC 3986 §5.2.4 over an absolute path ("/…"); preserves a trailing
    * slash ("/p/./q/" → "/p/q/") and mid-path empty segments ("//"). */
  private def removeDotSegments(path: String): String = {
    val segs = path.substring(1).split("/", -1)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var trailingSlash = false
    var i = 0
    while (i < segs.length) {
      val last = i == segs.length - 1
      segs(i) match {
        case "."  => if (last) trailingSlash = true
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
                     if (last) trailingSlash = true
        case ""   => if (last) trailingSlash = true else out += ""
        case s    => out += s; trailingSlash = false
      }
      i += 1
    }
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }
}
