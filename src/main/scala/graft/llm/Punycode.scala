package graft.llm

/** Punycode decoder (RFC 3492) — the ASCII-compatible encoding inside
  * every internationalized domain label (`xn--…`): the URL/domain
  * tier (canonicalize, registrable domain q196, host dedup) groups on
  * hosts, and two spellings of the SAME IDN host (Unicode vs ACE)
  * must not split a group — or worse, a homoglyph spoof audit that
  * never decodes ACE labels sees nothing at all.
  *
  * Full RFC 3492 §6.2 algorithm: generalized variable-length integers
  * with the adaptive bias, basic/extended code point split at the
  * LAST delimiter, insertion-order state machine. Certified against
  * the RFC's own §7.1 published test vectors in PunycodeSpec (the
  * fixture/oracle side pins (unicode, punycode) literal PAIRS, so an
  * encoder/decoder bug pair cannot cancel — there is no encoder
  * here at all).
  *
  * STRICT bounds: non-basic chars before the delimiter, truncated or
  * overflowing variable-length integers, code points past 0x10FFFF,
  * or > 256 decoded points (a DNS label is ≤ 63 octets — anything
  * past this is an attack, not a label) quarantine (None, never
  * throw). Case-insensitive digits per the RFC; [[decodeLabel]]
  * handles one label, [[decodeHost]] maps `xn--` labels across a
  * dotted host, leaving non-ACE labels untouched. Row-local. */
object Punycode extends Serializable {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128
  private val MaxPoints = 256

  private def digit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  /** Decode the PUNYCODE PART of a label (after `xn--` is stripped). */
  def decodeLabel(input: String): Option[String] = {
    if (input == null) return None
    val lastDelim = input.lastIndexOf('-')
    val basic = if (lastDelim >= 0) input.substring(0, lastDelim) else ""
    if (basic.exists(_ >= 0x80)) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    basic.foreach(c => out += c.toInt)
    var n = InitialN
    var i = 0
    var bias = InitialBias
    var pos = if (lastDelim >= 0) lastDelim + 1 else 0
    if (pos == 0 && input.isEmpty) return Some("")
    while (pos < input.length) {
      val oldI = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length) return None // truncated integer
        val d = digit(input.charAt(pos))
        pos += 1
        if (d < 0) return None
        // overflow guards per RFC 3492 §6.4
        if (d > (Int.MaxValue - i) / w) return None
        i += d * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (d < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldI, out.size + 1, oldI == 0)
      if (i / (out.size + 1) > Int.MaxValue - n) return None
      n += i / (out.size + 1)
      i %= out.size + 1
      if (n > 0x10ffff || (n >= 0xd800 && n <= 0xdfff)) return None
      if (out.size >= MaxPoints) return None
      out.insert(i, n)
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    out.foreach(sb.appendCodePoint)
    Some(sb.toString)
  }

  /** Decode every `xn--` label of a dotted host; a single undecodable
    * ACE label quarantines the WHOLE host (half-decoded hosts would
    * group with neither spelling). Non-ACE labels pass through. */
  def decodeHost(host: String): Option[String] = {
    if (host == null || host.isEmpty) return None
    val labels = host.split('.')
    val out = new Array[String](labels.length)
    var k = 0
    while (k < labels.length) {
      val l = labels(k)
      if (l.length >= 4 && l.regionMatches(true, 0, "xn--", 0, 4)) {
        decodeLabel(l.substring(4)) match {
          case Some(u) if u.nonEmpty => out(k) = u
          case _ => return None
        }
      } else out(k) = l
      k += 1
    }
    Some(out.mkString("."))
  }
}
