package graft.llm

/** Mojibake (double-encoded UTF-8) detection and repair — the other
  * classic crawl-corpus text defect next to mixed NFC/NFD
  * ([[graft.functions.UnicodeNormKernel]]): a UTF-8 page served or
  * re-transcoded as Latin-1 turns every "é" into "Ã©", and the damage
  * survives into the corpus as perfectly valid (wrong) Unicode. The
  * repair inverts the round-trip: re-encode the chars as Latin-1 bytes
  * and strictly re-decode them as UTF-8 — exactly invertible when (and
  * only when) the string really is a Latin-1 rendering of UTF-8 bytes.
  *
  * Decision rules (each spec-tested):
  *   - pure-ASCII strings are never mojibake (fast path, no allocation)
  *   - any char > U+00FF cannot round-trip through Latin-1 → not
  *     mojibake, returned unchanged
  *   - the candidate bytes must decode as STRICT UTF-8 (malformed or
  *     truncated sequences → unchanged; the REPORT-mode decoder, not
  *     the replacing one)
  *   - a successful decode that changes nothing (pure ASCII) was
  *     already handled; a changed decode IS the repair
  *
  * Inherent ambiguity, accepted: text that legitimately LOOKS like
  * UTF-8-in-Latin-1 (a page about mojibake itself) repairs too — the
  * standard behavior of corpus fixers; the `was_mojibake` flag keeps
  * the decision auditable. ONE layer is inverted per call (double
  * mojibake is rare and a second pass composes).
  */
object Mojibake {

  /** (repaired text, was it mojibake). Null → (null, false). */
  def repair(s: String): (String, Boolean) = {
    if (s == null) return (null, false)
    var i = 0
    var ascii = true
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80) {
        ascii = false
        if (c > 0xFF) return (s, false) // cannot be a Latin-1 rendering
      }
      i += 1
    }
    if (ascii) return (s, false)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder() // strict
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      (out, true)
    } catch {
      case _: java.nio.charset.CharacterCodingException => (s, false)
    }
  }

  final case class Repaired(doc_id: Long, text: String, was_mojibake: Boolean)

  /** Row-local repair over (doc_id, text) — no shuffle. */
  def repairAll(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[Repaired] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, t) =>
        val (fixed, was) = repair(t)
        Repaired(id, fixed, was)
      }
    }
  }
}
