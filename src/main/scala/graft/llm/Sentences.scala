package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

/** Deterministic sentence segmentation — the text-prep primitive under
  * chunking (q70), C4's sentence accounting (q175), and any
  * sentence-level dedup/quality pass: regex-free, rule-explicit, and
  * byte-deterministic so segmentation decisions hash-check cross-engine.
  * The boundary rule (each clause spec-tested):
  *
  *   - a candidate is '.', '!', or '?', optionally followed by closing
  *     quotes/brackets (`"`, `'`, `)`, `]` — the closers attach to the
  *     LEFT sentence)
  *   - it BOUNDS iff followed by at least one whitespace char and then
  *     an uppercase letter or digit (lowercase continuation is prose,
  *     not a new sentence)
  *   - a '.' whose preceding letter-run is a known abbreviation (mr,
  *     mrs, ms, dr, prof, st, vs, etc, fig, no, jr, sr) or a SINGLE
  *     letter (initials "J. Smith", latinisms "e.g.") does not bound;
  *     '!' and '?' are never abbreviation-guarded; a digit before '.'
  *     is not a guard ("lab 42. Next" bounds; "3.14" never reaches the
  *     whitespace test). KNOWN MISS of the initials rule: a sentence
  *     genuinely ending in a single letter + '.' ("...so did I. Then")
  *     never bounds — the deliberate, rule-explicit tradeoff: initials
  *     are far more common in crawl text than one-letter sentence ends
  *   - the final tail emits even unterminated (crawl text rarely ends
  *     clean); sentences are trimmed, empties dropped
  *
  * Row-local single pass, no shuffle; streaming-safe.
  */
object Sentences {

  private val Abbrev = Set("mr", "mrs", "ms", "dr", "prof", "st", "vs",
    "etc", "fig", "no", "jr", "sr")

  def split(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var j = i + 1
        while (j < n && (text.charAt(j) == '"' || text.charAt(j) == '\'' ||
          text.charAt(j) == ')' || text.charAt(j) == ']')) j += 1
        var k = j
        while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
        val followed = k > j && k < n &&
          (Character.isUpperCase(text.charAt(k)) || Character.isDigit(text.charAt(k)))
        val guarded = c == '.' && {
          var ws = i
          while (ws > start && Character.isLetter(text.charAt(ws - 1))) ws -= 1
          val w = text.substring(ws, i)
          w.length == 1 ||
            Abbrev.contains(w.toLowerCase(java.util.Locale.ROOT))
        }
        if (followed && !guarded) {
          val s = text.substring(start, j).trim
          if (s.nonEmpty) out += s: Unit
          start = k
          i = k
        } else i += 1
      } else i += 1
    }
    if (start < n) {
      val s = text.substring(start, n).trim
      if (s.nonEmpty) out += s: Unit
    }
    out.toSeq
  }

  /** Row-local segmentation rows; streaming-safe. */
  final case class SentRow(doc_id: Long, idx: Int, sentence: String)

  def splitAll(docs: Dataset[(Long, String)]): Dataset[SentRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (id, text) =>
      split(text).zipWithIndex.map { case (s, k) => SentRow(id, k, s) }
    })
  }
}
