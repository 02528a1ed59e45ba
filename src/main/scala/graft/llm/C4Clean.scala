package graft.llm

import org.apache.spark.sql.Dataset

/** The C4 cleaning pass (Raffel et al. 2020, §2.2 — the other published
  * filter suite next to [[Gopher]]'s: where Gopher VERDICTS documents,
  * C4 REWRITES them line-by-line and then verdicts what's left). The
  * published rules, kept deterministic and integer-decided:
  *
  * Line-level (a line survives iff ALL hold; lines are '\n'-split,
  * '\r'-stripped, trimmed):
  *   - ends in terminal punctuation: '.', '!', '?', or a closing '"' /
  *     '”' immediately after one
  *   - has at least 5 whitespace-separated words
  *   - does not contain the word "javascript" (case-insensitive — the
  *     please-enable-JS boilerplate marker)
  *   - is not a policy line: contains none of "terms of use",
  *     "privacy policy", "cookie policy", "uses cookies"
  *     (case-insensitive)
  *
  * Document-level (the cleaned doc is KEPT iff all hold, evaluated on
  * the ORIGINAL text for the page-poison markers and on the retained
  * lines for the sentence floor):
  *   - does not contain "lorem ipsum" (case-insensitive)
  *   - does not contain '{' (curly brace — source code page marker)
  *   - at least 3 sentences retained, where the sentence count is the
  *     number of '.'/'!'/'?' occurrences in the retained text
  *
  * Output carries the retained text ('\n'-joined), the line accounting,
  * the sentence count, and the keep verdict — dropped docs still emit
  * their row (keep=false, text as cleaned) so the filter is auditable;
  * a `.filter(_.keep)` is the production tail.
  *
  * Scale shape: row-local single pass, no shuffle; streaming-safe
  * (StreamingDocFormatsSpec parity).
  */
object C4Clean {

  private val PolicyMarkers =
    Seq("terms of use", "privacy policy", "cookie policy", "uses cookies")

  final case class Cleaned(doc_id: Long, text: String, n_lines_in: Long,
      n_lines_kept: Long, n_sentences: Long, keep: Boolean)

  private def lowerContains(haystackLower: String, needle: String): Boolean =
    haystackLower.contains(needle)

  private[llm] def lineSurvives(trimmed: String): Boolean = {
    if (trimmed.isEmpty) return false
    val endOk = {
      val last = trimmed.charAt(trimmed.length - 1)
      if (last == '.' || last == '!' || last == '?') true
      else if ((last == '"' || last == '”') && trimmed.length >= 2) {
        val prev = trimmed.charAt(trimmed.length - 2)
        prev == '.' || prev == '!' || prev == '?'
      } else false
    }
    if (!endOk) return false
    if (trimmed.split("\\s+").length < 5) return false
    val lower = trimmed.toLowerCase(java.util.Locale.ROOT)
    if (lowerContains(lower, "javascript")) return false
    !PolicyMarkers.exists(lowerContains(lower, _))
  }

  def clean(docId: Long, text: String): Cleaned = {
    val t = if (text == null) "" else text
    val rawLines = t.split("\n", -1).iterator
      .map(_.stripSuffix("\r").trim).filter(_.nonEmpty).toArray
    val kept = rawLines.filter(lineSurvives)
    val cleaned = kept.mkString("\n")
    var nSent = 0L
    var i = 0
    while (i < cleaned.length) {
      val c = cleaned.charAt(i)
      if (c == '.' || c == '!' || c == '?') nSent += 1
      i += 1
    }
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    val keep = !lowerContains(lower, "lorem ipsum") &&
      t.indexOf('{') < 0 && nSent >= 3
    Cleaned(docId, cleaned, rawLines.length.toLong, kept.length.toLong,
      nSent, keep)
  }

  /** Row-local cleaning over (doc_id, text) rows; streaming-safe. */
  def cleanAll(docs: Dataset[(Long, String)]): Dataset[Cleaned] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (id, text) => clean(id, text) })
  }
}
