package graft.llm

import org.apache.spark.sql.Dataset

/** Character-trigram language identification — the production-shaped
  * upgrade of the q29 marker-word contract: a multilingual crawl wants a
  * classifier that works on running text, not a keyword list, and the
  * standard cheap-and-strong baseline is trigram-profile scoring
  * (Cavnar–Trenkle n-gram categorization). Deliberately ALL-INTEGER and
  * deterministic so results hash-check cross-engine:
  *
  *   - normalization: lowercase (Locale.ROOT), every non-[a-z] char →
  *     space, space runs collapsed, ends trimmed — the same derivation a
  *     SQL oracle spells with lower/regexp_replace/trim, so both engines
  *     score the IDENTICAL string
  *   - scoring: for each language, Σ weight(trigram) × occurrences of
  *     that trigram in the normalized text, counting OVERLAPPING
  *     positions (profile trigrams must not be self-overlapping — no
  *     "aaa"/"aba" shapes — which makes position counts equal the
  *     replace-arithmetic counts an oracle can compute)
  *   - decision: argmax score; ties break to the LEXICOGRAPHICALLY
  *     smallest language code; all-zero scores → "und" (unknown), the
  *     honest answer for text the profiles don't cover
  *
  * Scale design: profiles are a few hundred (lang, trigram, weight)
  * rows — they ride the task closure (broadcast-sized by construction);
  * classification is row-local (one pass over each doc's chars, no
  * shuffle, no explode of per-trigram rows — exploding would shuffle
  * O(total chars) rows at 100 TB for what a map can do in place).
  */
object LangId {

  final case class Scored(doc_id: Long, lang: String, score: Long)

  /** The SQL-mirrorable normalization (see module doc). */
  def normalize(s: String): String = {
    if (s == null || s.isEmpty) return ""
    val sb = new StringBuilder(s.length)
    var lastSpace = true // leading spaces drop
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc >= 'a' && lc <= 'z') { sb.append(lc); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    while (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ')
      sb.deleteCharAt(sb.length - 1): Unit
    sb.toString
  }

  /** Overlapping-position occurrence count of `pat` in `s`. */
  private[llm] def occurrences(s: String, pat: String): Long = {
    var n = 0L
    var at = s.indexOf(pat)
    while (at >= 0) { n += 1; at = s.indexOf(pat, at + 1) }
    n
  }

  /** Score one normalized text against every profile; argmax with
    * lexicographic tie-break; all-zero → ("und", 0). Sorts the profile
    * list per call — fine for one-off use; the scan path
    * ([[classifyAll]]) hoists the sort out of the per-row loop. */
  def classify(norm: String,
      profiles: Seq[(String, Seq[(String, Int)])]): (String, Long) = {
    classifySorted(norm, profiles.sortBy(_._1))
  }

  /** [[classify]] over profiles ALREADY sorted by language name — the
    * per-row path, so the 100 TB scan does no per-row allocation/sort. */
  private def classifySorted(norm: String,
      sorted: Seq[(String, Seq[(String, Int)])]): (String, Long) = {
    var bestLang = "und"
    var bestScore = 0L
    sorted.foreach { case (lang, grams) =>
      var s = 0L
      grams.foreach { case (g, w) => s += w * occurrences(norm, g) }
      if (s > bestScore) { bestLang = lang; bestScore = s }
    }
    (bestLang, bestScore)
  }

  /** Row-local classification over (doc_id, text) rows. The profile
    * sort happens ONCE here (driver-side, rides the closure), not per
    * row. */
  def classifyAll(docs: Dataset[(Long, String)],
      profiles: Seq[(String, Seq[(String, Int)])]): Dataset[Scored] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = profiles.sortBy(_._1)
    docs.mapPartitions { it =>
      it.map { case (id, text) =>
        val (lang, score) = classifySorted(normalize(text), sorted)
        Scored(id, lang, score)
      }
    }
  }
}
