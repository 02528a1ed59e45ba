package graft.llm

import org.apache.spark.sql.Dataset

/** The Gopher/MassiveText document-quality rule panel (Rae et al. 2021,
  * §A1.1 — the published filter suite most large-corpus pipelines start
  * from; q71's duplicate-ngram fraction is one member, this is the rest
  * of the panel). Every rule is kept ALL-INTEGER: ratio thresholds are
  * CROSS-MULTIPLIED comparisons (`10*symbols <= words`, never a float
  * division), so verdicts are bit-deterministic and a SQL oracle
  * re-derives both the counts and the decisions arithmetically.
  *
  * Definitions (each spec-tested in GopherSpec):
  *   - words: whitespace-split tokens of the trimmed text
  *   - lines: '\n'-split, '\r'-stripped, blank-after-trim lines excluded
  *   - symbol count: '#' occurrences + non-overlapping "..." occurrences
  *     (the two Gopher symbol classes)
  *   - bullet line: trimmed line starting "- ", "* ", or "• " (with the
  *     marker alone also counting)
  *   - ellipsis line: trimmed line ending "..." or "…"
  *   - alpha word: token containing at least one ASCII letter
  *   - stopword presence: distinct members of the Gopher 8-word set
  *     {the, be, to, of, and, that, have, with} appearing as lowercased
  *     tokens
  *
  * Rules (pass conditions; empty-side conventions spec-pinned):
  *   - word_count   50 <= words <= 100000
  *   - mean_len     3 <= sum_word_len/words <= 10, i.e.
  *                  3*words <= sum_word_len <= 10*words (words=0 fails)
  *   - symbol       10*symbols <= words
  *   - bullet       10*bullet_lines <= 9*lines (vacuous pass at 0 lines)
  *   - ellipsis     10*ellipsis_lines <= 3*lines (vacuous pass)
  *   - alpha        5*alpha_words >= 4*words (words=0 fails)
  *   - stopword     >= 2 distinct stopwords present
  *
  * Scale shape: row-local single pass per document, no shuffle; the
  * stopword set is 8 literals in the closure. The panel is a Dataset
  * transformation, so it runs unchanged under Structured Streaming
  * (StreamingDocFormatsSpec parity).
  */
object Gopher {

  private val Stopwords =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  final case class Report(
      doc_id: Long,
      n_words: Long, sum_word_len: Long, n_lines: Long,
      n_bullet_lines: Long, n_ellipsis_lines: Long, n_symbols: Long,
      n_alpha_words: Long, n_stopwords: Long,
      pass_word_count: Boolean, pass_mean_len: Boolean,
      pass_symbol: Boolean, pass_bullet: Boolean, pass_ellipsis: Boolean,
      pass_alpha: Boolean, pass_stopword: Boolean, pass: Boolean)

  def report(docId: Long, text: String): Report = {
    val t = if (text == null) "" else text
    val words: Array[String] =
      if (t.trim.isEmpty) Array.empty else t.trim.split("\\s+")
    val nWords = words.length.toLong
    var sumLen = 0L
    var nAlpha = 0L
    val stops = scala.collection.mutable.HashSet.empty[String]
    words.foreach { w =>
      sumLen += w.length
      var hasAlpha = false
      var i = 0
      while (i < w.length && !hasAlpha) {
        val c = w.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
        i += 1
      }
      if (hasAlpha) nAlpha += 1
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      if (Stopwords.contains(lw)) stops += lw: Unit
    }
    val lines = t.split("\n", -1).iterator
      .map(_.stripSuffix("\r").trim).filter(_.nonEmpty).toArray
    val nLines = lines.length.toLong
    val nBullet = lines.count(l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ") ||
        l == "-" || l == "*" || l == "•").toLong
    val nEllipsis = lines.count(l =>
      l.endsWith("...") || l.endsWith("…")).toLong
    var nSymbols = 0L
    var i = 0
    while (i < t.length) {
      if (t.charAt(i) == '#') { nSymbols += 1; i += 1 }
      else if (t.startsWith("...", i)) { nSymbols += 1; i += 3 }
      else i += 1
    }
    val nStops = stops.size.toLong
    val pWord = nWords >= 50 && nWords <= 100000
    val pMean = nWords > 0 && 3 * nWords <= sumLen && sumLen <= 10 * nWords
    val pSym = 10 * nSymbols <= nWords
    val pBullet = 10 * nBullet <= 9 * nLines
    val pEll = 10 * nEllipsis <= 3 * nLines
    val pAlpha = nWords > 0 && 5 * nAlpha >= 4 * nWords
    val pStop = nStops >= 2
    Report(docId, nWords, sumLen, nLines, nBullet, nEllipsis, nSymbols,
      nAlpha, nStops, pWord, pMean, pSym, pBullet, pEll, pAlpha, pStop,
      pWord && pMean && pSym && pBullet && pEll && pAlpha && pStop)
  }

  /** Row-local panel over (doc_id, text) rows; streaming-safe. */
  def reportAll(docs: Dataset[(Long, String)]): Dataset[Report] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (id, text) => report(id, text) })
  }
}
