package graft.llm

import org.apache.spark.sql.Dataset

/** CSV dialect sniffing — the loader front-end [[CharsetSniff]]'s
  * byte-level step feeds: crawled "CSV" arrives with unknown delimiter,
  * quoting, and header row, and `spark.read.csv` needs all three before
  * it can parse a byte. Deterministic rules (each spec-tested):
  *
  *   - candidate delimiters `, ; \t |`, fields counted per line by a
  *     REAL quote-aware split (RFC 4180 double-quotes, `""` escaping
  *     inside a quoted field — an embedded comma inside quotes must not
  *     vote for comma)
  *   - only the first 10 non-empty lines vote (scale guard: dialect is
  *     a property of the head, not the gigabyte)
  *   - a candidate QUALIFIES iff every voting line has the SAME field
  *     count ≥ 2; the winner is the qualifying candidate with the MOST
  *     columns, ties broken by the preference order `, ; \t |`
  *   - no qualifier → not a CSV: (delim "", 1 column, no header)
  *   - header detection on the winner: the first line's fields must ALL
  *     fail numeric parse while a second line exists and carries at
  *     least one numeric field (a file of all-text rows keeps
  *     header=false — indistinguishable from data, the honest answer)
  *
  * Row-local, no shuffle; streaming-safe.
  */
object CsvSniff {

  private val Candidates = Seq(',', ';', '\t', '|')

  final case class Dialect(delim: String, nCols: Int, header: Boolean)

  /** Quote-aware field split for one line. */
  private[llm] def fields(line: String, d: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            cur += '"'; i += 1
          } else inQ = false
        } else cur += c
      } else {
        if (c == '"' && cur.isEmpty) inQ = true
        else if (c == d) { out += cur.toString; cur.clear() }
        else cur += c
      }
      i += 1
    }
    out += cur.toString
    out.toSeq
  }

  private[llm] def isNumeric(s: String): Boolean = {
    val t = s.trim
    if (t.isEmpty) return false
    var i = if (t.charAt(0) == '+' || t.charAt(0) == '-') 1 else 0
    if (i >= t.length) return false
    var digits = 0
    var dots = 0
    var ok = true
    while (i < t.length && ok) {
      val c = t.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      else if (c == '.') dots += 1
      else ok = false
      i += 1
    }
    ok && digits > 0 && dots <= 1
  }

  def sniff(text: String): Dialect = {
    if (text == null || text.isEmpty) return Dialect("", 1, header = false)
    val lines = text.split("\n", -1).iterator
      .map(_.stripSuffix("\r")).filter(_.nonEmpty).take(10).toArray
    if (lines.isEmpty) return Dialect("", 1, header = false)
    val qualifying = Candidates.flatMap { d =>
      val counts = lines.map(l => fields(l, d).length)
      if (counts.head >= 2 && counts.forall(_ == counts.head))
        Some((d, counts.head))
      else None
    }
    if (qualifying.isEmpty) return Dialect("", 1, header = false)
    // most columns wins; stable order breaks ties by candidate preference
    val (delim, nCols) = qualifying.maxBy(_._2)
    val header = lines.length >= 2 && {
      val first = fields(lines(0), delim)
      val second = fields(lines(1), delim)
      first.forall(!isNumeric(_)) && second.exists(isNumeric)
    }
    Dialect(delim.toString, nCols, header)
  }

  /** Row-local sniff rows; streaming-safe. */
  final case class DialectRow(doc_id: Long, delim: String, n_cols: Int,
      header: Boolean)

  def sniffAll(docs: Dataset[(Long, String)]): Dataset[DialectRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (id, text) =>
      val d = sniff(text)
      DialectRow(id, d.delim, d.nCols, d.header)
    })
  }
}
