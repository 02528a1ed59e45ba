package graft.llm

/** LaTeX-to-text strip — the arXiv-prep operator: scientific corpora
  * arrive as .tex, and a training pipeline wants the PROSE — not the
  * preamble, not the math, not the citation keys. Rule-explicit char
  * walk (the Sentences/CsvSniff discipline, no regex), with every
  * rule a stated decision rather than a side effect:
  *
  *   - `%` comment drops through AND INCLUDING its newline (TeX's
  *     own line-splicing rule); `\%` is a literal percent.
  *   - `$…$` / `$$…$$` math drops whole; an unterminated math run
  *     drops the rest of the document (strip is TOTAL — a truncated
  *     source still yields text, never a throw).
  *   - `\begin{env}…\end{env}` for env in [[DropEnvs]] (equation,
  *     align, figure, table, tikzpicture) drops the whole block,
  *     non-nested by contract; any other environment drops only the
  *     markers and keeps the body (document, abstract, center…).
  *   - [[KeepArg]] commands (textbf, emph, section, title, …) emit
  *     their `{…}` argument (recursively stripped); [[DropArg]]
  *     commands (cite, ref, label, documentclass, usepackage, …)
  *     drop the command WITH its optional `[…]` and `{…}` arguments.
  *   - any other `\word` drops the token alone, keeping what follows
  *     (unknown commands must not eat prose).
  *   - `\\` → newline, `~` → space, bare `{`/`}` group markers drop.
  *
  * Row-local — [[stripAll]] is a map, no shuffle. */
object Latex extends Serializable {

  val DropEnvs: Set[String] =
    Set("equation", "align", "figure", "table", "tikzpicture")

  val KeepArg: Set[String] = Set("textbf", "textit", "emph", "underline",
    "section", "subsection", "subsubsection", "title", "caption", "mbox")

  val DropArg: Set[String] = Set("cite", "citep", "citet", "ref", "eqref",
    "label", "includegraphics", "usepackage", "documentclass",
    "bibliography", "bibliographystyle", "input", "include", "vspace",
    "hspace")

  def strip(src: String): String = {
    if (src == null) return ""
    val out = new java.lang.StringBuilder(src.length)
    walk(src, 0, src.length, out)
    out.toString
  }

  /** Walk [from, until), appending stripped text. */
  private def walk(s: String, from: Int, until: Int,
      out: java.lang.StringBuilder): Unit = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c == '%') {
        while (i < until && s.charAt(i) != '\n') i += 1
        i += 1 // the newline splices away too
      } else if (c == '$') {
        val dollars = if (i + 1 < until && s.charAt(i + 1) == '$') 2 else 1
        i += dollars
        var depth = 1
        while (i < until && depth > 0) {
          if (s.charAt(i) == '$') {
            i += (if (dollars == 2 && i + 1 < until && s.charAt(i + 1) == '$') 2
              else 1)
            depth = 0
          } else i += 1
        }
        // unterminated math: i == until — the rest of the doc was math
      } else if (c == '\\') {
        if (i + 1 >= until) i = until
        else {
          val n = s.charAt(i + 1)
          if (n == '\\') { out.append('\n'); i += 2 }
          else if (n == '%') { out.append('%'); i += 2 }
          else if (!n.isLetter) { out.append(n); i += 2 } // \{ \_ \& …:
          // a control SYMBOL escapes its literal character — emit it
          else {
            var j = i + 1
            while (j < until && s.charAt(j).isLetter) j += 1
            val cmd = s.substring(i + 1, j)
            if (j < until && s.charAt(j) == '*') j += 1
            if (cmd == "begin" || cmd == "end") {
              val (env, after) = braceGroup(s, j, until)
              if (cmd == "begin" && DropEnvs.contains(env)) {
                val endTag = s"\\end{$env}"
                val stop = s.indexOf(endTag, after)
                i = if (stop < 0) until else stop + endTag.length
              } else i = after // marker (and its {env}) dropped
            } else if (DropArg.contains(cmd)) {
              val k = skipOpt(s, j, until)
              val (_, after) = braceGroup(s, k, until)
              i = after
            } else if (KeepArg.contains(cmd)) {
              val k = skipOpt(s, j, until)
              if (k < until && s.charAt(k) == '{') {
                val close = matchBrace(s, k, until)
                walk(s, k + 1, close, out) // recurse into the argument
                i = close + 1
              } else i = k
            } else i = j // unknown command: drop the token, keep prose
          }
        }
      } else if (c == '~') { out.append(' '); i += 1 }
      else if (c == '{' || c == '}') i += 1
      else { out.append(c); i += 1 }
    }
  }

  /** The `{…}` group starting at or right after `from` (skipping
    * nothing); returns (content, index-after-close). Missing group →
    * ("", from). */
  private def braceGroup(s: String, from: Int, until: Int): (String, Int) =
    if (from < until && s.charAt(from) == '{') {
      val close = matchBrace(s, from, until)
      (s.substring(from + 1, close), math.min(close + 1, until))
    } else ("", from)

  /** Index of the `}` matching the `{` at `open` (nesting-aware);
    * unterminated → until. */
  private def matchBrace(s: String, open: Int, until: Int): Int = {
    var depth = 0
    var i = open
    while (i < until) {
      val c = s.charAt(i)
      if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    until
  }

  private def skipOpt(s: String, from: Int, until: Int): Int =
    if (from < until && s.charAt(from) == '[') {
      var i = from
      while (i < until && s.charAt(i) != ']') i += 1
      math.min(i + 1, until)
    } else from

  def stripAll(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[(Long, String)] = {
    import docs.sparkSession.implicits._
    docs.map { case (id, src) => (id, strip(src)) }
  }
}
