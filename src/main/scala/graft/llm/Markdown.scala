package graft.llm

/** Markdown-to-prose extraction — the README/docs tier of a code-adjacent
  * corpus: Markdown is the dominant documentation format in source
  * repositories, and its prose needs the same markup-stripping treatment
  * [[Html.extract]] gives web pages before quality scoring / dedup /
  * tokenization can run. CommonMark-lite, line-based, and DETERMINISTIC
  * (each rule spec-tested in MarkdownSpec):
  *
  *   - fenced code blocks (``` or ~~~, up to 3 leading spaces) are
  *     DROPPED with their content — they're code, not prose — and
  *     counted (`n_code_blocks`); an unterminated fence drops the rest
  *   - ATX headers: leading `#{1,6} ` stripped (and the optional
  *     trailing ` #…` run), text kept, counted (`n_headers`)
  *   - thematic breaks (≥3 dashes, underscores, or asterisks alone on
  *     a line) dropped
  *   - blockquote `>` prefixes stripped (nested too)
  *   - list markers stripped: `- ` / `* ` / `+ ` and ordered `N. `/`N) `
  *   - images `![alt](url)` removed whole (alt is labeling, not prose);
  *     links `[text](url)` keep text, counted (`n_links`); images
  *     processed first so `![` never half-matches as a link
  *   - code spans `` `x` `` keep content and take PRECEDENCE over link
  *     and emphasis syntax (CommonMark): their contents are masked
  *     before the other inline passes run, so a link-shaped literal in
  *     backticks stays verbatim and is not counted; emphasis pairs
  *     `**x**`, `__x__`, `*x*`, `_x_` keep content (outer-first so
  *     nesting unwraps); UNMATCHED markers pass through literally
  *   - lines trimmed, empties dropped, output joined with '\n'
  */
object Markdown {

  final case class Extracted(text: String, nCodeBlocks: Int, nLinks: Int,
      nHeaders: Int)

  private val Image = """!\[([^\]]*)\]\(([^)]*)\)""".r
  private val Link = """\[([^\]]*)\]\(([^)]*)\)""".r
  private val CodeSpan = "`([^`]+)`".r
  // the CommonMark flanking rule, simplified: markers only pair when
  // hugging non-whitespace ("*em*" yes, "a * b * c" no)
  private val Strong = """\*\*(?=\S)([^*]+)(?<=\S)\*\*""".r
  private val StrongU = """__(?=\S)([^_]+)(?<=\S)__""".r
  private val Em = """\*(?=\S)([^*]+)(?<=\S)\*""".r
  private val EmU = """_(?=\S)([^_]+)(?<=\S)_""".r

  def extract(md: String): Extracted = {
    if (md == null || md.isEmpty) return Extracted("", 0, 0, 0)
    val out = new StringBuilder
    var nCode = 0
    var nLinks = 0
    var nHeaders = 0
    var inFence = false
    var fenceChar = ' '
    md.split("\n", -1).foreach { raw =>
      val line = raw.stripSuffix("\r")
      val lead = line.takeWhile(_ == ' ').length
      val body0 = line.drop(lead)
      val isFence = lead <= 3 &&
        (body0.startsWith("```") || body0.startsWith("~~~"))
      if (isFence && !inFence) {
        inFence = true; fenceChar = body0.charAt(0); nCode += 1
      } else if (isFence && inFence && body0.charAt(0) == fenceChar) {
        inFence = false
      } else if (!inFence) {
        // blockquote prefixes (nested)
        var s = line.trim
        while (s.startsWith(">")) s = s.stripPrefix(">").trim
        // thematic break
        val breakChars = s.replace(" ", "")
        val isBreak = breakChars.length >= 3 &&
          (breakChars.forall(_ == '-') || breakChars.forall(_ == '_') ||
            breakChars.forall(_ == '*'))
        if (!isBreak) {
          // ATX header
          val hashes = s.takeWhile(_ == '#').length
          if (hashes >= 1 && hashes <= 6 && s.length > hashes &&
            s.charAt(hashes) == ' ') {
            nHeaders += 1
            s = s.drop(hashes + 1).trim
            // optional closing hash run
            val closing = s.reverse.takeWhile(_ == '#').length
            if (closing > 0 && s.length > closing &&
              s.charAt(s.length - closing - 1) == ' ')
              s = s.dropRight(closing).trim
          } else {
            // list markers
            if (s.length >= 2 && "-*+".contains(s.charAt(0)) && s.charAt(1) == ' ')
              s = s.drop(2).trim
            else {
              val digits = s.takeWhile(_.isDigit).length
              if (digits >= 1 && digits <= 9 && s.length > digits &&
                (s.charAt(digits) == '.' || s.charAt(digits) == ')') &&
                s.length > digits + 1 && s.charAt(digits + 1) == ' ')
                s = s.drop(digits + 2).trim
            }
          }
          // inline transforms. CommonMark gives code spans precedence over
          // link and emphasis syntax, so their contents are MASKED first
          // (a link-shaped literal in backticks must stay verbatim — and
          // must not be unwrapped early either, or the Link pass would
          // then match the exposed brackets) and substituted back last
          val spans = scala.collection.mutable.ArrayBuffer.empty[String]
          // Literal NULs are stripped first so adversarial input cannot
          // forge a placeholder-shaped token (CommonMark mandates
          // replacing U+0000 anyway; stripping keeps text-only output).
          if (s.indexOf('\u0000') >= 0) s = s.replace("\u0000", "")
          s = CodeSpan.replaceAllIn(s, m => {
            spans += m.group(1)
            "\u0000" + (spans.length - 1) + "\u0000"
          })
          s = Image.replaceAllIn(s, "")
          s = Link.replaceAllIn(s, m => {
            nLinks += 1
            scala.util.matching.Regex.quoteReplacement(m.group(1))
          })
          s = Strong.replaceAllIn(s,
            m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
          s = StrongU.replaceAllIn(s,
            m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
          s = Em.replaceAllIn(s,
            m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
          s = EmU.replaceAllIn(s,
            m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
          // Restore in ONE left-to-right scan: a span whose content is
          // itself placeholder-shaped must not be re-expanded by a later
          // pass (sequential global replace would corrupt it).
          if (spans.nonEmpty) {
            val sb = new StringBuilder(s.length)
            var i = 0
            while (i < s.length) {
              if (s.charAt(i) == '\u0000') {
                val close = s.indexOf('\u0000', i + 1)
                val idx = if (close > i + 1)
                  try Integer.parseInt(s.substring(i + 1, close)) catch { case _: NumberFormatException => -1 }
                else -1
                if (idx >= 0 && idx < spans.length) { sb ++= spans(idx); i = close + 1 }
                else { i += 1 } // malformed marker: drop the NUL, keep scanning
              } else { sb += s.charAt(i); i += 1 }
            }
            s = sb.toString
          }
          s = s.trim
          if (s.nonEmpty) {
            if (out.nonEmpty) out.append('\n')
            out ++= s
          }
        }
      }
    }
    Extracted(out.toString, nCode, nLinks, nHeaders)
  }

  /** Per-doc extraction rows — row-local, no shuffle; streaming-safe. */
  final case class MdRow(doc_id: Long, text: String, n_code_blocks: Int,
      n_links: Int, n_headers: Int)

  def extractAll(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[MdRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, md) =>
        val e = extract(md)
        MdRow(id, e.text, e.nCodeBlocks, e.nLinks, e.nHeaders)
      }
    }
  }
}
