package graft.llm

import graft.SparkSpec

class GopherSpec extends SparkSpec {

  private def r(text: String) = Gopher.report(1L, text)

  test("word, length, and alpha accounting") {
    val clean = Array.fill(25)("the solid value of").mkString(" ") // 100 words
    val rep = r(clean)
    assert(rep.n_words == 100L)
    assert(rep.sum_word_len == 25L * 15) // the(3)+solid(5)+value(5)+of(2)
    assert(rep.n_alpha_words == 100L)
    assert(rep.n_stopwords == 2L) // the, of (distinct presence, not counts)
    assert(rep.pass_word_count && rep.pass_mean_len && rep.pass_alpha)
  }

  test("rule boundaries are cross-multiplied, not floated") {
    // mean word length exactly 3 passes (3*n == sum)
    val threes = Array.fill(50)("abc").mkString(" ")
    assert(r(threes).pass_mean_len)
    // exactly at the symbol ratio boundary: 5 symbols, 50 words → 50 >= 50
    val sym = Array.fill(50)("word").mkString(" ") + " #####"
    // (the ##### token adds a 51st word carrying 5 '#')
    val repSym = r(sym)
    assert(repSym.n_symbols == 5L && repSym.n_words == 51L)
    assert(repSym.pass_symbol) // 50 <= 51
  }

  test("line rules: bullets, ellipses, blank lines excluded") {
    val doc = "- one\n- two\n* three\n• four\nplain line\n\n   \nends well..."
    val rep = r(doc)
    assert(rep.n_lines == 6L) // blanks excluded
    assert(rep.n_bullet_lines == 4L)
    assert(rep.n_ellipsis_lines == 1L)
    assert(rep.pass_bullet)   // 40 <= 54
    assert(rep.pass_ellipsis) // 10 <= 18
  }

  test("failing classes fail the composite") {
    // too few words
    assert(!r("the of and tiny").pass_word_count)
    assert(!r("the of and tiny").pass)
    // 90%+ bullet lines
    val bullets = (1 to 19).map(i => s"- item $i").mkString("\n") + "\nthe of end"
    val rb = r(bullets)
    assert(rb.n_bullet_lines == 19L && rb.n_lines == 20L)
    assert(!rb.pass_bullet) // 190 > 180
    // ellipsis-heavy
    val ell = (1 to 4).map(i => s"line $i...").mkString("\n") + "\nthe of end"
    val re = r(ell)
    assert(re.n_ellipsis_lines == 4L && re.n_lines == 5L)
    assert(!re.pass_ellipsis) // 40 > 15
    // numeric words: alpha + stopword fail
    val nums = Array.fill(60)("1234").mkString(" ")
    val rn = r(nums)
    assert(rn.n_alpha_words == 0L && !rn.pass_alpha && !rn.pass_stopword)
    // empty text: word-dependent rules fail, line rules vacuous
    val r0 = r("")
    assert(r0.n_words == 0L && !r0.pass_word_count && !r0.pass_mean_len &&
      !r0.pass_alpha && r0.pass_bullet && r0.pass_ellipsis && r0.pass_symbol)
    assert(r(null).n_words == 0L)
  }

  test("ellipsis symbol counting is non-overlapping; unicode ellipsis lines") {
    assert(r("a .... b").n_symbols == 1L)   // one "...", the 4th dot rides
    assert(r("a ...... b").n_symbols == 2L)
    assert(r("x#y#z").n_symbols == 2L)
    assert(r("ends…").n_ellipsis_lines == 1L)
  }
}
