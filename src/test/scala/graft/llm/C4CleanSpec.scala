package graft.llm

import graft.SparkSpec

class C4CleanSpec extends SparkSpec {

  test("line survival: terminal punctuation, word floor, markers") {
    assert(C4Clean.lineSurvives("This line has five proper words."))
    assert(C4Clean.lineSurvives("Is this a real question now?"))
    assert(C4Clean.lineSurvives("He said it was \"quite done.\""))
    assert(!C4Clean.lineSurvives("no terminal punctuation here at all"))
    assert(!C4Clean.lineSurvives("Too few words here."))
    assert(!C4Clean.lineSurvives("Please enable JavaScript to view this page."))
    assert(!C4Clean.lineSurvives("Read our Privacy Policy before you continue."))
    assert(!C4Clean.lineSurvives("This site uses cookies to improve everything."))
    assert(!C4Clean.lineSurvives(""))
    // quote must FOLLOW the punctuation, not replace it
    assert(!C4Clean.lineSurvives("He said it was \"quite done\""))
  }

  test("document verdict: lorem ipsum, braces, sentence floor") {
    val good = "First solid sentence right here.\n" +
      "Second solid sentence right here.\n" +
      "Third solid sentence right here."
    val g = C4Clean.clean(1L, good)
    assert(g.keep && g.n_lines_in == 3L && g.n_lines_kept == 3L &&
      g.n_sentences == 3L)
    assert(g.text == good)
    // lorem ipsum poisons the PAGE even on a surviving line
    val lorem = good + "\nThe Lorem Ipsum generator made this sentence too."
    assert(!C4Clean.clean(2L, lorem).keep)
    // a curly brace anywhere (even on a dropped line) kills the page
    val brace = good + "\nfunction f() {"
    assert(!C4Clean.clean(3L, brace).keep)
    // under 3 sentences retained → dropped
    val thin = "Only one good sentence is retained here.\njunk line"
    val t = C4Clean.clean(4L, thin)
    assert(!t.keep && t.n_sentences == 1L && t.n_lines_kept == 1L)
  }

  test("accounting: blank lines excluded, dropped docs still report") {
    val doc = "Good first sentence with enough words.\n\n  \nshort.\n" +
      "Another good sentence with enough words!"
    val c = C4Clean.clean(5L, doc)
    assert(c.n_lines_in == 3L) // blanks excluded
    assert(c.n_lines_kept == 2L) // "short." fails the 5-word floor
    assert(c.n_sentences == 2L && !c.keep)
    assert(C4Clean.clean(6L, "").text == "")
    assert(C4Clean.clean(7L, null).n_lines_in == 0L)
  }
}
