package graft.llm

import graft.SparkSpec

class SentencesSpec extends SparkSpec {

  test("boundaries: terminal punct + whitespace + capital/digit") {
    assert(Sentences.split("One here. Two there! Three now? Four.") ==
      Seq("One here.", "Two there!", "Three now?", "Four."))
    // lowercase continuation is not a boundary
    assert(Sentences.split("He left. and came back. Then stayed.") ==
      Seq("He left. and came back.", "Then stayed."))
    // digit can open a sentence
    assert(Sentences.split("Count ended. 42 were left.") ==
      Seq("Count ended.", "42 were left."))
    // no whitespace after punct: not a boundary (URLs, decimals)
    assert(Sentences.split("Pi is 3.14 roughly. See www.example.com now.") ==
      Seq("Pi is 3.14 roughly.", "See www.example.com now."))
  }

  test("abbreviations and initials do not bound; !? never guarded") {
    assert(Sentences.split("Dr. Smith met J. Jones. They spoke.") ==
      Seq("Dr. Smith met J. Jones.", "They spoke."))
    assert(Sentences.split("See fig. 3 for details. Next point.") ==
      Seq("See fig. 3 for details.", "Next point."))
    assert(Sentences.split("Use e.g. This style.") ==
      Seq("Use e.g. This style."))
    // '!' after a single letter still bounds
    assert(Sentences.split("Got an A! Then rested.") ==
      Seq("Got an A!", "Then rested."))
    // digit before '.' is not a guard
    assert(Sentences.split("It was lab 42. Next came lab 7.") ==
      Seq("It was lab 42.", "Next came lab 7."))
  }

  test("closers attach left; tails emit; empties drop") {
    assert(Sentences.split("He said \"Done.\" Then left.") ==
      Seq("He said \"Done.\"", "Then left."))
    assert(Sentences.split("(Right.) Next one.") ==
      Seq("(Right.)", "Next one."))
    assert(Sentences.split("Complete one. Trailing bit") ==
      Seq("Complete one.", "Trailing bit"))
    assert(Sentences.split("") == Nil)
    assert(Sentences.split(null) == Nil)
    assert(Sentences.split("   ") == Nil)
  }

  test("splitAll row shape") {
    import spark.implicits._
    val rows = Sentences.splitAll(Seq(
      1L -> "A first one. A second one.", 2L -> "").toDS())
      .collect().sortBy(r => (r.doc_id, r.idx)).toSeq
    assert(rows == Seq(
      Sentences.SentRow(1L, 0, "A first one."),
      Sentences.SentRow(1L, 1, "A second one.")))
  }
}
