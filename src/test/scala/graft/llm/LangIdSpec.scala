package graft.llm

import graft.SparkSpec

class LangIdSpec extends SparkSpec {

  private val profiles = Seq(
    "en" -> Seq("the" -> 5, "he " -> 3, "ick" -> 2),
    "de" -> Seq("der" -> 5, "sch" -> 4, "und" -> 3),
    "fr" -> Seq("le " -> 4, "eux" -> 4, "ard" -> 2))

  test("normalize: lowercase, non-letters to single spaces, trimmed") {
    assert(LangId.normalize("The Quick-Brown FOX 123!") == "the quick brown fox")
    assert(LangId.normalize("  a   b  ") == "a b")
    assert(LangId.normalize("42 7") == "")
    assert(LangId.normalize("") == "")
    assert(LangId.normalize(null) == "")
    // digits appended to a template vanish: both engines score the same string
    assert(LangId.normalize("der hund 4711") == LangId.normalize("der hund"))
  }

  test("occurrences count overlapping positions") {
    assert(LangId.occurrences("the theme thesis", "the") == 3L)
    assert(LangId.occurrences("xx", "the") == 0L)
    assert(LangId.occurrences("ththth", "tht") == 2L) // overlap at 0 and 2
  }

  test("classify: weighted scores, argmax, lexicographic tie-break, und") {
    // "the quick" → en: 5*1(the) + 3*1(he ) + 2*1(ick) = 10
    assert(LangId.classify(LangId.normalize("The quick!"), profiles) ==
      ("en", 10L))
    // "der schnelle hund" → de: 5 + 4 + 3 = 12
    assert(LangId.classify("der schnelle hund", profiles) == ("de", 12L))
    // constructed tie: "the " (en: 5+3=8) vs "der schnelle" (de: 5+4=9)… use
    // exact tie: en "the x" = 5+3 = 8; de "der undx"… 5+3=8 → tie → "de" wins
    assert(LangId.classify("the x der undx", profiles)._1 == "de")
    // nothing matches → und with score 0
    assert(LangId.classify("zzz", profiles) == ("und", 0L))
    assert(LangId.classify("", profiles) == ("und", 0L))
  }

  test("classifyAll row shape") {
    import spark.implicits._
    val out = LangId.classifyAll(
      Seq((1L, "The quick."), (2L, "Der Schnelle Hund!"), (3L, "999")).toDS(),
      profiles).collect().sortBy(_.doc_id)
    assert(out.toSeq == Seq(
      LangId.Scored(1L, "en", 10L),
      LangId.Scored(2L, "de", 12L),
      LangId.Scored(3L, "und", 0L)))
  }
}
