package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class MojibakeSpec extends AnyFunSuite {

  private def mangle(clean: String): String =
    new String(clean.getBytes("UTF-8"), "ISO-8859-1")

  test("round-trip: UTF-8-read-as-Latin-1 text repairs back to the original") {
    for (clean <- Seq("Résumé café", "Ångström",
      "aß bü", "é")) {
      val (fixed, was) = Mojibake.repair(mangle(clean))
      assert(was && fixed == clean, clean)
    }
  }

  test("pure ASCII is never mojibake") {
    assert(Mojibake.repair("plain ascii 123") == ("plain ascii 123", false))
    assert(Mojibake.repair("") == ("", false))
    assert(Mojibake.repair(null) == ((null, false)))
  }

  test("legit accented Latin-1-range text does not repair (invalid UTF-8 bytes)") {
    // "é" alone is 0xE9 as Latin-1 bytes — not a valid UTF-8 sequence
    assert(Mojibake.repair("café") == ("café", false))
    assert(Mojibake.repair("Résumé") == ("Résumé", false))
  }

  test("chars beyond U+00FF cannot round-trip: unchanged") {
    assert(Mojibake.repair("Āx") == ("Āx", false))
    assert(Mojibake.repair("간") == ("간", false))
    // mixed: one CJK char anywhere vetoes the Latin-1 reading
    assert(Mojibake.repair(mangle("café") + "간") ==
      (mangle("café") + "간", false))
  }

  test("truncated multi-byte tail is malformed: unchanged") {
    // 0xC3 with no continuation byte
    assert(Mojibake.repair("abcÃ") == ("abcÃ", false))
  }

  test("double mojibake inverts one layer per pass") {
    val clean = "café"
    val twice = mangle(mangle(clean))
    val (once, was1) = Mojibake.repair(twice)
    assert(was1 && once == mangle(clean))
    val (back, was2) = Mojibake.repair(once)
    assert(was2 && back == clean)
  }
}
