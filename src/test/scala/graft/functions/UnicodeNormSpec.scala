package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormSpec extends AnyFunSuite {

  private def nfc(s: String): String =
    UnicodeNormKernel.nfc(UTF8String.fromString(s)).toString
  private def fold(s: String): String =
    UnicodeNormKernel.stripAccents(UTF8String.fromString(s)).toString

  test("nfc composes decomposed Latin sequences") {
    assert(nfc("Café") == "Café")
    assert(nfc("Ångström") == "Ångström")
    assert(nfc("Garçon") == "Garçon")
  }

  test("nfc composes Hangul jamo to syllables") {
    assert(nfc("간") == "간")
  }

  test("nfc fast path: already-normalized input returns the SAME buffer") {
    val u = UTF8String.fromString("plain ascii 123")
    assert(UnicodeNormKernel.nfc(u) eq u)
    val composed = UTF8String.fromString("Café")
    assert(UnicodeNormKernel.nfc(composed) eq composed)
  }

  test("stripAccents drops combining marks from composed AND decomposed input") {
    assert(fold("Café Nöel") == "Cafe Noel")
    assert(fold("Café Nöel") == "Cafe Noel")
    assert(fold("Ångström") == "Angstrom")
    assert(fold("Garçon") == "Garcon")
    assert(fold("nñö") == "nno")
  }

  test("stripAccents RECOMPOSES mark-free decompositions (Hangul round-trip)") {
    // NFD of a Hangul syllable is jamo with NO Mn marks — a fold that
    // stops at NFD would return the decomposed jamo and break equality
    // with the composed original
    assert(fold("간") == "간")
    assert(fold("간") == "간")
  }

  test("stripAccents identity on accent-free text (fast path, same buffer)") {
    val u = UTF8String.fromString("plain ascii 123")
    assert(UnicodeNormKernel.stripAccents(u) eq u)
  }

  test("expressions evaluate via interpreted eval with null passthrough") {
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("Café"), org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == "Café")
    val n = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      null, org.apache.spark.sql.types.StringType))
    assert(n.eval(null) == null)
    val f = StripAccents(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("Garçon"), org.apache.spark.sql.types.StringType))
    assert(f.eval(null).toString == "Garcon")
  }
}
