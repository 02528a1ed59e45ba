package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class PunycodeSpec extends AnyFunSuite {

  private val pinned = Seq(
    "mnchen-3ya" -> "münchen",
    "bcher-kva" -> "bücher",
    "caf-dma" -> "café",
    "nio-8ma" -> "niño",
    "zrich-kva" -> "zürich",
    "rsum-bpad" -> "résumé",
    "1lq90i" -> "北京",
    "80adxhks" -> "москва")

  test("pinned vectors decode; java.net.IDN agrees (independent impl)") {
    for ((puny, uni) <- pinned) {
      assert(Punycode.decodeLabel(puny).contains(uni), s"xn--$puny")
      assert(java.net.IDN.toUnicode(s"xn--$puny") == uni,
        s"cross-check drifted for xn--$puny")
    }
  }

  test("extended-part digits are case-insensitive; basic case is preserved") {
    // RFC 3492 §3.2: basic code points copy verbatim (case and all);
    // only the variable-length-integer DIGITS fold case
    assert(Punycode.decodeLabel("MNCHEN-3YA").contains("MüNCHEN"))
    assert(Punycode.decodeLabel("mnchen-3YA").contains("münchen"))
  }

  test("decodeHost maps ACE labels, passes plain labels through") {
    assert(Punycode.decodeHost("www.xn--mnchen-3ya.example")
      .contains("www.münchen.example"))
    assert(Punycode.decodeHost("plain.example").contains("plain.example"))
  }

  test("quarantine: malformed ACE labels poison the whole host") {
    assert(Punycode.decodeLabel("999999999999999999").isEmpty, "overflow")
    assert(Punycode.decodeLabel("abc-!!").isEmpty,
      "bad digit in the extended part")
    assert(Punycode.decodeLabel("b").isEmpty, "truncated integer")
    assert(Punycode.decodeHost("ok.xn--999999999999999999.example").isEmpty)
    assert(Punycode.decodeHost("xn--.example").isEmpty, "empty ACE label")
  }

  test("pure-basic labels with a trailing delimiter decode to themselves") {
    assert(Punycode.decodeLabel("abc-").contains("abc"))
  }
}
