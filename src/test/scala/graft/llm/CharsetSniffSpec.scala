package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class CharsetSniffSpec extends AnyFunSuite {

  private def d(ct: String, body: Array[Byte]): CharsetSniff.Decoded =
    CharsetSniff.sniff(ct, body)

  test("header charset wins; quotes and parameter junk tolerated") {
    val latin1 = "café".getBytes("ISO-8859-1")
    assert(d("text/html; charset=iso-8859-1", latin1) ==
      CharsetSniff.Decoded("café", "iso-8859-1", "header"))
    assert(d("text/html; charset=\"ISO-8859-1\"", latin1).text == "café")
    assert(d("text/html;charset='iso-8859-1';foo=bar", latin1).text == "café")
    // the header beats a contradicting meta tag
    val withMeta = "<meta charset=\"utf-8\"><p>café</p>".getBytes("ISO-8859-1")
    assert(d("text/html; charset=iso-8859-1", withMeta).source == "header")
  }

  test("charset label parse survives length-changing case upstream") {
    // 'İ' (U+0130) lowercases to TWO chars: offsets computed on a
    // lowered copy shift after it, so the parse must scan the ORIGINAL
    // string case-insensitively (regionMatches), not index-map
    val latin1 = "café".getBytes("ISO-8859-1")
    assert(d("text/html; xİİx CHARSET=iso-8859-1", latin1) ==
      CharsetSniff.Decoded("café", "iso-8859-1", "header"))
  }

  test("header decode is REPLACE mode: a bad byte does not kill the page") {
    val bytes = "ok ".getBytes("UTF-8") ++ Array(0xE9.toByte) // bad as UTF-8
    val got = d("text/plain; charset=utf-8", bytes)
    assert(got.source == "header" && got.text == "ok �")
  }

  test("BOMs: UTF-8 / UTF-16LE / UTF-16BE detected and stripped") {
    val utf8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "café".getBytes("UTF-8")
    assert(d("text/html", utf8) == CharsetSniff.Decoded("café", "utf-8", "bom"))
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ "ab".getBytes("UTF-16LE")
    assert(d(null, le) == CharsetSniff.Decoded("ab", "utf-16le", "bom"))
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ "ab".getBytes("UTF-16BE")
    assert(d(null, be) == CharsetSniff.Decoded("ab", "utf-16be", "bom"))
  }

  test("meta charset within the first 1024 bytes; both meta forms") {
    val m1 = "<html><meta charset=windows-1252><p>café €</p>"
      .getBytes("windows-1252")
    assert(d("text/html", m1).charset == "windows-1252")
    assert(d("text/html", m1).text.contains("café €"))
    val m2 = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"><p>café</p>").getBytes("ISO-8859-1")
    assert(d(null, m2) == CharsetSniff.Decoded(new String(m2, "ISO-8859-1"),
      "iso-8859-1", "meta"))
    // beyond the 1024-byte prescan window: not seen
    val far = (" " * 1100 + "<meta charset=iso-8859-1>x").getBytes("ISO-8859-1")
    assert(d(null, far).source != "meta")
    // unknown label keeps scanning, then falls through
    val unk = "<meta charset=not-a-charset><p>plain</p>".getBytes("UTF-8")
    assert(d(null, unk).source == "utf8")
  }

  test("unlabeled: strict UTF-8 probe, else windows-1252 fallback") {
    assert(d(null, "plain café".getBytes("UTF-8")) ==
      CharsetSniff.Decoded("plain café", "utf-8", "utf8"))
    // 0xE9 alone is invalid UTF-8; cp1252 maps it to é
    val legacy = "caf".getBytes("UTF-8") ++ Array(0xE9.toByte)
    assert(d(null, legacy) == CharsetSniff.Decoded("café", "windows-1252", "fallback"))
    // cp1252-specific 0x80 is the euro sign
    val euro = "x ".getBytes("UTF-8") ++ Array(0x80.toByte)
    assert(d(null, euro).text == "x €")
    assert(d(null, Array.emptyByteArray) ==
      CharsetSniff.Decoded("", "utf-8", "utf8"))
    assert(d("text/html", null).text == "")
  }

  test("unknown header label falls through to the body rules") {
    val utf8 = "café".getBytes("UTF-8")
    assert(d("text/html; charset=bogus-enc", utf8).source == "utf8")
  }
}
