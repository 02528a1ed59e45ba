package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class ScriptCountsSpec extends AnyFunSuite {

  private def c(s: String): Seq[Long] =
    ScriptCountsKernel.counts(UTF8String.fromString(s)).toLongArray().toSeq

  // class order: latin cyr greek cjk hangul arabic hebrew digit space other
  test("latin incl. accented extended ranges") {
    assert(c("Hello World") == Seq(10L, 0, 0, 0, 0, 0, 0, 0, 1, 0))
    assert(c("café œuf") == Seq(7L, 0, 0, 0, 0, 0, 0, 0, 1, 0))
  }

  test("cyrillic, greek, cjk+kana, hangul syllables and jamo") {
    assert(c("Привет мир") ==
      Seq(0L, 9, 0, 0, 0, 0, 0, 0, 1, 0))
    assert(c("αβγ") == Seq(0L, 0, 3, 0, 0, 0, 0, 0, 0, 0))
    assert(c("你好世界 こんにちは") ==
      Seq(0L, 0, 0, 9, 0, 0, 0, 0, 1, 0))
    assert(c("\uAC00\uB098\uB2E4\u1100\u1161") == Seq(0L, 0, 0, 0, 5, 0, 0, 0, 0, 0))
  }

  test("arabic, hebrew, digits, whitespace, other") {
    assert(c("مرحبا") == Seq(0L, 0, 0, 0, 0, 5, 0, 0, 0, 0))
    assert(c("אב") == Seq(0L, 0, 0, 0, 0, 0, 2, 0, 0, 0))
    assert(c("123!? \t") == Seq(0L, 0, 0, 0, 0, 0, 0, 3, 2, 2))
    assert(c("") == Seq.fill(10)(0L))
  }

  test("supplementary code points count once (surrogate pair = one symbol)") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(c(emoji) == Seq(0L, 0, 0, 0, 0, 0, 0, 0, 0, 1))
  }

  test("expression: interpreted eval + null passthrough") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val e = ScriptCounts(Literal(UTF8String.fromString("ab1"), StringType))
    assert(e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(2L, 0, 0, 0, 0, 0, 0, 1, 0, 0))
    assert(ScriptCounts(Literal(null, StringType)).eval(null) == null)
  }
}
