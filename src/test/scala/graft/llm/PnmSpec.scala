package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class PnmSpec extends AnyFunSuite {

  test("P6 binary RGB decodes with exact channel placement") {
    val data = "P6 2 1 255\n".getBytes ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val img = Pnm.decode(data).get
    assert(img.kind == "P6" && img.w == 2 && img.h == 1)
    assert(img.px.toSeq == Seq((10 << 16) | (20 << 8) | 30,
      (40 << 16) | (50 << 8) | 60))
  }

  test("P5 binary gray replicates to r=g=b") {
    val img = Pnm.decode("P5 1 2 255\n".getBytes ++ Array[Byte](7, 9)).get
    assert(img.px.toSeq == Seq(0x070707, 0x090909))
  }

  test("P3 ASCII tolerates whitespace runs, newlines, and comments") {
    val txt = "P3\n# a comment\n2 1\n# another\n255\n 1  2\t3\n4 5 6\n"
    val img = Pnm.decode(txt.getBytes).get
    assert(img.kind == "P3")
    assert(img.px.toSeq == Seq((1 << 16) | (2 << 8) | 3, (4 << 16) | (5 << 8) | 6))
  }

  test("P2 ASCII gray with a mid-samples comment") {
    val img = Pnm.decode("P2 2 2 99\n1 2 # note\n3 4\n".getBytes).get
    assert(img.px.toSeq == Seq(0x010101, 0x020202, 0x030303, 0x040404))
  }

  test("binary samples start exactly one whitespace byte after maxval") {
    // 255 followed directly by sample bytes (no separator) must fail
    assert(Pnm.decode("P5 1 1 255".getBytes ++ Array[Byte](5, 5)).isEmpty)
  }

  test("quarantine: bounds and garbage") {
    assert(Pnm.decode("P7 1 1 255\n".getBytes).isEmpty, "unknown kind")
    assert(Pnm.decode("P2 1 1 255\n300\n".getBytes).isEmpty, "sample > maxval")
    assert(Pnm.decode("P2 1 1 70000\n1\n".getBytes).isEmpty, "maxval > 255")
    assert(Pnm.decode("P5 2 1 255\n".getBytes ++ Array[Byte](1)).isEmpty,
      "short binary body")
    assert(Pnm.decode("P5 1 1 255\n".getBytes ++ Array[Byte](1, 9)).isEmpty,
      "trailing binary garbage")
    assert(Pnm.decode("P2 1 1 255\n3 junk\n".getBytes).isEmpty,
      "trailing ascii garbage")
    assert(Pnm.decode("P2 2 1 255\n3\n".getBytes).isEmpty, "too few samples")
    assert(Pnm.decode("P6 70000 70000 255\n".getBytes).isEmpty,
      "dims over the pixel cap")
  }
}
