package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class IcoSpec extends AnyFunSuite {

  private def argb(a: Int, r: Int, g: Int, b: Int) =
    (a << 24) | (r << 16) | (g << 8) | b

  test("round trip: pixels top-down ARGB, mask bits counted") {
    val px = Array(argb(255, 1, 2, 3), argb(10, 4, 5, 6),
      argb(20, 7, 8, 9), argb(30, 10, 11, 12))
    val ico = Ico.build(Seq((2, 2, px, (x, y) => x == y)))
    val got = Ico.decode(ico).get
    assert(got.size == 1)
    val e = got.head
    assert(e.w == 2 && e.h == 2 && e.idx == 0)
    assert(e.px.toSeq == px.toSeq)
    assert(e.maskSet == 2) // (0,0) and (1,1)
  }

  test("multi-entry directory decodes every size") {
    val small = Array.fill(4)(argb(255, 9, 9, 9))
    val big = Array.fill(9)(argb(255, 5, 5, 5))
    val got = Ico.decode(Ico.build(Seq(
      (2, 2, small, (_, _) => false), (3, 3, big, (_, _) => true)))).get
    assert(got.map(e => (e.idx, e.w, e.maskSet)) == Seq((0, 2, 0), (1, 3, 9)))
  }

  test("quarantine: directory-level malformation returns None") {
    val ok = Ico.build(Seq((1, 1, Array(argb(255, 1, 1, 1)), (_, _) => false)))
    assert(Ico.decode(ok).isDefined)
    assert(Ico.decode(ok.updated(2, 9.toByte)).isEmpty, "type != icon")
    assert(Ico.decode(ok.take(5)).isEmpty, "truncated directory")
    assert(Ico.decode(ok.updated(0, 1.toByte)).isEmpty, "reserved != 0")
  }

  test("entry-level corruption quarantines that entry, not the file") {
    val px = Array(argb(255, 1, 1, 1))
    val two = Ico.build(Seq((1, 1, px, (_, _) => false),
      (1, 1, px, (_, _) => false)))
    // second entry's offset points past the file
    val e2off = 6 + 16 + 12
    val bad = two.clone()
    bad(e2off) = 0x7f.toByte; bad(e2off + 1) = 0x7f.toByte
    val got = Ico.decode(bad).get
    assert(got.map(_.idx) == Seq(0))
  }

  test("a PNG-compressed entry is recognized and quarantined (boundary)") {
    val px = Array(argb(255, 1, 1, 1))
    val ico = Ico.build(Seq((1, 1, px, (_, _) => false)))
    // overwrite the DIB with a PNG magic
    val off = 6 + 16
    val bad = ico.clone()
    bad(off) = 0x89.toByte; bad(off + 1) = 'P'.toByte
    assert(Ico.decode(bad).get.isEmpty)
  }
}
