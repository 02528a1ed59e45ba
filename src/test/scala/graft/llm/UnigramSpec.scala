package graft.llm

import graft.SparkSpec

class UnigramSpec extends SparkSpec {

  private val costs = Unigram.DemoVocab.toMap
  private val maxLen = costs.keysIterator.map(_.length).max
  private def seg(w: String) = Unigram.segment(w, costs, maxLen, 32)

  test("Viterbi minimum, hand-computed") {
    // the: 190 beats t+h+e=300 and th? (absent)
    assert(seg("the").contains(Seq("the")))
    // fast: fa(140)+st(110)=250 beats f+a+st=310 and fa+s+t=340
    assert(seg("fast").contains(Seq("fa", "st")))
    // joined: join(230)+ed(130)=360 beats jo+in+ed=400 and letters=600
    assert(seg("joined").contains(Seq("join", "ed")))
    // single letter
    assert(seg("a").contains(Seq("a")))
  }

  test("Viterbi beats greedy longest-match: inge") {
    // greedy-longest-first takes ing(180)+e(100)=280; the DP finds
    // in(120)+ge(130)=250 — THE case separating Unigram from WordPiece
    assert(seg("inge").contains(Seq("in", "ge")))
  }

  test("cost ties break toward the longest piece") {
    // ab(200) exactly equals a(100)+b(100) — longest wins
    assert(seg("ab").contains(Seq("ab")))
    // table: t+a+b+l+e and t+ab+l+e both cost 500; the backward step at
    // position 3 sees the tie and must take the 2-char piece
    assert(seg("table").contains(Seq("t", "ab", "l", "e")))
  }

  test("unk: uncovered character or oversize word has no path") {
    assert(seg("query").isEmpty, "q is outside the vocab closure")
    assert(seg("x9y").isEmpty, "digits are outside the closure")
    assert(seg("").isEmpty)
    assert(seg("x" * 33).isEmpty, "maxChars rule")
    assert(seg("x" * 32).nonEmpty)
  }

  test("segmentAll: positions join back; distinct words segment once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the fast query fast"),
      (2L, ""),
      (3L, "inge")).toDF("doc_id", "text")
    val got = Unigram.segmentAll(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got == Seq(
      (1L, 0, 0, "the"),
      (1L, 1, 0, "fa"), (1L, 1, 1, "st"),
      (1L, 2, 0, "<unk>"),
      (1L, 3, 0, "fa"), (1L, 3, 1, "st"),
      (3L, 0, 0, "in"), (3L, 0, 1, "ge")))
  }
}
