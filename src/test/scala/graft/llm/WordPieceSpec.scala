package graft.llm

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  private val starts = WordPiece.DemoVocab.filterNot(_.startsWith("##")).toSet
  private val conts =
    WordPiece.DemoVocab.filter(_.startsWith("##")).map(_.drop(2)).toSet
  private def tok(w: String) =
    WordPiece.tokenize(w, starts, conts, maxPieceLen = 4, maxChars = 32)

  test("greedy longest-match with ## continuations") {
    assert(tok("the").contains(Seq("the")))
    assert(tok("sort").contains(Seq("sort"))) // full word beats s+##ort
    assert(tok("scan").contains(Seq("sc", "##an")))
    assert(tok("column").contains(Seq("col", "##umn")))
    assert(tok("merge").contains(Seq("mer", "##ge")))
    assert(tok("stream").contains(Seq("str", "##eam")))
    assert(tok("batch").contains(Seq("b", "##atch")))
    assert(tok("small").contains(Seq("s", "##mall")))
    assert(tok("spark").contains(Seq("s", "##p", "##a", "##r", "##k")))
    assert(tok("a").contains(Seq("a")))
  }

  test("all-or-nothing: unmatched position or oversize word → None") {
    assert(tok("query").isEmpty, "q has no start piece — whole word fails")
    assert(tok("").isEmpty)
    assert(tok("x" * 33).isEmpty, "maxChars rule")
    assert(tok("x" * 32).nonEmpty)
    // greedy can fail where backtracking would not — published behavior:
    // vocab {ab, a, ##c} on "abc": greedy takes "ab", then no "##c"?
    val s2 = Set("ab", "a")
    val c2 = Set("b", "c") // ##b, ##c
    assert(WordPiece.tokenize("abc", s2, c2, 2, 32).contains(Seq("ab", "##c")))
    // now remove ##c: greedy "ab" strands "c"; backtracking a+##b+... also
    // fails here, but with ##bc present ONLY backtracking would succeed
    val c3 = Set("bc")
    assert(WordPiece.tokenize("abc", s2, c3, 2, 32).isEmpty,
      "greedy takes ab and strands c — the WordPiece contract")
  }

  test("tokenizeAll: positions join back; distinct words tokenize once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the scan query scan"),
      (2L, ""),
      (3L, "merge")).toDF("doc_id", "text")
    val got = WordPiece.tokenizeAll(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got == Seq(
      (1L, 0, 0, "the"),
      (1L, 1, 0, "sc"), (1L, 1, 1, "##an"),
      (1L, 2, 0, "[UNK]"),
      (1L, 3, 0, "sc"), (1L, 3, 1, "##an"),
      (3L, 0, 0, "mer"), (3L, 0, 1, "##ge")))
  }
}
