package graft.llm

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "merge sort beats hash join on merge sort workloads"),
    (2L, "sort merge is NOT merge sort reversed"),
    (3L, "merge and sort apart"),
    (4L, "")).toDF("doc_id", "text")

  test("adjacency, not co-occurrence; overlapping matches all surface") {
    val idx = PhraseSearch.postings(docs)
    val got = PhraseSearch.phraseMatches(idx, Seq("merge", "sort"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(identity).toSeq
    // doc 1 at 0 and 6; doc 2 ONLY at 4 ("sort merge" at 0 must NOT
    // match); doc 3 has both words but never adjacent
    assert(got == Seq((1L, 0), (1L, 6), (2L, 4)))
  }

  test("trigram chains both adjacency joins; self-overlap works") {
    val d = Seq((1L, "a a a a b")).toDF("doc_id", "text")
    val idx = PhraseSearch.postings(d)
    val got = PhraseSearch.phraseMatches(idx, Seq("a", "a", "a"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(identity).toSeq
    assert(got == Seq((1L, 0), (1L, 1)))
    assert(PhraseSearch.phraseMatches(idx, Seq("a", "b"))
      .collect().map(_.getInt(1)).toSeq == Seq(3))
    assert(PhraseSearch.phraseMatches(idx, Seq("b", "a")).count() == 0L)
  }

  test("search unions pinned phrases with labels") {
    val got = PhraseSearch.search(docs,
        Seq(Seq("merge", "sort"), Seq("hash", "join")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(identity).toSeq
    assert(got == Seq(
      ("hash join", 1L, 3),
      ("merge sort", 1L, 0), ("merge sort", 1L, 6), ("merge sort", 2L, 4)))
  }
}
