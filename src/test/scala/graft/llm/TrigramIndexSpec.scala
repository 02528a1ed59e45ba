package graft.llm

import graft.SparkSpec

class TrigramIndexSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick quip"),   // holds qui+uic+ick but not "quickly"
    (3L, "qu"),           // too short for any trigram
    (4L, "qui uic ick"))   // all of "quick"'s trigrams, scattered
    .toDF("doc_id", "text")

  private def got(patterns: Seq[String]): Map[String, (Long, Long)] =
    TrigramIndex.search(docs, "doc_id", "text", patterns)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("candidates over-select, matches verify exactly") {
    // doc4 holds every trigram of "quick" but not the substring itself
    assert(got(Seq("quick")) == Map("quick" -> ((3L, 2L))))
  }

  test("a pattern absent from the corpus emits 0/0, not no row") {
    assert(got(Seq("zebra")) == Map("zebra" -> ((0L, 0L))))
  }

  test("multi-word patterns search across token boundaries") {
    assert(got(Seq("quick brown")) == Map("quick brown" -> ((1L, 1L))))
  }

  test("postings are distinct per doc and skip sub-trigram docs") {
    val post = TrigramIndex.postings(docs, "doc_id", "text").collect()
    assert(!post.exists(_.getLong(0) == 3L), "doc 3 is too short to index")
    val perDoc = post.map(r => (r.getLong(0), r.getString(1)))
    assert(perDoc.distinct.length == perDoc.length, "postings must be distinct")
  }

  test("patterns shorter than 3 chars are rejected") {
    val ex = intercept[IllegalArgumentException] {
      TrigramIndex.patternTris(Seq("ab"))
    }
    assert(ex.getMessage.contains("3 chars"))
  }
}
