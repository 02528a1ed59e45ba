package graft.llm

import graft.{SparkSpec, Tables}

class SubstringDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand case: a shared 3-gram is found, counts and first_idx exact") {
    // docs 1 and 2 share "b c d" (at idx 1 and 0); doc 3 shares nothing
    val d = docs(
      1L -> "a b c d e",
      2L -> "b c d x y",
      3L -> "p q r s t")
    val out = SubstringDedup.repeatedSpans(d, n = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 1L, 1), (2L, 1L, 1L, 0)))
  }

  test("minDocs=2 needs DISTINCT docs — within-doc repetition doesn't count") {
    val d = docs(
      1L -> "x y z x y z x y z", // "x y z" thrice, but only in one doc
      2L -> "totally different words here")
    assert(SubstringDedup.repeatedSpans(d, n = 3, minDocs = 2).count() == 0)
  }

  test("short documents (< n tokens) are excluded, not errored") {
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "", 4L -> "   ")
    assert(SubstringDedup.repeatedSpans(d, n = 3, minDocs = 2).count() == 0)
  }

  test("128-bit hash-keyed scale path ≡ string-keyed oracle path on the fixture") {
    val d = Tables(spark, sf0001, "documents")
    val byHash = SubstringDedup.repeatedSpans(d, n = 8, minDocs = 2, hashKeys = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val byString = SubstringDedup.repeatedSpans(d, n = 8, minDocs = 2, hashKeys = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(byHash.nonEmpty, "fixture produced no repeated spans — vacuous parity")
    assert(byHash == byString)
  }
}
