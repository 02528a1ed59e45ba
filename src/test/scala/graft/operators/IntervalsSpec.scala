package graft.operators

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def cov(rows: Seq[(String, Long, Long)]) =
    Intervals.coverage(rows.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("hand-computed: overlap merges, gap measured between islands") {
    // [0,10) [5,20) merge; [30,40) separate -> covered 20+10, gap 10
    val got = cov(Seq(("a", 0L, 10L), ("a", 5L, 20L), ("a", 30L, 40L)))
    assert(got == Seq(("a", 3L, 2L, 30L, 10L)))
  }

  test("the swallowing case: a long interval covers its successors") {
    // [0,100) swallows [10,20) and [30,40); lag(end) would wrongly
    // split at 30 because the PREVIOUS ROW's end is 20 — the running
    // max is the contract
    val got = cov(Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L)))
    assert(got == Seq(("a", 3L, 1L, 100L, 0L)))
  }

  test("touching intervals merge (half-open [s,e) semantics)") {
    val got = cov(Seq(("a", 0L, 10L), ("a", 10L, 20L)))
    assert(got == Seq(("a", 2L, 1L, 20L, 0L)))
  }

  test("keys are independent; zero-length intervals are legal") {
    val got = cov(Seq(("a", 0L, 0L), ("b", 5L, 6L)))
    assert(got == Seq(("a", 1L, 1L, 0L, 0L), ("b", 1L, 1L, 1L, 0L)))
  }

  test("start > end is rejected, not silently mangled") {
    intercept[Exception] { cov(Seq(("a", 10L, 5L))) }
  }
}
