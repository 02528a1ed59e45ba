package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SystematicSpec extends SparkSpec {
  import spark.implicits._

  private def draw(items: Seq[(String, Long, Long)],
      allocs: Seq[(String, Long)]) =
    Systematic.sample(items.toDF("s", "id", "w"), "s", "id", col("w"),
        allocs.toDF("stratum", "alloc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("hand-computed: midpoint points land in the right intervals") {
    // one stratum, hash order of ids 1..4 under (id*48271)%1000000007
    // is ascending id (values 48271, 96542, ...); weights 10,30,10,50
    // -> line [0,10)[10,40)[40,50)[50,100), W=100, k=4:
    // p_j = 100*(2j+1) div 8 = 12, 37, 62, 87 -> items 2, 2, 4, 4
    val got = draw(Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 10L),
      ("a", 4L, 50L)), Seq(("a", 4L)))
    assert(got == Seq(("a", 0L, 2L), ("a", 1L, 2L), ("a", 2L, 4L),
      ("a", 3L, 4L)))
  }

  test("exact-k contract: every stratum draws exactly alloc points") {
    val items = (1L to 500L).map(i => (s"s${i % 3}", i, 1L + i % 7))
    val allocs = Seq(("s0", 11L), ("s1", 5L), ("s2", 0L))
    val got = draw(items, allocs)
    val perStratum = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum == Map("s0" -> 11, "s1" -> 5),
      "alloc-0 strata draw nothing; others exactly alloc")
    // j is dense 0..alloc-1
    assert(got.filter(_._1 == "s0").map(_._2) == (0L until 11L))
  }

  test("PPS with multiplicity: a dominant weight absorbs many points") {
    // item 99 carries 1000 of 1010 total weight -> with k=10 nearly all
    // points land inside it
    val items = (1L to 10L).map(i => ("a", i, 1L)) :+ (("a", 99L, 1000L))
    val got = draw(items, Seq(("a", 10L)))
    assert(got.count(_._3 == 99L) >= 9, s"dominant item must repeat: $got")
  }

  test("non-positive weights are rejected, not silently double-drawn") {
    // a negative weight makes the cumulative line non-monotone and one
    // point can satisfy TWO intervals — the exact-k contract breaks
    intercept[Exception] {
      draw(Seq(("a", 1L, 10L), ("a", 2L, -5L), ("a", 3L, 10L)),
        Seq(("a", 3L)))
    }
  }

  test("weight-proportional inclusion: frequencies track weights") {
    // two items, weights 1 and 3, k=40 -> 10 vs 30 picks exactly
    // (systematic sampling is exact at integer multiples)
    val got = draw(Seq(("a", 1L, 1L), ("a", 2L, 3L)), Seq(("a", 40L)))
    val freq = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(freq == Map(1L -> 10, 2L -> 30))
  }
}
