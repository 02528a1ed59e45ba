package graft.operators

import graft.SparkSpec

class GridJoinSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(build: Seq[(Long, Long, Long)], probe: Seq[(Long, Long, Long)],
      r: Long): Set[(Long, Long, Long)] =
    GridJoin.radiusJoin(build.toDF("id", "x", "y"), probe.toDF("id", "x", "y"), r)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .toSet

  test("finds exactly the pairs within r, with exact squared distances") {
    val build = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 100L, 100L))
    val probe = Seq((10L, 0L, 0L))
    assert(pairs(build, probe, 5L) ==
      Set((10L, 1L, 0L), (10L, 2L, 25L))) // d=5 is INSIDE (<= r*r)
  }

  test("cross-cell neighbors are found (candidates span the 3x3 hood)") {
    // points straddle a cell boundary at x=10 with r=10; x=29 is in the
    // hood's cell 2 but fails the exact test (d=19 > r)
    val build = Seq((1L, 9L, 0L), (2L, 11L, 0L), (3L, 29L, 0L))
    val probe = Seq((10L, 10L, 0L))
    assert(pairs(build, probe, 10L).map(_._2) == Set(1L, 2L))
  }

  test("far points in adjacent cells fail the exact test") {
    // same cell hood, but d2 > r2: candidate generated then rejected
    val got = pairs(Seq((1L, 0L, 0L)), Seq((10L, 9L, 9L)), 10L)
    assert(got.isEmpty) // d2 = 162 > 100
  }

  test("negative coordinates violate the contract loudly") {
    val ex = intercept[Exception] {
      pairs(Seq((1L, -1L, 0L)), Seq((10L, 0L, 0L)), 5L)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${chain(t.getCause)}"
    assert(chain(ex).contains("coordinate contract"))
  }
}
