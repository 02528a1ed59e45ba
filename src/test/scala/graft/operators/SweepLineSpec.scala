package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SweepLineSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    SweepLine.peakConcurrency(rows.toDF("g", "s", "e"),
        col("g"), col("s"), col("e"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("overlapping intervals stack; the peak reports its first instant") {
    // [0,10) [5,15) [6,8) → 3 live at t=6; [20,25) alone
    val got = run(Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 6L, 8L),
      ("a", 20L, 25L)))
    assert(got("a") == ((3L, 6L)))
  }

  test("half-open: touching endpoints do not overlap") {
    // [0,5) then [5,10): the close at 5 sorts before the open at 5
    val got = run(Seq(("b", 0L, 5L), ("b", 5L, 10L)))
    assert(got("b") == ((1L, 0L)))
  }

  test("identical intervals count individually") {
    val got = run(Seq(("c", 3L, 7L), ("c", 3L, 7L), ("c", 3L, 7L)))
    assert(got("c") == ((3L, 3L)))
  }

  test("groups sweep independently") {
    val got = run(Seq(("x", 0L, 10L), ("x", 1L, 9L), ("y", 0L, 10L)))
    assert(got == Map("x" -> ((2L, 1L)), "y" -> ((1L, 0L))))
  }
}
