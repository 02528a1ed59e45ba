package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class AllocateSpec extends SparkSpec {

  import spark.implicits._

  private def run(weights: Seq[(String, Long)], k: Long): Map[String, Long] =
    Allocate.largestRemainder(weights.toDF("s", "w"), "s", col("w"), k)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap

  test("allocations sum to exactly k (no slot lost or invented)") {
    val got = run(Seq(("a", 333L), ("b", 333L), ("c", 334L)), 10L)
    assert(got.values.sum == 10L)
  }

  test("largest remainders receive the leftover slots") {
    // k=10 over weights 5,3,2 of total 10: exact, no leftovers
    assert(run(Seq(("a", 5L), ("b", 3L), ("c", 2L)), 10L) ==
      Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // k=10 over 7,7,6: quotas 3.5,3.5,3 → bases 3,3,3, leftover 1 goes
    // to the tied largest remainder with the SMALLEST stratum key
    assert(run(Seq(("a", 7L), ("b", 7L), ("c", 6L)), 10L) ==
      Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("zero-weight strata can receive only leftover-rank slots they never win") {
    val got = run(Seq(("a", 10L), ("z", 0L)), 7L)
    assert(got == Map("a" -> 7L, "z" -> 0L))
  }

  test("k = 0 allocates nothing") {
    assert(run(Seq(("a", 5L), ("b", 5L)), 0L).values.sum == 0L)
  }
}
