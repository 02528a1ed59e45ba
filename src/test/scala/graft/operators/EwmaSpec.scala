package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], maxLen: Int = 10000) =
    Ewma.smooth(rows.toDF("key", "d", "x"), Seq("key"), "d", "x", maxLen)
      .select(col("key"), col("d"), col("x"), col("ewma64"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq

  test("hand-computed recurrence: s'=(7s'+64x) div 8 from s'_1=64x_1") {
    // x = 8, 0, 16 -> s' = 512, 448, (7*448+1024) div 8 = 520
    val got = run(Seq(("a", 1L, 8L), ("a", 2L, 0L), ("a", 3L, 16L)))
    assert(got == Seq(("a", 1L, 8L, 512L), ("a", 2L, 0L, 448L),
      ("a", 3L, 16L, 520L)))
  }

  test("input order is irrelevant; keys fold independently") {
    val shuffled = Seq(("b", 3L, 16L), ("a", 1L, 5L), ("b", 1L, 8L),
      ("b", 2L, 0L))
    val got = run(shuffled)
    assert(got == Seq(("a", 1L, 5L, 320L), ("b", 1L, 8L, 512L),
      ("b", 2L, 0L, 448L), ("b", 3L, 16L, 520L)))
  }

  test("a constant series is a fixed point (up to the 1/64 scaling)") {
    val got = run((1L to 10L).map(d => ("c", d, 5L)))
    assert(got.forall(_._4 == 320L), s"64*5 = 320 must persist: $got")
  }

  test("the series-length contract is enforced, not assumed") {
    val e = intercept[Exception] {
      run(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L)), maxLen = 2)
    }
    assert(e.getMessage != null)
  }
}
