package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Long, String)]): Map[Long, (Long, Int)] =
    Funnel.depth(rows.toDF("user", "t", "typ"), "user", "typ",
        Seq(col("t"), col("user")), stages)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  test("order matters: a purchase before any view does not count") {
    val got = run(Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), // full
      (2L, 1L, "purchase"), (2L, 2L, "view"), (2L, 3L, "click"), // 2 deep
      (3L, 1L, "click"), (3L, 2L, "purchase"),                   // 0: no view
      (4L, 1L, "view"), (4L, 2L, "purchase"),                    // 1: no click
      (5L, 1L, "error")))                                        // 0
    assert(got == Map(
      1L -> ((3L, 3)), 2L -> ((3L, 2)), 3L -> ((2L, 0)),
      4L -> ((2L, 1)), 5L -> ((1L, 0))))
  }

  test("conversion latency: from first view to the CLOSING purchase") {
    val df = Seq(
      // user 1: purchase at t=1 predates the funnel — must not count;
      // the closing purchase is at t=5 (after view t=2, click t=3)
      (1L, 1L, "purchase"), (1L, 2L, "view"), (1L, 3L, "click"),
      (1L, 5L, "purchase"),
      // user 2 never completes
      (2L, 1L, "view"), (2L, 2L, "purchase")).toDF("user", "t", "typ")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("t") * 1000000L))
    val got = Funnel.conversionLatency(df, "user", "typ", "ts", col("t"),
        stages).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3000000L))) // t=5 minus t=2, in µs
  }

  test("repeated stage names are rejected (one event must not fill two)") {
    val ex = intercept[IllegalArgumentException] {
      Funnel.depth(Seq((1L, 1L, "view")).toDF("user", "t", "typ"),
        "user", "typ", Seq(col("t")), Seq("view", "view"))
    }
    assert(ex.getMessage.contains("distinct"))
  }

  test("a late completion still counts; repeats are harmless") {
    val got = run(Seq(
      (1L, 1L, "view"), (1L, 2L, "error"), (1L, 3L, "view"),
      (1L, 4L, "click"), (1L, 5L, "click"), (1L, 6L, "purchase")))
    assert(got == Map(1L -> ((6L, 3))))
    // the stage event must come STRICTLY after the previous stage:
    // click-then-view never reaches 2 even with both types present
    assert(run(Seq((1L, 1L, "click"), (1L, 2L, "view"))) ==
      Map(1L -> ((2L, 1))))
  }
}
