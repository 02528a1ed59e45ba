package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AttributionSpec extends SparkSpec {

  import spark.implicits._

  // (user, ts, id, kind, channel, rev)
  private def run(rows: Seq[(Long, Long, Long, String, String, Long)],
      lookback: Long = 100L): Map[String, (Long, Long)] =
    Attribution.lastTouch(
        rows.toDF("user", "ts", "id", "kind", "ch", "rev"),
        "user", col("ts"), col("id"),
        col("kind") === "touch", col("ch"), col("kind") === "conv",
        col("rev"), lookback)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("the LAST touch wins, not the first") {
    val got = run(Seq(
      (1L, 10L, 1L, "touch", "ads", 0L),
      (1L, 20L, 2L, "touch", "email", 0L),
      (1L, 30L, 3L, "conv", "", 500L)))
    assert(got == Map("email" -> ((1L, 500L))))
  }

  test("a stale touch attributes as direct") {
    val got = run(Seq(
      (2L, 10L, 1L, "touch", "ads", 0L),
      (2L, 500L, 2L, "conv", "", 70L)), lookback = 100L)
    assert(got == Map("direct" -> ((1L, 70L))))
  }

  test("no touch at all is direct; a touch AFTER the conversion is ignored") {
    val got = run(Seq(
      (3L, 10L, 1L, "conv", "", 10L),
      (3L, 20L, 2L, "touch", "ads", 0L)))
    assert(got == Map("direct" -> ((1L, 10L))))
  }

  test("a touch tied with the conversion instant gets credit") {
    val got = run(Seq(
      (4L, 10L, 1L, "touch", "social", 0L),
      (4L, 10L, 2L, "conv", "", 30L)))
    assert(got == Map("social" -> ((1L, 30L))))
  }

  test("users attribute independently; revenue sums per channel") {
    val got = run(Seq(
      (5L, 10L, 1L, "touch", "ads", 0L), (5L, 11L, 2L, "conv", "", 10L),
      (6L, 10L, 1L, "touch", "ads", 0L), (6L, 11L, 2L, "conv", "", 20L)))
    assert(got == Map("ads" -> ((2L, 30L))))
  }
}
