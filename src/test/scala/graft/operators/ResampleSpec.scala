package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(String, Long, Double, Long)]) =
    rows.toDF("k", "sec", "v", "id")
      .select(col("k"), to_timestamp(col("sec")).as("ts"), col("v"), col("id"))

  test("forward fill: epoch-aligned grid, carry-forward, pre-first-obs nulls") {
    val events = mk(Seq(
      ("a", 100L, 1.0, 1L), ("a", 130L, 2.0, 2L), ("a", 400L, 3.0, 3L),
      ("b", 60L, 9.0, 4L)))
    val out = Resample.forwardFill(events, "k", "ts", "v", "id", stepSeconds = 60L)
      .select(col("k"), unix_timestamp(col("ts")).as("sec"), col("v"))
      .orderBy("k", "sec")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2))))
    // key a: grid snaps to 60, runs to max obs 400 -> 60..360; the instant
    // 60 precedes the first observation (100) so it stays null; 120 adopts
    // the 100s value, 180.. carry the 130s value forward
    val a = out.filter(_._1 == "a").map(x => x._2 -> x._3)
    assert(a.toSeq == Seq(
      60L -> None, 120L -> Some(1.0), 180L -> Some(2.0),
      240L -> Some(2.0), 300L -> Some(2.0), 360L -> Some(2.0)))
    // key b: single observation exactly on its grid instant -> adopted
    assert(out.filter(_._1 == "b").map(x => x._2 -> x._3).toSeq ==
      Seq(60L -> Some(9.0)))
  }

  test("forward fill: NULL-timestamp rows drop instead of polluting the grid") {
    val events = mk(Seq(("a", 120L, 1.0, 1L)))
      .unionByName(Seq(("a", 5.0, 9L)).toDF("k", "v", "id")
        .selectExpr("k", "CAST(NULL AS TIMESTAMP) AS ts", "v", "id")
        .select("k", "ts", "v", "id"))
    val out = Resample.forwardFill(events, "k", "ts", "v", "id", stepSeconds = 60L)
      .select(unix_timestamp(col("ts")).as("sec"), col("v"))
      .orderBy("sec").collect().map(r => r.getLong(0) -> Option(r.get(1)))
    // Spark sorts NULL ts first — unfiltered, the 5.0 would fill slot 120
    // before the real observation; it must not
    assert(out.toSeq == Seq(120L -> Some(1.0)))
  }

  test("forward fill: duplicate observations at one instant resolve by max id") {
    val events = mk(Seq(
      ("a", 120L, 5.0, 10L), ("a", 120L, 7.0, 11L), ("a", 200L, 1.0, 12L)))
    val out = Resample.forwardFill(events, "k", "ts", "v", "id", stepSeconds = 60L)
      .select(unix_timestamp(col("ts")).as("sec"), col("v"))
      .orderBy("sec")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // 120 takes the id-11 write (7.0) and carries it to 180
    assert(out.toSeq == Seq(120L -> 7.0, 180L -> 7.0))
  }

  test("forward fill: calendar chunking returns the identical output") {
    val day = 86400L
    // long-span keys crossing many day-chunks, with: an observation exactly
    // on a chunk boundary, observation-free chunks in the middle (carry-in
    // must hop them), a pre-first-obs null region, duplicate-instant writes,
    // and a second key whose span misaligns with the first's
    val events = mk(Seq(
      ("a", 100L, 1.0, 1L), ("a", 130L, 2.0, 2L),
      ("a", 2 * day, 3.0, 3L),              // exactly on a day boundary
      ("a", 2 * day, 4.0, 9L),              // same instant, higher id wins
      ("a", 5 * day + 7000L, 5.0, 4L),      // chunks 3..4 observation-free
      ("b", day + 50L, 8.0, 5L), ("b", 3 * day + 99L, 9.0, 6L)))
    for (step <- Seq(3600L, 7200L)) {
      val plain = Resample.forwardFill(events, "k", "ts", "v", "id", step)
        .select(col("k"), col("ts"), col("v"))
      val chunked = Resample.forwardFill(events, "k", "ts", "v", "id", step,
        chunkPeriod = Some("DAY"))
        .select(col("k"), col("ts"), col("v"))
      assert(plain.count() == chunked.count(), s"step=$step")
      assert(plain.exceptAll(chunked).count() == 0, s"step=$step")
      assert(chunked.exceptAll(plain).count() == 0, s"step=$step")
    }
    // a coarser period than the span degenerates gracefully (single chunk)
    val coarse = Resample.forwardFill(events, "k", "ts", "v", "id", 3600L,
      chunkPeriod = Some("YEAR"))
      .select(col("k"), col("ts"), col("v"))
    val plain = Resample.forwardFill(events, "k", "ts", "v", "id", 3600L)
      .select(col("k"), col("ts"), col("v"))
    assert(plain.exceptAll(coarse).count() == 0)
    assert(coarse.exceptAll(plain).count() == 0)
  }

  test("forward fill: chunking equality holds when a chunk ends in a NULL value") {
    val day = 86400L
    // chunk 0 ends in a NULL observation (must still carry 5.0 forward,
    // mirroring last(ignoreNulls)); a later chunk is ALL-null (carry must
    // hop it without going null)
    val events = Seq(
      ("a", 100L, Some(5.0), 1L),
      ("a", 200L, Option.empty[Double], 2L),
      ("a", 2 * day + 100L, Some(7.0), 3L),
      ("a", 4 * day, Option.empty[Double], 4L))
      .toDF("k", "sec", "v", "id")
      .select(col("k"), to_timestamp(col("sec")).as("ts"), col("v"), col("id"))
    val plain = Resample.forwardFill(events, "k", "ts", "v", "id", 3600L)
      .select(col("k"), col("ts"), col("v"))
    val chunked = Resample.forwardFill(events, "k", "ts", "v", "id", 3600L,
      chunkPeriod = Some("DAY"))
      .select(col("k"), col("ts"), col("v"))
    assert(plain.exceptAll(chunked).count() == 0)
    assert(chunked.exceptAll(plain).count() == 0)
    // the day-1 grid slots specifically hold the pre-null value
    val d1 = chunked.filter(unix_timestamp(col("ts")) === day).collect()
    assert(d1.length == 1 && d1(0).getDouble(2) == 5.0)
  }

  test("forward fill: chunking rejects unknown periods") {
    val events = mk(Seq(("a", 100L, 1.0, 1L)))
    intercept[IllegalArgumentException] {
      Resample.forwardFill(events, "k", "ts", "v", "id", 60L,
        chunkPeriod = Some("FORTNIGHT"))
    }
  }

  test("interpolate: exact linear values between anchors, flat after last") {
    // key a: obs at 100→10.0 and 400→40.0; grid 60,120,...,360
    val events = mk(Seq(("a", 100L, 10.0, 1L), ("a", 400L, 40.0, 2L)))
    val out = Resample.interpolate(events, "k", "ts", "v", "id", 60L)
      .select(unix_timestamp(col("ts")).as("sec"), col("v"))
      .orderBy("sec")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    // slot 60 precedes the first obs → null; interior slots are exact
    // fractions of the (100,10)→(400,40) segment: v = 10 + 30·(t−100)/300
    assert(out.toSeq == Seq(
      60L -> None,
      120L -> Some(10.0 + 30.0 * 20 / 300),
      180L -> Some(10.0 + 30.0 * 80 / 300),
      240L -> Some(10.0 + 30.0 * 140 / 300),
      300L -> Some(10.0 + 30.0 * 200 / 300),
      360L -> Some(10.0 + 30.0 * 260 / 300)))
  }

  test("interpolate: an observation exactly on a grid instant is adopted") {
    val events = mk(Seq(("a", 120L, 7.0, 1L), ("a", 240L, 9.0, 2L)))
    val out = Resample.interpolate(events, "k", "ts", "v", "id", 60L)
      .select(unix_timestamp(col("ts")).as("sec"), col("v"))
      .orderBy("sec")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // slots 120 and 240 sit ON observations → exact adopted values, no
    // drift from the fraction arithmetic (prev_ts = t → fraction 0)
    assert(out.toSeq == Seq(120L -> 7.0, 180L -> 8.0, 240L -> 9.0))
  }

  test("interpolate: duplicate instants resolve by max id; null values anchor nothing") {
    val events = mk(Seq(
      ("a", 120L, 5.0, 10L), ("a", 120L, 7.0, 11L), ("a", 360L, 11.0, 12L)))
      .unionByName(Seq(("a", 240L, 99L)).toDF("k", "sec", "id")
        .select(col("k"), to_timestamp(col("sec")).as("ts"),
          lit(null).cast("double").as("v"), col("id")))
    val out = Resample.interpolate(events, "k", "ts", "v", "id", 60L)
      .select(unix_timestamp(col("ts")).as("sec"), col("v"))
      .orderBy("sec")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // 120 takes the id-11 write (7.0); the null-valued 240 observation is
    // NOT an anchor, so 180..300 interpolate on the (120,7)→(360,11) line
    assert(out.toSeq == Seq(
      120L -> 7.0, 180L -> 8.0, 240L -> 9.0, 300L -> 10.0, 360L -> 11.0))
  }

  test("interpolate plans no UnboundedFollowing frame (the O(n²)-per-key shape)") {
    // regression pin for the r8 rewrite: the next-anchor pass must stay a
    // descending-sort ACCUMULATING frame — first(...) over (currentRow →
    // unboundedFollowing) executes as a per-row rescan to partition end
    // (81 s vs 7.5 s on the q121 driver data)
    val events = mk(Seq(("a", 100L, 10.0, 1L), ("a", 400L, 40.0, 2L)))
    val plan = Resample.interpolate(events, "k", "ts", "v", "id", 60L)
      .queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("specifiedwindowframe"),
      "expected window frames in the optimized plan")
    assert(!plan.toLowerCase.contains("unboundedfollowing"),
      "an UnboundedFollowing frame reappeared in Resample.interpolate")
  }

  test("interpolate: matches forwardFill where fill semantics coincide") {
    // at observation instants and in regions with no interior gap the two
    // fills agree; this pins the shared grid construction (bounds, dedup,
    // marker ordering) to one behavior
    val events = mk(Seq(
      ("a", 60L, 1.0, 1L), ("a", 120L, 2.0, 2L), ("a", 180L, 3.0, 3L),
      ("b", 300L, 5.0, 4L)))
    val ff = Resample.forwardFill(events, "k", "ts", "v", "id", 60L)
      .select(col("k"), col("ts"), col("v"))
    val li = Resample.interpolate(events, "k", "ts", "v", "id", 60L)
      .select(col("k"), col("ts"), col("v"))
    assert(ff.exceptAll(li).count() == 0 && li.exceptAll(ff).count() == 0)
  }
}
