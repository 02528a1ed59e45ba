package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** SURVEY §5.2.5: batch result == Trigger.AvailableNow streaming result for
  * Q23–Q25 (the oracle triangle's third corner; batch↔oracle is t2). */
class StreamingParitySpec extends SparkSpec {

  private def ckpt() = Files.createTempDirectory("graft-ckpt-").toString

  test("q23 tumbling-window stream equals batch") {
    val batch = StreamingQueries.q23.run(spark, sf0001).collect().toSeq
    val stream = StreamingQueries.q23Streaming(spark, sf0001, ckpt()).collect().toSeq
    assert(stream == batch)
  }

  test("q24 sliding-window stream equals batch") {
    val batch = StreamingQueries.q24.run(spark, sf0001).collect().toSeq
    val stream = StreamingQueries.q24Streaming(spark, sf0001, ckpt()).collect().toSeq
    assert(stream == batch)
  }

  test("q25 stateful dedup stream equals batch distinct count") {
    val batch = StreamingQueries.q25.run(spark, sf0001).collect().head.getLong(0)
    val stream = StreamingQueries.q25Streaming(spark, sf0001, ckpt()).collect().head.getLong(0)
    assert(stream == batch)
  }

  test("session windows: per-user events gap-split deterministically") {
    val events = graft.Tables(spark, sf0001, "events")
    val sessions = StreamingQueries.sessionWindows(events, "30 minutes").collect()
    assert(sessions.nonEmpty)
    // session count per user never exceeds event count, and n_events sums to total
    assert(sessions.map(_.getLong(3)).sum == events.count())
  }

  test("q67 stream-stream interval join equals batch") {
    val batch = StreamingQueries.q67.run(spark, sf0001).collect().toSeq
    val stream = StreamingQueries.q67Streaming(spark, sf0001, ckpt()).collect().toSeq
    assert(batch.nonEmpty)
    assert(stream == batch)
  }

  test("q67 left-outer stream: matched rows equal batch; evictions respect the horizon") {
    import org.apache.spark.sql.functions._
    val outer = StreamingQueries.q67OuterStreaming(spark, sf0001, ckpt()).cache()
    // matched rows are exactly the inner join, regardless of watermark
    val matched = outer.filter(col("click_id").isNotNull)
    val batchInner = StreamingQueries.q67.run(spark, sf0001)
    assert(matched.exceptAll(batchInner).count() == 0)
    assert(batchInner.exceptAll(matched).count() == 0)
    // null-extensions: a subset of the batch outer's unmatched views...
    val batchNulls = StreamingQueries.q67OuterBatch(spark, sf0001)
      .filter(col("click_id").isNull).select("view_id").cache()
    val streamNulls = outer.filter(col("click_id").isNull).select("view_id")
    assert(streamNulls.exceptAll(batchNulls).count() == 0)
    // ...and complete for views older than the certainty horizon:
    // watermark stops 10 min short of max(ts); a view can only await a
    // match for 6h past view_ts
    // the join's watermark is the MIN of the two sides' event-time maxima
    // (each side only observes its own filtered rows), minus the 10 min
    // delay — not the global events max
    val events = graft.Tables(spark, sf0001, "events")
    val sideMax = (t: String) => events.filter(col("event_type") === t)
      .agg(max("ts")).head().getTimestamp(0).toInstant
    val wmBase = Seq(sideMax("view"), sideMax("click")).min
    val horizon = wmBase.minusSeconds(6 * 3600 + 600 + 60) // 6h + wm + slack
    val due = StreamingQueries.q67OuterBatch(spark, sf0001)
      .filter(col("click_id").isNull &&
        col("view_ts") < lit(java.sql.Timestamp.from(horizon)).cast("timestamp_ntz"))
      .select("view_id")
    assert(due.count() > 0, "fixture must contain evictable unmatched views")
    assert(due.exceptAll(streamNulls).count() == 0,
      "every unmatched view past the horizon must have been null-extended")
    outer.unpersist(); batchNulls.unpersist()
  }

  test("q50 session-window stream equals batch") {
    val batch = StreamingQueries.q50.run(spark, sf0001).collect().toSeq
    val stream = StreamingQueries.q50Streaming(spark, sf0001, ckpt()).collect().toSeq
    assert(stream == batch)
  }
}
