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

  test("q91 full-outer stream: matched equals inner; both eviction sides behave") {
    import org.apache.spark.sql.functions._
    val full = StreamingQueries.q91FullStreaming(spark, sf0001, ckpt()).cache()
    // matched rows ≡ the batch inner join
    val matched = full
      .filter(col("view_id").isNotNull && col("click_id").isNotNull)
      .select("view_id", "click_id")
    val batchInner = StreamingQueries.q67.run(spark, sf0001)
      .select("view_id", "click_id")
    assert(matched.exceptAll(batchInner).count() == 0)
    assert(batchInner.exceptAll(matched).count() == 0)
    // the batch full outer is the reference for both null-extension sides
    val batchFull = StreamingQueries.q91.run(spark, sf0001).cache()
    val viewNullsBatch = batchFull.filter(col("click_id").isNull).select("view_id")
    val clickNullsBatch = batchFull.filter(col("view_id").isNull).select("click_id")
    val viewNullsStream = full.filter(col("click_id").isNull).select("view_id")
    val clickNullsStream = full.filter(col("view_id").isNull).select("click_id")
    // stream null-extensions ⊆ batch null rows, per side
    assert(viewNullsStream.exceptAll(viewNullsBatch).count() == 0)
    assert(clickNullsStream.exceptAll(clickNullsBatch).count() == 0)
    // completeness past the conservative certainty horizon (q67-outer's
    // construction): rows this old are certainly evicted and null-extended
    val events = graft.Tables(spark, sf0001, "events")
    val sideMax = (t: String) => events.filter(col("event_type") === t)
      .agg(max("ts")).head().getTimestamp(0).toInstant
    val wmBase = Seq(sideMax("view"), sideMax("click")).min
    val horizon = wmBase.minusSeconds(6 * 3600 + 600 + 60)
    val hlit = lit(java.sql.Timestamp.from(horizon)).cast("timestamp_ntz")
    val dueViews = batchFull
      .filter(col("click_id").isNull && col("view_ts") < hlit).select("view_id")
    val dueClicks = batchFull
      .filter(col("view_id").isNull && col("click_ts") < hlit).select("click_id")
    assert(dueViews.count() > 0 && dueClicks.count() > 0,
      "fixture must contain evictable rows on both sides")
    assert(dueViews.exceptAll(viewNullsStream).count() == 0)
    assert(dueClicks.exceptAll(clickNullsStream).count() == 0)
    full.unpersist(); batchFull.unpersist()
  }

  test("q50 session-window stream equals batch") {
    val batch = StreamingQueries.q50.run(spark, sf0001).collect().toSeq
    val stream = StreamingQueries.q50Streaming(spark, sf0001, ckpt()).collect().toSeq
    assert(stream == batch)
  }
}
