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

  test("q50 session-window stream equals batch") {
    val batch = StreamingQueries.q50.run(spark, sf0001).collect().toSeq
    val stream = StreamingQueries.q50Streaming(spark, sf0001, ckpt()).collect().toSeq
    assert(stream == batch)
  }
}
