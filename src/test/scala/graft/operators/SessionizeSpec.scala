package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))

  test("sessionize: gap >= timeout starts a new session; seq restarts") {
    // user 1: events at 0s, 100s, 1900s (gap exactly 1800 -> NEW session,
    // the q50 session_window contract), 2000s
    val events = mk(Seq(
      (1L, 1L, 0L), (2L, 1L, 100L), (3L, 1L, 1900L), (4L, 1L, 2000L),
      (5L, 2L, 50L)))
    val out = Sessionize.sessionize(events, gap = "30 minutes")
      .orderBy("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1), (2L, 1L, 1L, 2),   // first session, seq 1..2
      (3L, 1L, 2L, 1), (4L, 1L, 2L, 2),   // gap == 1800s starts session 2
      (5L, 2L, 1L, 1)))                   // other key unaffected
  }

  test("sessionize: timestamp ties are totally ordered by event_id") {
    val events = mk(Seq((7L, 1L, 100L), (6L, 1L, 100L), (8L, 1L, 100L)))
    val out = Sessionize.sessionize(events)
      .orderBy("event_seq").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getInt(4)))
    assert(out.toSeq == Seq((6L, 1L, 1), (7L, 1L, 2), (8L, 1L, 3)))
    // repartitioned input yields the identical labeling
    val again = Sessionize.sessionize(events.repartition(5))
      .orderBy("event_seq").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getInt(4)))
    assert(again.toSeq == out.toSeq)
  }

  test("sessionize labels re-aggregate to exactly session_window's sessions") {
    // real fixture: the label operator and Spark's session_window must
    // carve identical sessions (same >= gap contract)
    val events = graft.Tables(spark, sf0001, "events")
      .select("event_id", "user_id", "ts")
    val fromLabels = Sessionize.sessionize(events, gap = "30 minutes")
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"),
        (max(col("ts")) + expr("INTERVAL 30 minutes")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("session_start", "session_end", "user_id", "n_events")
    val fromWindows = graft.streaming.StreamingQueries
      .sessionWindows(events, "30 minutes")
    assert(fromLabels.exceptAll(fromWindows).count() == 0)
    assert(fromWindows.exceptAll(fromLabels).count() == 0)
  }
}
