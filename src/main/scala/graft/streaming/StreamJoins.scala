package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins (the B37–B44 surface's join corner).
  *
  *  - stream⋈static: the dimension side is a plain DataFrame; Spark
  *    broadcasts it per micro-batch — the streaming rendering of "broadcast
  *    the dims" (B7). No state store involved.
  *  - stream⋈stream: both sides buffered in the state store; the watermark +
  *    time-range join condition bounds retention — without the range bound
  *    the state grows forever on an unbounded stream (the 100 TB/day
  *    failure mode).
  */
object StreamJoins {

  /** Enrich an event stream with a static user dimension. */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
      broadcast(users),
      events("user_id") === users("c_custkey"),
      "left")

  /** Self-join: pair each event with events of the same user in the
    * following `windowSeconds` — both sides watermarked, join condition
    * time-bounded so state is droppable. */
  def pairsWithin(events: DataFrame, windowSeconds: Int): DataFrame = {
    val a = events.select(
        col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"))
      .withWatermark("a_ts", "1 hour")
    val b = events.select(
        col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"))
      .withWatermark("b_ts", "1 hour")
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
  }
}
