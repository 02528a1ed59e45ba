package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful streaming (B43): a per-key running aggregate via
  * `mapGroupsWithState` — the escape hatch when windowed built-ins can't
  * express the state machine.
  *
  * State is one small case class per key, so the state store grows with
  * |keys|, not |events| — the property that keeps this bounded on an
  * unbounded 100 TB/day stream (add a timeout to retire idle keys when the
  * key space itself is unbounded).
  */
object Stateful {

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(count: Long, sum: Double)
  final case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  final case class UserExtremes(
      user_id: Long, n_events: Long, min_value: Double, max_value: Double)

  /** The oracle-checkable B43 form (q59): same mapGroupsWithState state
    * machine, but folding count/min/max — order-independent and FP-exact,
    * so the result hash-matches a SQL GROUP BY in any engine (a sum of
    * doubles would carry accumulation-order noise). `mapGroupsWithState`
    * runs on BATCH Datasets too (each group visited once), which is what
    * lets the driver value-check the operator itself, not just
    * stream↔batch parity. */
  def userExtremes(events: DataFrame): Dataset[UserExtremes] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double, Double), UserExtremes](
        GroupStateTimeout.NoTimeout) {
        (uid, batch, state: GroupState[(Long, Double, Double)]) =>
          val prev = state.getOption
            .getOrElse((0L, Double.PositiveInfinity, Double.NegativeInfinity))
          val next = batch.foldLeft(prev) { case ((n, mn, mx), e) =>
            (n + 1, math.min(mn, e.value), math.max(mx, e.value))
          }
          state.update(next)
          UserExtremes(uid, next._1, next._2, next._3)
      }
  }

  /** Running (count, sum) per user over a stream of events. */
  def runningUserStats(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserStats](GroupStateTimeout.NoTimeout) {
        (uid, batch, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val next = batch.foldLeft(prev) { (s, e) => UserState(s.count + 1, s.sum + e.value) }
          state.update(next)
          UserStats(uid, next.count, next.sum)
      }
  }

  /** The same running aggregate on Spark 4's state-v2 API
    * (`transformWithState` + typed `ValueState`) — the successor surface to
    * `mapGroupsWithState`: explicit named state variables with per-state
    * TTL, timers, and a RocksDB-backed store (state-v2 requires the
    * RocksDB provider; set
    * `spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`
    * on the session). Parity with the v1 operator and with batch is
    * asserted in StatefulSpec. */
  class UserStatsProcessor extends StatefulProcessor[Long, UserEvent, UserStats] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState](
        "userState", Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserStats] = {
      val prev = if (state.exists()) state.get() else UserState(0L, 0.0)
      val next = rows.foldLeft(prev) { (s, e) =>
        UserState(s.count + 1, s.sum + e.value)
      }
      state.update(next)
      Iterator.single(UserStats(key, next.count, next.sum))
    }
  }

  /** [[runningUserStats]] on the state-v2 API. */
  def runningUserStatsV2(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Run the stateful query over a bounded stream to completion; returns the
    * final per-user stats (update-mode memory sink keeps the latest row per
    * key emitted in the last batch that touched it). */
  def runToCompletion(
      events: DataFrame, name: String, checkpoint: String,
      v2: Boolean = false): DataFrame = {
    val stats = if (v2) runningUserStatsV2(events) else runningUserStats(events)
    StreamingQueries.runToTable(stats.toDF(), name, checkpoint, "update")
    val spark = events.sparkSession
    // AvailableNow may split input into several micro-batches; the memory
    // sink then holds one row per (key, batch) — keep each key's LATEST
    // state. n_events is strictly monotonic per key, so it orders the
    // batches; max_by keeps sum_value from the same (latest) row — a bare
    // max(sum_value) would return a stale intermediate when later batches
    // add negative values.
    spark.table(name)
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.max("n_events").as("n_events"),
        org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.col("sum_value"),
          org.apache.spark.sql.functions.col("n_events")).as("sum_value"))
  }
}
