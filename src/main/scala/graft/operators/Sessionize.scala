package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gaps-and-islands labels on an event stream.
  *
  * [[graft.streaming.StreamingQueries]] q50 AGGREGATES sessions
  * (one row per session); this operator LABELS events: every input row
  * comes back with its `(session_id, event_seq)` — the primitive behind
  * conversation threading, clickstream featurization, and
  * session-grained training-example assembly, where the downstream op
  * needs the events themselves grouped, not their summary.
  *
  * Session contract matches q50 / Spark's `session_window`: a new session
  * starts when the gap since the PREVIOUS event is ≥ the inactivity
  * timeout (an event exactly `gap` later belongs to a NEW session).
  * `session_id` is dense per key starting at 1 in time order;
  * `event_seq` restarts at 1 within each session. Ties on the timestamp
  * are totally ordered by `event_id` so the labeling is deterministic.
  *
  * Scale shape: ONE shuffle on the session key, one sort — the gap flag
  * (lag), the session counter (running sum of flags), and the
  * within-session sequence (running row_number minus the session-start
  * row_number, via a running conditional max) plan as stacked Window
  * operators over the SAME partitioning/ordering, so no re-exchange and
  * no re-sort between them (PLANS.md q101: three Window nodes, one
  * Exchange); no self-join and no second window keyed on the
  * not-yet-known (key, session_id). Per-key volume is the natural
  * partition grain; a years-long hot key serializes its own timeline
  * (inherent to sessionization's sequential semantics) but never blocks
  * other keys.
  */
object Sessionize {

  def sessionize(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      gap: String = "30 minutes"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSession = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) >= lag(col(tsCol), 1).over(w) + expr(s"INTERVAL $gap"),
      1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("__rn", row_number().over(w))
      .withColumn("session_id", sum(col("__new")).over(run))
      .withColumn("event_seq",
        (col("__rn") - max(when(col("__new") === 1L, col("__rn"))).over(run) + 1)
          .cast("int"))
      .drop("__new", "__rn")
  }
}
