package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — "how deep into view → click → purchase
  * did each user get, IN ORDER?": the product-analytics staple that
  * needs SUBSEQUENCE semantics (a purchase before any view must not
  * count), i.e. SQL MATCH_RECOGNIZE's most common case, which Spark
  * lacks as a primitive.
  *
  * Formulation: ONE window pass, no self-joins — stage i's cumulative
  * flag is `max(type = stage_i AND flag_{i-1})` over the user's ordered
  * prefix, so a stage-i event only counts once every earlier stage has
  * fired strictly before it; the per-user depth is then one hash
  * aggregate over the flags. A k-stage funnel over the naive
  * formulation is k chained aggregate-join rounds; this is one window
  * + one aggregate regardless of k.
  *
  * Ordering is total — (ts, tiebreak) — so reruns are deterministic on
  * tied timestamps.
  *
  * Scale shape: one user-keyed window shuffle (state per row is k
  * bits), one aggregate with map-side combine. */
object Funnel {

  /** (user, n_events, stage) — stage = deepest prefix of `stages`
    * completed in order (0 = none). */
  def depth(events: DataFrame, userCol: String, typeCol: String,
      orderCols: Seq[Column], stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    // a repeated stage name would let ONE event satisfy two consecutive
    // stages (the cumulative frame includes the current row), breaking
    // the strictly-before invariant — reject rather than miscount
    require(stages.distinct.size == stages.size,
      s"stages must be distinct: ${stages.mkString(",")}")
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    var prevFlag: Option[Column] = None
    val flagCols = stages.zipWithIndex.map { case (st, i) =>
      val name = s"__f$i"
      val hit = prevFlag match {
        case None    => col(typeCol) === st
        case Some(p) => col(typeCol) === st && p === 1
      }
      df = df.withColumn(name, max(when(hit, 1).otherwise(0)).over(w))
      prevFlag = Some(col(name))
      name
    }
    // flags are monotone per row (stage i can only fire after i-1 has),
    // so the row's depth is simply the flag sum
    val stageExpr = flagCols.map(col(_)).reduce(_ + _)
    df.withColumn("__stage", stageExpr)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("__stage")).cast("int").as("stage"))
  }

  /** Conversion latency for users who complete the WHOLE funnel: the
    * time from the first stage-1 event to the first event that closes
    * the last stage in order (NOT the first last-stage event — a
    * purchase before the funnel completed does not convert). Same one
    * window pass as [[depth]]; emits (user, convert_us) in exact
    * microseconds. */
  def conversionLatency(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tiebreak: Column, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "latency needs at least two stages")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct: ${stages.mkString(",")}")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    var prevFlag: Option[Column] = None
    val hits = stages.zipWithIndex.map { case (st, i) =>
      val flag = s"__f$i"
      val hitName = s"__hit$i"
      val hit = prevFlag match {
        case None    => col(typeCol) === st
        case Some(p) => col(typeCol) === st && p === 1
      }
      df = df.withColumn(hitName, when(hit, 1).otherwise(0))
        .withColumn(flag, max(col(hitName)).over(w))
      prevFlag = Some(col(flag))
      hitName
    }
    df.groupBy(col(userCol))
      .agg(
        min(when(col(hits.head) === 1, unix_micros(col(tsCol)))).as("t0"),
        min(when(col(hits.last) === 1, unix_micros(col(tsCol)))).as("t1"))
      .filter(col("t1").isNotNull)
      .select(col(userCol), (col("t1") - col("t0")).as("convert_us"))
  }
}
