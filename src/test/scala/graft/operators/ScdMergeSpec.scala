package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ScdMergeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[(Long, Long, Option[Long],
      Option[String], Option[Long])] =
    df.select(col("k").cast("long"), col("gen_from").cast("long"),
        col("gen_to").cast("long"), col("st"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getAs[String]("st")),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2)).toSeq

  // the incremental-apply law, the operator's whole contract:
  // merge(build(0..g-1), snap_g) == build(0..g)
  test("law: merge of generation g equals the full rebuild through g") {
    // key 1: changes at every generation; key 2: never changes;
    // key 3: changes only at g=3; key 4: first appears at g=3;
    // key 5: null attr at g<3, value at g=3 (null-safe boundary)
    def snap(g: Long): DataFrame = {
      val rows = Seq(
        Some((1L, g, s"s$g")),
        Some((2L, 0L, "const")),
        Some((3L, if (g >= 3) 9L else 0L, "x")),
        if (g >= 3) Some((4L, 7L, "new")) else None,
        Some((5L, 0L, if (g >= 3) "filled" else null))
      ).flatten
      rows.toDF("k", "v", "st").withColumn("g", lit(g))
    }
    val stack012 = snap(0).unionByName(snap(1)).unionByName(snap(2))
    val stack0123 = stack012.unionByName(snap(3))
    val rebuilt = Scd.type2History(stack0123, "k", "g", Seq("st", "v"))
    val merged = ScdMerge.merge(
      Scd.type2History(stack012, "k", "g", Seq("st", "v")),
      snap(3).drop("g"), "k", Seq("st", "v"), 3L)
    assert(canon(merged) == canon(rebuilt))
  }

  test("equal attrs extend the open run; absent keys are untouched") {
    val hist = Seq((1L, 0L, Option.empty[Long], "a", 1L),
        (2L, 0L, Option(3L), "old", 9L),
        (2L, 3L, Option.empty[Long], "b", 2L))
      .toDF("k", "gen_from", "gen_to", "st", "v")
    // snap carries key 1 unchanged; key 2 is absent
    val snap = Seq((1L, "a", 1L)).toDF("k", "st", "v")
    val out = ScdMerge.merge(hist, snap, "k", Seq("st", "v"), 5L)
    assert(canon(out) == canon(hist), "no change and no absence-close: " +
      "snapshots are states, a disappearance is not a change")
  }

  test("a same-generation replay is rejected, not silently applied") {
    // double-running a nightly load would emit an empty [g,g) interval
    // plus a duplicate gen_from=g row — the monotonicity contract is
    // enforced in-plan
    val hist = Seq((1L, 3L, Option.empty[Long], "a", 1L))
      .toDF("k", "gen_from", "gen_to", "st", "v")
    val snap = Seq((1L, "b", 2L)).toDF("k", "st", "v")
    intercept[Exception] {
      ScdMerge.merge(hist, snap, "k", Seq("st", "v"), 3L).collect()
    }
  }

  test("a changed attr closes at g and opens a new current interval") {
    val hist = Seq((1L, 0L, Option.empty[Long], "a", 1L))
      .toDF("k", "gen_from", "gen_to", "st", "v")
    val snap = Seq((1L, "a", 2L)).toDF("k", "st", "v")
    val out = canon(ScdMerge.merge(hist, snap, "k", Seq("st", "v"), 4L))
    assert(out == Seq(
      (1L, 0L, Some(4L), Some("a"), Some(1L)),
      (1L, 4L, None, Some("a"), Some(2L))))
  }
}
