package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — apply a row-level changelog to a
  * PERSISTED per-key aggregate without rescanning the base table: the
  * materialized-view delta refresh a 100 TB warehouse runs nightly
  * (Gupta & Mumick 1995's classic self-maintainability result: SUM and
  * COUNT are self-maintainable under inserts AND deletes; MIN/MAX are
  * self-maintainable under inserts but need a base re-check when a
  * delete removes the group's current extremum).
  *
  * The CDC plane applies changelogs to ROWS ([[Upsert]] for state,
  * [[ScdMerge]] for history); this is the missing AGGREGATE member.
  * Correctness contract, certified the q252 way (the engine maintains
  * while the oracle rebuilds): refresh(agg(S₀), changelog) ≡ agg(S₁).
  *
  * Column contract (documented, not parameterized — the operator IS
  * the schema): `agg0` = key, cnt, sum_v, mn, mx (a groupBy(key)
  * count/sum/min/max over S₀); `changelog` = key, v, op ("I" insert /
  * "D" delete, deletes referencing existing base rows); `base1` =
  * key, v — the POST-change base S₁, touched ONLY for dirty groups.
  *
  * Scale shape: the changelog folds to one row per touched key (hash
  * aggregate, map-side combine), joins the aggregate full-outer on
  * key — |agg| rows, never |base|. cnt/sum are pure deltas for EVERY
  * group. Only groups where a delete ties the stored extremum
  * (del_min ≤ mn or del_max ≥ mx — conservative: a tie on a
  * duplicated extremum may rescan needlessly, never wrongly) re-check
  * min/max, via a BROADCAST semi-join of the dirty-key set against
  * base1 — at 100 TB that is the partition-pruning probe side, so the
  * base scan touches only affected groups' partitions. A group whose
  * maintained count reaches 0 vanishes, exactly as agg(S₁) drops it.
  *
  * Enforced (the assert_true discipline, not assumed): a delete for a
  * key the aggregate has never seen fails loudly — it would silently
  * fabricate negative counts. */
object AggMaintain {

  def refresh(agg0: DataFrame, changelog: DataFrame, base1: DataFrame,
      keyCol: String): DataFrame = {
    val d = changelog.groupBy(keyCol).agg(
      sum(when(col("op") === "I", 1L).otherwise(-1L)).as("dcnt"),
      sum(when(col("op") === "I", col("v")).otherwise(-col("v"))).as("dsum"),
      min(when(col("op") === "I", col("v"))).as("ins_mn"),
      max(when(col("op") === "I", col("v"))).as("ins_mx"),
      min(when(col("op") === "D", col("v"))).as("del_mn"),
      max(when(col("op") === "D", col("v"))).as("del_mx"))
    val j = agg0.join(d, Seq(keyCol), "full_outer")
      .filter(assert_true(col("del_mn").isNull || col("mn").isNotNull,
        lit("AggMaintain.refresh: delete for a key absent from agg0 — " +
          "the changelog must reference existing base rows")).isNull)
      .withColumn("cnt1",
        coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
      // over-deleting an EXISTING key (more deletes than base rows)
      // would drive cnt1 negative and silently vanish the group at the
      // cnt1 > 0 filters below — fail loudly instead (the q268 bucket
      // discipline: a corrupted changelog is an error, not a drop)
      .filter(assert_true(col("cnt1") >= 0,
        lit("AggMaintain.refresh: changelog deletes exceed the group's " +
          "maintained count — deletes must reference existing base rows"))
        .isNull)
      .withColumn("sum1",
        coalesce(col("sum_v"), lit(0L)) + coalesce(col("dsum"), lit(0L)))
      .withColumn("is_dirty", col("del_mn").isNotNull &&
        (col("del_mn") <= col("mn") || col("del_mx") >= col("mx")))
    // clean groups: min/max fold in inserts only (least/greatest skip
    // nulls, so untouched and new-key groups share the expression)
    val clean = j.filter(!col("is_dirty") && col("cnt1") > 0)
      .select(col(keyCol), col("cnt1").as("cnt"), col("sum1").as("sum_v"),
        least(col("mn"), col("ins_mn")).as("mn"),
        greatest(col("mx"), col("ins_mx")).as("mx"),
        lit(0L).as("dirty"))
    // dirty groups: per-group extremum re-check against S₁, restricted
    // to exactly those keys (broadcast probe → partition pruning)
    val dirtyKeys = j.filter(col("is_dirty") && col("cnt1") > 0)
      .select(col(keyCol), col("cnt1"), col("sum1"))
    val re = base1
      .join(broadcast(dirtyKeys.select(col(keyCol))), Seq(keyCol), "left_semi")
      .groupBy(keyCol).agg(min("v").as("mn"), max("v").as("mx"))
    val dirty = dirtyKeys.join(re, Seq(keyCol))
      .select(col(keyCol), col("cnt1").as("cnt"), col("sum1").as("sum_v"),
        col("mn"), col("mx"), lit(1L).as("dirty"))
    clean.unionByName(dirty)
  }
}
