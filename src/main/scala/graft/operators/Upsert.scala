package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog apply (CDC upsert-merge): materialize the LATEST STATE per
  * key from a base snapshot plus a stream of upserts and tombstones —
  * the MERGE INTO / compaction shape every mutable 100 TB table lives
  * by (Delta MERGE, Hudi copy-on-write, Kafka log compaction). An
  * update is a whole-row upsert; op = "D" is a tombstone that deletes
  * the key; a key never seen in base inserts.
  *
  * Determinism contract: rows order by (version, tombstone-rank) per
  * key and the LARGEST wins — versions should be unique per key (base
  * at version 0); at an equal version the tombstone outranks the
  * update (an explicit rank, NOT string order — 'D' < 'U'
  * lexicographically, the trap the spec pins), so delete-vs-update
  * races resolve the safe way, deterministically.
  *
  * Scale shape: ONE hash aggregate (`max_by` of the payload struct over
  * the (version, op) struct — partial aggregation absorbs hot keys
  * map-side; no sort, no window, no full-table shuffle beyond the
  * per-key combine). The changelog is typically ≪ base, but nothing
  * here assumes it: both sides stream through the same aggregate. */
object Upsert {

  val Tombstone = "D"

  /** Apply `changes` over `base`. Both inputs must share a schema:
    * `keyCols` ++ payload ++ (`versionCol`, `opCol`). Returns the
    * surviving rows (latest non-tombstone per key) with the winning
    * version and payload. */
  def apply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"schema mismatch: base ${base.columns.mkString(",")} vs " +
        s"changes ${changes.columns.mkString(",")}")
    val all = base.unionByName(changes)
    val payload = all.columns.filterNot(c =>
      keyCols.contains(c) || c == versionCol || c == opCol)
    val ord = struct(col(versionCol),
      when(col(opCol) === Tombstone, lit(1)).otherwise(lit(0)))
    val latest = all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((payload :+ versionCol :+ opCol).map(col): _*), ord).as("w"))
    latest
      .filter(col(s"w.$opCol") =!= Tombstone)
      .select(keyCols.map(col) ++
        payload.map(c => col(s"w.$c").as(c)) :+
        col(s"w.$versionCol").as(versionCol): _*)
  }
}
