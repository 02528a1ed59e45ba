package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot drift with CHANGED-COLUMN attribution — the data-ops
  * operator one step past q113's corpus diff (which answers "which
  * keys changed"): for every key, WHAT changed — `added` / `removed` /
  * `changed` with the exact column list — the report a pipeline run
  * publishes after rewriting a 100 TB table, and the validation a CDC
  * feed (q208) is checked against.
  *
  * Null semantics: column comparison is NULL-SAFE (`<=>` / IS NOT
  * DISTINCT FROM), so null→value and value→null both attribute as
  * changes and null→null does not. Unchanged keys are omitted (the
  * interesting-rows contract — at 100 TB the report must be
  * diff-sized, not table-sized).
  *
  * Scale shape: ONE full-outer hash join on the key; attribution is
  * row-local array arithmetic (no second pass, no per-column joins). */
object Drift {

  /** (key, status ∈ added|removed|changed, changed_cols sorted array) —
    * `cols` are the payload columns to compare (present in both). */
  def changedColumns(before: DataFrame, after: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one payload column")
    val b = before.select((key +: cols).map(c => col(c).as(s"b_$c")): _*)
      .withColumnRenamed(s"b_$key", key)
    val a = after.select((key +: cols).map(c => col(c).as(s"a_$c")): _*)
      .withColumnRenamed(s"a_$key", key)
    // presence comes from a pre-join sentinel, NOT payload nullness — a
    // row whose payload is all null still exists on its side
    val tagged = b.withColumn("__inb", lit(true))
      .join(a.withColumn("__ina", lit(true)), Seq(key), "full_outer")
    val changed = array(cols.map(c =>
      when(!(col(s"b_$c") <=> col(s"a_$c")), lit(c))
        .otherwise(lit(null).cast("string"))): _*)
    tagged
      // attribution only makes sense when BOTH sides exist; added/removed
      // rows carry an empty list, not "every column changed vs null"
      .withColumn("changed_cols",
        when(col("__inb").isNotNull && col("__ina").isNotNull,
          array_sort(filter(changed, x => x.isNotNull)))
          .otherwise(array().cast("array<string>")))
      .withColumn("status",
        when(col("__inb").isNull, lit("added"))
          .when(col("__ina").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .filter(col("status") =!= "changed" || size(col("changed_cols")) > 0)
      .select(col(key), col("status"), col("changed_cols"))
  }
}
