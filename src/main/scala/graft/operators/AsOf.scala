package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (B9): for each left row, the right row with the greatest
  * right-ts ≤ left-ts (or < when `strict`) within the same key.
  *
  * Implementation is the union+window pattern (SURVEY B9): tag both sides,
  * union, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over (key, ts, tag). Cost profile at scale: ONE
  * shuffle on the key (the window sort), versus a range-join's quadratic
  * per-key blowup — this is the formulation that survives 100 TB, because
  * both inputs stream through a single sort-merge pass per key.
  *
  * Tag ordering encodes the boundary semantics:
  *  - inclusive (≤): right rows sort BEFORE left rows at equal ts, so a left
  *    row sees a same-timestamp right row;
  *  - strict (<): left rows sort first, so it doesn't.
  */
object AsOf {

  /** @param left      left table
    * @param right     right table
    * @param key       equi-key column name (present in both)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (renamed `asof_<name>`)
    * @param strict    true → match requires right.ts < left.ts
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    // one struct column per side keeps the union schema stable
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      struct(leftCols.map(col): _*).as("__left"),
      lit(null).cast(structType(right, payload, rightTs)).as("__right"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(structType(left, leftCols, leftTs)).as("__left"),
      struct((payload :+ rightTs).distinct.map(col): _*).as("__right"))

    val tagOrder = if (strict) col("__tag").desc else col("__tag").asc
    // Deterministic tie rule: when several right rows share (key, ts), the
    // GREATEST payload struct wins (struct comparison is field-order
    // lexicographic). Without this third ordering column, `last(...,
    // ignoreNulls)` picks whichever tied right row the sort happened to
    // place last — nondeterministic across runs/partitionings. Left rows
    // all carry null __right, so asc_nulls_first keeps them inert and
    // cannot disturb the tag-encoded boundary semantics.
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, tagOrder, col("__right").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__asof", last(col("__right"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val out = leftCols.map(c => col(s"__left.$c").as(c)) ++
      (payload :+ rightTs).distinct.map(c => col(s"__asof.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String], ts: String) = {
    val picked = (cols :+ ts).distinct
    org.apache.spark.sql.types.StructType(
      picked.map(c => df.schema(c)))
  }
}
