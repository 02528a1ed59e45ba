package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.TextAnalysis

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftFunctions.register(spark)

  test("known entropies: uniform, constant, empty, null") {
    registered()
    val rows = Seq("aabb", "abcd", "aaaa", "", null)
      .toDF("t")
      .select(TextAnalysis.charEntropy(col("t")).as("h"))
      .collect()
    assert(rows(0).getDouble(0) == 1.0) // two symbols, p=1/2 each
    assert(rows(1).getDouble(0) == 2.0) // four symbols, p=1/4 each
    assert(rows(2).getDouble(0) == 0.0) // one symbol
    assert(rows(3).getDouble(0) == 0.0) // zero symbols
    assert(rows(4).isNullAt(0))         // null in, null out
  }

  test("counts code points, not UTF-16 units: a surrogate pair is one symbol") {
    registered()
    // U+1D11E (musical G clef) is a surrogate PAIR in UTF-16. Two clefs +
    // two 'a's = two symbols at p=1/2 → H = 1.0. A UTF-16-unit counter
    // would see three symbols (hi, lo, 'a') at p=(1/3,1/3,1/3) ≈ 1.585.
    val h = Seq("𝄞𝄞aa").toDF("t")
      .select(TextAnalysis.charEntropy(col("t")).as("h"))
      .head().getDouble(0)
    assert(h == 1.0)
  }

  test("matches the explode→groupBy formulation on fixture documents") {
    registered()
    val docs = Tables(spark, sf0001, "documents")
      .filter(length(col("text")) > 0 && col("doc_id") < 64)
    val rowLocal = docs.select(
      col("doc_id"), round(TextAnalysis.charEntropy(col("text")), 9).as("h"))
    // the shuffle-heavy oracle shape (fixture text is BMP-only, so the
    // UTF-16 split("") is code-point-faithful here)
    val exploded = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg(round(-sum((col("c") / col("n")) *
        log(2.0, col("c") / col("n"))), 9).as("h"))
    assert(rowLocal.except(exploded).isEmpty && exploded.except(rowLocal).isEmpty)
  }

  test("char_entropy is usable from SQL after registration") {
    registered()
    val h = spark.sql("SELECT char_entropy('abab') AS h").head().getDouble(0)
    assert(h == 1.0)
  }
}
