package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pins the q204 contract: a mergeSchema scan over parquet generations
  * unions by NAME (not position) and nulls columns predating their
  * generation. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema: added column nulls v1 rows; reordered v2 matches by name") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_evo_spec").toString
    Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
      .write.parquet(s"$base/gen1")
    // v2 adds lang AND reorders: positional matching would misbind
    Seq(("fr", 3L, 30L)).toDF("lang", "doc_id", "n_chars")
      .write.parquet(s"$base/gen2")
    val got = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen1", s"$base/gen2")
      .select("doc_id", "n_chars", "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, null), (2L, 20L, null), (3L, 30L, "fr")))
    // without mergeSchema, Spark picks one file's schema — the lang
    // column is NOT guaranteed; the option is load-bearing, pin it
    val plain = spark.read.parquet(s"$base/gen1", s"$base/gen2")
    assert(plain.columns.toSet.subsetOf(Set("doc_id", "n_chars", "lang")))
    // a conflicting TYPE for the same name must fail loudly, not coerce
    Seq((4, 40L)).toDF("doc_id", "n_chars") // doc_id int vs long
      .withColumn("doc_id", col("doc_id").cast("int"))
      .write.parquet(s"$base/gen3")
    val ex = intercept[Exception] {
      spark.read.option("mergeSchema", "true")
        .parquet(s"$base/gen1", s"$base/gen3").collect()
    }
    assert(ex.getMessage != null)
  }
}
