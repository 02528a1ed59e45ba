package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.Similarity

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftFunctions.register(spark)

  test("codegen vector_dot is bit-identical to the HOF fold on fixture embeddings") {
    registered()
    val e = Tables(spark, sf0001, "embeddings")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea")).filter(col("ia") < 40)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb")).filter(col("ib") < 40)
    val both = a.crossJoin(b).select(
      Similarity.dot(col("ea"), col("eb")).as("hof"),
      Similarity.dotFast(col("ea"), col("eb")).as("gen"))
    assert(both.filter(!(col("hof") <=> col("gen"))).count() == 0)
  }

  test("null semantics: null array, null element, length mismatch → null") {
    registered()
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)),          // 11.0
      (Array(1f, 2f), Array(3f))               // length mismatch
    ).toDF("a", "b")
      .union(Seq((null.asInstanceOf[Array[Float]], Array(1f))).toDF("a", "b"))
      .select(Similarity.dotFast(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))

    val withNullElem = Seq((Seq(Some(1f), None), Seq(Some(1f), Some(2f)))).toDF("a", "b")
      .select(Similarity.dotFast(col("a"), col("b")).as("d")).collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("vector_dot is usable from SQL after registration") {
    registered()
    Tables(spark, sf0001, "embeddings").createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT round(vector_dot(embedding, embedding), 4) AS n FROM emb_v WHERE vec_id = 0")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 0.01) // unit vectors
  }

  test("int8 sides: byte×byte and mixed byte×float dot, with null propagation") {
    registered()
    // Seq[Byte] (not Array[Byte], which encodes as BinaryType) -> array<tinyint>
    val b = (xs: Seq[Int]) => xs.map(_.toByte)
    val df = Seq(
      (b(Seq(1, 2, 3)), b(Seq(4, 5, 6)), Array(4f, 5f, 6f))
    ).toDF("qa", "qb", "f")
      .select(
        Similarity.dotFast(col("qa"), col("qb")).as("ii"),
        Similarity.dotFast(col("qa"), col("f")).as("if_"),
        Similarity.dotFast(col("f"), col("qa")).as("fi"))
      .head()
    assert(df.getDouble(0) == 32.0) // 4+10+18
    assert(df.getDouble(1) == 32.0)
    assert(df.getDouble(2) == 32.0)
    // negative bytes and length mismatch
    val neg = Seq((b(Seq(-127, 127)), b(Seq(1, 1)), b(Seq(1, 1, 1))))
      .toDF("a", "bb", "c")
      .select(
        Similarity.dotFast(col("a"), col("bb")).as("d"),
        Similarity.dotFast(col("a"), col("c")).as("m"))
      .head()
    assert(neg.getDouble(0) == 0.0)
    assert(neg.isNullAt(1))
  }

  test("wrong argument types fail analysis with the expression's message") {
    registered()
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(Similarity.dotFast(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("vector_dot") || err.getMessage.contains("DATATYPE"))
  }
}
