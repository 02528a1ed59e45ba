package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class VectorMeanSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001, "embeddings")

  test("vector_mean equals the posexplode-avg formulation") {
    val viaUdaf = emb.groupBy("label")
      .agg(VectorMean.column(col("embedding")).as("m"))
      .select(col("label"), posexplode(col("m")).as(Seq("i", "v")))
      .select(col("label"), col("i"), round(col("v"), 6).as("v"))
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "e")))
      .groupBy("label", "i")
      .agg(round(avg(col("e").cast("double")), 6).as("v"))
    assert(viaUdaf.exceptAll(viaExplode).count() == 0 &&
      viaExplode.exceptAll(viaUdaf).count() == 0)
  }

  test("vector_mean of a single vector is the vector itself") {
    val one = emb.filter(col("vec_id") === 0)
    val m = one.agg(VectorMean.column(col("embedding"))).head()
      .getSeq[Double](0)
    val raw = one.head().getSeq[Float](1).map(_.toDouble)
    assert(m.zip(raw).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("vector_mean is registered for SQL and matches the column form") {
    VectorMean.register(spark)
    emb.createOrReplaceTempView("emb_vm")
    val viaSql = spark.sql(
      "SELECT label, vector_mean(embedding) AS m FROM emb_vm GROUP BY label")
    val viaCol = emb.groupBy("label")
      .agg(VectorMean.column(col("embedding")).as("m"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
  }

  test("empty group yields an empty array, ragged input is rejected") {
    import spark.implicits._
    val empty = emb.filter(col("vec_id") < 0)
    val r = empty.agg(VectorMean.column(col("embedding"))).head()
    assert(r.getSeq[Double](0).isEmpty)
    val ragged = Seq(Array(1f, 2f), Array(1f, 2f, 3f)).toDF("embedding")
    val e = intercept[Exception](
      ragged.agg(VectorMean.column(col("embedding"))).head())
    assert(e.getMessage != null)
  }
}
