package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftFunctions.register(spark)

  private def assign(cs: Array[Array[Float]]) =
    call_function(GraftFunctions.NearestCentroidName,
      col("embedding"), typedlit(cs))

  test("codegen argmin equals the driver-side brute argmin on fixture embeddings") {
    registered()
    val cs = Tables(spark, sf0001, "embeddings")
      .select(col("embedding"), xxhash64(col("vec_id"), lit(7L)).as("h"))
      .orderBy("h").limit(8)
      .collect().map(_.getSeq[Float](0).toArray)
    val norms = cs.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val got = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"), assign(cs).as("cell"))
      .collect()
    got.foreach { r =>
      val x = r.getSeq[Float](1).toArray
      val ds = cs.indices.map { c =>
        var dot = 0.0
        var i = 0
        while (i < x.length) { dot += x(i).toDouble * cs(c)(i).toDouble; i += 1 }
        norms(c) - 2.0 * dot
      }
      val want = ds.indexOf(ds.min) // first index at the min = lowest-id tie rule
      assert(r.getInt(2) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("ties break to the lowest centroid index") {
    registered()
    // two identical centroids: every vector is equidistant from both
    val cs = Array(Array(1f, 0f), Array(1f, 0f))
    val cells = Seq(Tuple1(Array(0.3f, 0.9f)), Tuple1(Array(-1f, 2f)))
      .toDF("embedding")
      .select(assign(cs).as("cell")).as[Int].collect().toSeq
    assert(cells == Seq(0, 0))
  }

  test("null semantics: null array, null element, dim mismatch, empty matrix → null") {
    registered()
    val cs = Array(Array(1f, 0f))
    val df = Seq(Tuple1(Array(1f, 2f)), Tuple1(Array(1f, 2f, 3f)))
      .toDF("embedding")
      .union(Seq(Tuple1(null.asInstanceOf[Array[Float]])).toDF("embedding"))
      .select(assign(cs).as("cell")).collect()
    assert(df(0).getInt(0) == 0)
    assert(df(1).isNullAt(0)) // dim mismatch
    assert(df(2).isNullAt(0)) // null array
    val nullElem = Seq(Tuple1(Seq(Some(1f), None))).toDF("embedding")
      .select(assign(cs).as("cell")).collect()
    assert(nullElem(0).isNullAt(0))
    val empty = Seq(Tuple1(Array(1f, 2f))).toDF("embedding")
      .select(call_function(GraftFunctions.NearestCentroidName,
        col("embedding"), typedlit(Array.empty[Array[Float]])).as("cell"))
      .collect()
    assert(empty(0).isNullAt(0))
  }
}
