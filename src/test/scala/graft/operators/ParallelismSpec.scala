package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ParallelismSpec extends SparkSpec {

  test("a 1-split scan is spread to the session's shuffle parallelism") {
    val docs = Tables(spark, sf0001, "documents") // single small parquet file
    assert(docs.rdd.getNumPartitions < 4, "fixture unexpectedly multi-split")
    val spreadDf = Parallelism.spread(docs)
    val target = spark.sessionState.conf.numShufflePartitions
    assert(spreadDf.rdd.getNumPartitions == target)
    // rows pass through unchanged
    assert(spreadDf.count() == docs.count())
  }

  test("scan-with-projection-and-filter still qualifies as a narrow scan") {
    val df = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") > 10)
    assert(Parallelism.spread(df).rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
  }

  test("composed plans (join/agg) are returned untouched — no exchange, no eager stages") {
    // the contract that keeps spread safe under AQE: materializing the RDD
    // of a plan WITH exchanges executes its stages at plan-build time, so
    // spread must decline before ever touching .rdd
    val docs = Tables(spark, sf0001, "documents")
    val agg = docs.groupBy("lang").count()
    assert(Parallelism.spread(agg) eq agg)
    val joined = docs.join(docs.select(col("doc_id")), "doc_id")
    assert(Parallelism.spread(joined) eq joined)
  }

  test("an input that is already parallel enough is returned untouched") {
    val wide = Tables(spark, sf0001, "documents")
      .repartition(spark.sessionState.conf.numShufflePartitions)
    // repartition output is not a narrow scan either — declined on shape
    assert(Parallelism.spread(wide) eq wide)
  }
}
