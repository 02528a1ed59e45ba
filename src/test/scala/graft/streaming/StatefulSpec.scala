package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatefulSpec extends SparkSpec {

  test("multi-batch state with negative values keeps the latest sum, not the max") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-neg-").toString
    // three files -> maxFilesPerTrigger=1 forces three micro-batches; the
    // later batches DECREASE user 1's running sum
    Seq((1L, 10.0), (2L, 5.0)).toDF("user_id", "value").write.parquet(s"$dir/f1")
    Seq((1L, -4.0)).toDF("user_id", "value").write.parquet(s"$dir/f2")
    Seq((1L, -3.0)).toDF("user_id", "value").write.parquet(s"$dir/f3")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
    val res = Stateful.runToCompletion(stream, "neg_stats",
        java.nio.file.Files.createTempDirectory("graft-neg-ckpt-").toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res(1L) == ((3L, 3.0)), s"latest state expected (3, 3.0), got ${res(1L)}")
    assert(res(2L) == ((1L, 5.0)))
  }

  test("transformWithState (state-v2) equals mapGroupsWithState and batch") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val res = Stateful.runToCompletion(
        StreamingQueries.eventsStream(spark, sf0001), "user_stats_v2",
        Files.createTempDirectory("graft-state2-ckpt-").toString, v2 = true)
      val batch = Tables(spark, sf0001, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      val joined = res.as("s").join(batch.as("b"), "user_id")
      assert(res.count() == batch.count())
      assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() == 0)
      assert(joined.filter(
        abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count() == 0)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("mapGroupsWithState running stats equal the batch aggregate") {
    val stream = StreamingQueries.eventsStream(spark, sf0001)
    val res = Stateful.runToCompletion(
      stream, "user_stats",
      Files.createTempDirectory("graft-state-ckpt-").toString)

    val batch = Tables(spark, sf0001, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

    val joined = res.as("s").join(batch.as("b"), "user_id")
    assert(res.count() == batch.count())
    assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() == 0)
    // double sums may differ in accumulation order across micro-batches
    assert(joined.filter(
      abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count() == 0)
  }
}
