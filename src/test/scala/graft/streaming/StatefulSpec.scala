package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatefulSpec extends SparkSpec {

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
