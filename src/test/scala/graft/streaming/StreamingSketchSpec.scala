package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.GraftFunctions

/** B13 × B37: the r16 quantile sketch is a TypedImperativeAggregate,
  * so a streaming groupBy runs it through the STATE path — the buffer
  * serialize/deserialize/merge cycle — rather than one in-memory fold.
  * Parity with batch pins that cycle (a serialization bug shows up as
  * a bucket-count drift the exact-counts contract cannot hide), and a
  * two-batch incremental run pins merge across micro-batches. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("streaming qsketch (complete mode) ≡ batch, across micro-batches") {
    val dir = Files.createTempDirectory("graft-sketch-").toString
    val rows1 = (1 to 4000).map(i => (i % 3, ((i.toLong * 48271L) % 99991L)))
    val rows2 = (1 to 3000).map(i => (i % 3, ((i.toLong * 2654435761L) % 99991L)))
    rows1.toDF("g", "v").write.mode("append").parquet(dir)
    rows2.toDF("g", "v").write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(rows1.toDF("g", "v").schema)
      // one file per micro-batch: the sketch state must MERGE across
      // batches, not just within one
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .groupBy("g").agg(expr("qsketch_buckets(v)").as("sk"))
      .select(col("g"), explode(col("sk")).as("bk"))
      .select(col("g"), col("bk.k"), col("bk.m"), col("bk.c"))
    val q = stream.writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-").toString)
      .start()
    q.awaitTermination()
    val streamed = spark.table("sketch_stream")
      .as[(Int, Int, Int, Long)].collect().sorted.toSeq
    val batch = (rows1 ++ rows2).toDF("g", "v")
      .groupBy("g").agg(expr("qsketch_buckets(v)").as("sk"))
      .select(col("g"), explode(col("sk")).as("bk"))
      .select(col("g"), col("bk.k"), col("bk.m"), col("bk.c"))
      .as[(Int, Int, Int, Long)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(streamed.map(_._4).sum == 7000L, "exact counts must total the input")
  }
}
