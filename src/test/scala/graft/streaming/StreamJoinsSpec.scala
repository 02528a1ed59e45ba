package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

class StreamJoinsSpec extends SparkSpec {

  private def runAppend(df: org.apache.spark.sql.DataFrame, name: String) = {
    df.writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory(s"ck-$name-").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    spark.table(name)
  }

  test("stream-static enrichment equals the batch join") {
    val stream = StreamingQueries.eventsStream(spark, sf0001)
    val users = Tables(spark, sf0001, "customer").select("c_custkey", "c_mktsegment")
    val out = runAppend(
      StreamJoins.enrichWithUsers(stream, users).select("event_id", "c_mktsegment"),
      "enriched")
    val batch = StreamJoins.enrichWithUsers(
        Tables(spark, sf0001, "events"), users)
      .select("event_id", "c_mktsegment")
    assert(out.count() == batch.count())
    assert(out.exceptAll(batch).count() == 0)
  }

  test("watermarked stream-stream self-join equals the batch time-range join") {
    val win = 300 // 5 minutes
    val stream = StreamingQueries.eventsStream(spark, sf0001)
    val out = runAppend(
      StreamJoins.pairsWithin(stream, win).select("a_id", "b_id"), "pairs")
    val batchPairs = StreamJoins.pairsWithin(
        Tables(spark, sf0001, "events"), win)
      .select("a_id", "b_id")
    assert(out.count() > 0)
    assert(out.count() == batchPairs.count())
    assert(out.exceptAll(batchPairs).count() == 0)
  }
}
