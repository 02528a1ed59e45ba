package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Exactly-once file-sink semantics: a restarted query resumes from its
  * checkpoint and does not re-emit already-committed input — the durability
  * contract that makes a 100 TB/day ingest pipeline restartable. */
class ResumeSpec extends SparkSpec {

  test("restart from checkpoint emits no duplicates; new files are picked up") {
    val in = Files.createTempDirectory("graft-resume-in-").toString
    val out = Files.createTempDirectory("graft-resume-out-").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft-resume-ckpt-").toString
    import spark.implicits._

    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // the file source lists *files*, not subdirs — stage each batch as a
    // single flat parquet file
    def addBatch(name: String, ids: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory("graft-resume-stage-").resolve("w")
      ids.toDF("id").coalesce(1).write.parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }

    addBatch("batch1", Seq(1L, 2L, 3L))
    runOnce()
    assert(spark.read.parquet(out).count() == 3)

    // restart with NO new input: nothing re-emitted
    runOnce()
    assert(spark.read.parquet(out).count() == 3)

    // restart with one new file: only the delta lands
    addBatch("batch2", Seq(4L, 5L))
    runOnce()
    val rows = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(rows.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }
}
