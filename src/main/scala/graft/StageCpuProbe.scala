package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.llm.KnnGraph

/** r19 optimization scratch harness (guide §1: measure first): per-STAGE
  * executor CPU/run attribution for one serving-family chain — KnnPhases
  * says which PHASE is slow, this says which STAGE inside it burns the
  * CPU. Not registered in SparkEntry; run with
  * `sbt "runMain graft.StageCpuProbe [sfDir]"`. */
object StageCpuProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(String, Int, Double, Double, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        stages += ((Option(si.details).getOrElse("").linesIterator
          .find(_.contains("graft")).getOrElse(si.name).take(120),
          si.numTasks, tm.executorCpuTime / 1e9, tm.executorRunTime / 1e3,
          tm.shuffleWriteMetrics.bytesWritten))
      }
    })
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = Tables(spark, dir, "embeddings")
    consume(emb.select(count(col("vec_id"))))
    println("corpus rows = " + emb.count())
    for (pass <- 1 to 2) {
      stages.clear()
      val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      val name = "cpuprobe_idx"
      val t0 = System.nanoTime()
      KnnGraph.saveIndex(KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
        emb, cs, name, buckets = 8)
      consume(KnnGraph.searchIndexed(spark, name,
        emb.filter(col("vec_id") < 5), topK = 3, beam = 16, rounds = 4)
        .select("q_id", "rk", "node").orderBy("q_id", "rk"))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener-bus drain (async stage-completed events)
      println(f"== pass $pass: q273 chain wall $wall%.2f s, " +
        f"stages ${stages.length}, cpu ${stages.map(_._3).sum}%.1f s ==")
      for ((nm, nt, cpu, run, sw) <- stages.sortBy(-_._3).take(20))
        println(f"  cpu=$cpu%6.2f run=$run%6.2f tasks=$nt%4d shufW=$sw%9d  $nm")
    }
    spark.stop()
  }
}
