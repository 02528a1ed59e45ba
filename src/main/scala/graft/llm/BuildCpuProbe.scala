package graft.llm

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** r19 optimization scratch harness (guide §1): bisect the kNN build/save
  * chain's CPU — replicates [[KnnGraph]]'s private sided/scorePairs frames
  * step by step and times each increment under a per-stage CPU listener.
  * Not registered in SparkEntry; `sbt "runMain graft.llm.BuildCpuProbe"`. */
object BuildCpuProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val phase = new java.util.concurrent.atomic.AtomicReference[String]("warm")
    val acc = mutable.Map[String, (Double, Double, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val tm = e.stageInfo.taskMetrics
        val k = phase.get()
        val (c, r, n) = acc.getOrElse(k, (0.0, 0.0, 0L))
        acc(k) = (c + tm.executorCpuTime / 1e9,
          r + tm.executorRunTime / 1e3, n + e.stageInfo.numTasks)
      }
    })
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      Thread.sleep(800); phase.set(label)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(800)
      println(f"[probe] $label%-24s wall ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val emb = Tables(spark, dir, "embeddings")
    consume(emb.select(count(col("vec_id"))))
    val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)

    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      acc.clear()
      // replicate build's internals
      val pr = KnnGraph.probeAssign(
        graft.operators.Parallelism.spread(emb), cs, 3).select("vec_id", "cell")
      val sided = pr.join(emb.select(col("vec_id"), col("embedding"),
        Similarity.dotFast(col("embedding"), col("embedding")).as("n")),
        Seq("vec_id"))
      val a = sided.select(col("cell"), col("vec_id").as("src"),
        col("embedding").as("sv"), col("n").as("sn"))
      val b = sided.select(col("cell"), col("vec_id").as("dst"),
        col("embedding").as("dv"), col("n").as("dn"))
      val p = spark.sessionState.conf.numShufflePartitions
      val s = 8
      val salts = broadcast(
        spark.range(s).select(col("id").cast("int").as("salt")))
      val aS = a.withColumn("salt", pmod(hash(col("src")), lit(s)))
      val bS = b.crossJoin(salts)
      val keys = Seq("cell", "salt")
      val joined = aS.repartition(p, keys.map(col): _*)
        .join(bS.repartition(p, keys.map(col): _*), keys)
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          (Similarity.dotFast(col("sv"), col("dv")) /
            sqrt(col("sn") * col("dn"))).as("sim"))
      time("A join+score only") { consume(joined) }
      val deduped = joined.repartition(p, col("src"))
        .groupBy("src", "dst").agg(max("sim").as("sim"))
      time("B +repart+dedup") { consume(deduped) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(col("sim").desc, col("dst"))
      val edges = deduped.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 12).select("src", "rk", "dst", "sim")
      time("C +window cut (=build)") { consume(edges) }
      val adj = edges.groupBy(col("src").as("vec_id"))
        .agg(sort_array(collect_list(struct(col("rk"), col("dst"), col("sim"))))
          .as("nbrs"))
      val nodes = emb.select("vec_id", "embedding").join(adj, Seq("vec_id"), "left")
      time("D +adjacency+join") { consume(nodes) }
      time("E saveIndex (write)") {
        KnnGraph.saveIndex(KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
          emb, cs, "cpuprobe2_idx", buckets = 8)
      }
      Thread.sleep(1000)
      println(f"${"phase"}%-24s ${"cpu_s"}%8s ${"run_s"}%8s ${"tasks"}%6s")
      for ((k, (c, r, n)) <- acc.toSeq.sortBy(_._1))
        println(f"$k%-24s $c%8.2f $r%8.2f $n%6d")
    }
    spark.stop()
  }
}
