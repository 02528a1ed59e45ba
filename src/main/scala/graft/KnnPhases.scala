package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.KnnGraph

/** r18 optimization scratch harness: per-PHASE wall times of the persisted
  * kNN-index queries (q273/q278/q279/q281/q284 share build/save/serve
  * phases; the bench only sees their sum). Guide §1: measure first.
  * Not registered in SparkEntry; run with
  * `sbt "runMain graft.KnnPhases [sfDir]"`. */
object KnnPhases {
  private def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    val emb = Tables(spark, dir, "embeddings")
    // warm the scan + codegen paths once so phase 1 isn't JIT noise
    consume(emb.select(count(col("vec_id"))))

    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      val cs: Array[Array[Float]] = time("collect centroids") {
        emb.filter(col("vec_id") < 12)
          .orderBy("vec_id").select("embedding").collect()
          .map(_.getSeq[Float](0).toArray)
      }
      val edges = KnnGraph.build(emb, cs, degree = 12, nProbe = 3)
      time("q273.build(noop)") { consume(edges) }
      val name = "knnphase_idx"
      time("q273.saveIndex") {
        KnnGraph.saveIndex(edges, emb, cs, name, buckets = 8)
      }
      time("q273.serve(4 rounds)") {
        consume(KnnGraph.searchIndexed(spark, name,
          emb.filter(col("vec_id") < 5), topK = 3, beam = 16, rounds = 4)
          .select("q_id", "rk", "node").orderBy("q_id", "rk"))
      }
      val namePq = "knnphase_pq"
      time("q279.saveIndexPq") {
        KnnGraph.saveIndexPq(KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
          emb, cs, m = 8, dimsPer = 8, nCodebook = 8, cbStart = 12, namePq,
          buckets = 8)
      }
      time("q279.servePq(4 rounds)") {
        consume(KnnGraph.searchIndexedPq(spark, namePq,
          emb.filter(col("vec_id") < 5), topK = 3, beam = 16, rounds = 4,
          rerank = 8).select("q_id", "rk", "node").orderBy("q_id", "rk"))
      }
      // q284 phases
      val nameRb = "knnphase_rb"
      val base = emb.filter(col("vec_id") >= 30).select("vec_id", "embedding")
      time("q284.save@4") {
        KnnGraph.saveIndex(KnnGraph.build(base, cs, degree = 12, nProbe = 3),
          base, cs, nameRb, buckets = 4)
      }
      time("q284.ingestBatch") {
        graft.streaming.StreamingKnnIndex.ingestBatch(
          emb.filter(col("vec_id") < 30).select("vec_id", "embedding"),
          nameRb, cs, degree = 12, nProbe = 3, buckets = 4)
      }
      time("q284.rebucket->16") {
        KnnGraph.rebucket(spark, nameRb, cs, buckets = 16)
      }
      time("q284.serve") {
        consume(KnnGraph.searchIndexed(spark, nameRb,
          emb.filter(col("vec_id") < 5), topK = 3, beam = 16, rounds = 4)
          .select("q_id", "rk", "node").orderBy("q_id", "rk"))
      }
    }
    spark.stop()
  }
}
