package graft.llm
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val edges = KnnGraph.build(emb, cs, degree = 12, nProbe = 3)
    println(edges.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
