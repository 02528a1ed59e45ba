package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("blob decode: byte statistics match the payload exactly") {
    val docs = Seq((7L, "AbZ")).toDF("doc_id", "text")
    val out = Multimodal.decode(Multimodal.asBlobs(docs)).collect().head
    assert(out.doc_id == 7L)
    assert(out.n_bytes == 3L)
    assert(out.first_byte == 'A'.toLong)
    assert(out.last_byte == 'Z'.toLong)
    assert(out.byte_sum == ('A'.toInt + 'b'.toInt + 'Z'.toInt).toLong)
  }

  test("decode is distributed: partition count preserved through mapPartitions") {
    val docs = graft.Tables(spark, sf0001, "documents").repartition(3)
    val decoded = Multimodal.decode(Multimodal.asBlobs(docs))
    assert(decoded.rdd.getNumPartitions == 3)
    assert(decoded.count() == docs.count())
  }
}
