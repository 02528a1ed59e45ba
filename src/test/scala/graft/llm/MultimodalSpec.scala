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

  test("frame sampling keeps every stride-th frame and drops the ragged tail") {
    // 10 bytes, 3-byte frames -> frames 0..2 (tail byte dropped); stride 2 -> 0, 2
    val docs = Seq((1L, "ABCDEFGHIJ")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(Multimodal.asBlobs(docs),
      frameBytes = 3, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.forall(_.n_bytes == 3L))
    assert(frames(0).byte_sum == ('A' + 'B' + 'C').toLong)
    assert(frames(1).byte_sum == ('G' + 'H' + 'I').toLong)
    // payload shorter than one frame -> zero rows (the 0..n contract)
    val tiny = Seq((2L, "AB")).toDF("doc_id", "text")
    assert(Multimodal.frameSample(Multimodal.asBlobs(tiny), 3, 1).count() == 0)
  }

  test("resize pools to a fixed number of bins regardless of payload size") {
    val docs = Seq((1L, "AAAABBBB"), (2L, "AB")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.asBlobs(docs), bins = 4)
      .collect().map(r => r.doc_id -> r.bins).toMap
    assert(out(1L).length == 4 && out(2L).length == 4)
    assert(out(1L).toSeq == Seq('A'.toDouble, 'A'.toDouble, 'B'.toDouble, 'B'.toDouble))
    // 2-byte payload into 4 bins: two empty buckets pool to 0.0
    assert(out(2L).count(_ == 0.0) == 2)
  }
}
