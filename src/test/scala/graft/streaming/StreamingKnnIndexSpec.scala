package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.llm.KnnGraph

/** B37 × the graph-ANN family: streaming maintenance of the persisted
  * k-NN index ≡ its batch-sequential rendering ≡ the full rebuild —
  * the q67/q81/q91/q116 parity convention, with the rebuild
  * equivalence coming from the exact upsert law (q269) composed per
  * micro-batch. Also pins the medoid entry table and the serving
  * composition (searchIndexed over the maintained index ≡ in-memory
  * search over a fresh build). */
class StreamingKnnIndexSpec extends SparkSpec {

  test("streaming maintenance ≡ batch-sequential ≡ full rebuild; serving composes") {
    val emb = Tables(spark, sf0001, "embeddings").select("vec_id", "embedding")
    val cs = emb.filter(col("vec_id") < 12).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val base = emb.filter(col("vec_id") >= 60)
    val b1 = emb.filter(col("vec_id") >= 30 && col("vec_id") < 60)
    val b2 = emb.filter(col("vec_id") < 30)
    try {
      // batch-sequential rendering: the SAME ingestBatch code
      KnnGraph.saveIndex(KnnGraph.build(base, cs, degree = 12, nProbe = 3),
        base, cs, "knn_seq_idx", buckets = 8)
      StreamingKnnIndex.ingestBatch(b1, "knn_seq_idx", cs, 12, 3, 8)
      StreamingKnnIndex.ingestBatch(b2, "knn_seq_idx", cs, 12, 3, 8)
      // streaming rendering over real micro-batches (one file each)
      KnnGraph.saveIndex(KnnGraph.build(base, cs, degree = 12, nProbe = 3),
        base, cs, "knn_stream_idx", buckets = 8)
      val dir = Files.createTempDirectory("graft-knn-stream-").toString
      b1.coalesce(1).write.mode("append").parquet(dir)
      b2.coalesce(1).write.mode("append").parquet(dir)
      val q = StreamingKnnIndex.ingest(
          spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1).parquet(dir),
          "knn_stream_idx", cs, degree = 12, nProbe = 3, buckets = 8,
          checkpointDir = Files.createTempDirectory("graft-knn-ckpt-").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val full = KnnGraph.build(emb, cs, degree = 12, nProbe = 3)
        .select("src", "rk", "dst").localCheckpoint(true)
      def edgesOf(name: String) = StreamingKnnIndex.load(spark, name)._2
        .select("src", "rk", "dst")
      for (name <- Seq("knn_seq_idx", "knn_stream_idx")) {
        val got = edgesOf(name)
        assert(got.exceptAll(full).count() == 0 &&
          full.exceptAll(got).count() == 0, s"$name diverged from rebuild")
      }
      // medoid entry points maintained alongside the edges
      val entGot = spark.table("knn_stream_idx_entries")
        .orderBy("node").collect().map(_.getLong(0)).toSeq
      val entWant = KnnGraph.entryPoints(emb, cs)
        .orderBy("node").collect().map(_.getLong(0)).toSeq
      assert(entGot == entWant)
      // serving composes with the maintained index: bucket-pruned
      // search over it ≡ in-memory search over the fresh rebuild
      val queries = emb.filter(col("vec_id") < 5)
      val mem = KnnGraph.search(KnnGraph.build(emb, cs, 12, 3), emb,
          queries, KnnGraph.entryPoints(emb, cs),
          topK = 3, beam = 16, rounds = 4)
        .select("q_id", "rk", "node").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val idx = KnnGraph.searchIndexed(spark, "knn_stream_idx", queries,
          topK = 3, beam = 16, rounds = 4)
        .select("q_id", "rk", "node").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(idx == mem)
    } finally {
      for (t <- Seq("knn_seq_idx_nodes", "knn_seq_idx_entries",
          "knn_stream_idx_nodes", "knn_stream_idx_entries"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
