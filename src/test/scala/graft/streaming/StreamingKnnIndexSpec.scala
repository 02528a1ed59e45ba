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

  test("at-least-once replay is a true no-op (full and partial)") {
    // foreachBatch replays a whole micro-batch on failure recovery;
    // ingestBatch's anti-join gate must make the replay a no-op instead
    // of duplicating node records / doubling neighbor lists
    val emb = Tables(spark, sf0001, "embeddings").select("vec_id", "embedding")
    val cs = emb.filter(col("vec_id") < 12).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val base = emb.filter(col("vec_id") >= 40)
    val b1 = emb.filter(col("vec_id") >= 20 && col("vec_id") < 40)
    val b2 = emb.filter(col("vec_id") < 20)
    try {
      KnnGraph.saveIndex(KnnGraph.build(base, cs, degree = 12, nProbe = 3),
        base, cs, "knn_replay_idx", buckets = 8)
      StreamingKnnIndex.ingestBatch(b1, "knn_replay_idx", cs, 12, 3, 8)
      def state() = {
        val nodes = spark.table("knn_replay_idx_nodes")
        (nodes.count(),
          StreamingKnnIndex.load(spark, "knn_replay_idx")._2
            .select("src", "rk", "dst").collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
      }
      val (rows0, edges0) = state()
      // FULL replay of b1: node count and edge set must be unchanged
      StreamingKnnIndex.ingestBatch(b1, "knn_replay_idx", cs, 12, 3, 8)
      val (rows1, edges1) = state()
      assert(rows1 == rows0, s"replay duplicated node records: $rows0 -> $rows1")
      assert(edges1 == edges0, "replay changed the edge set")
      // PARTIAL replay: b1 ∪ b2 after b1 already landed — only b2's
      // vectors enter, and the result equals the full rebuild
      StreamingKnnIndex.ingestBatch(b1.unionByName(b2), "knn_replay_idx",
        cs, 12, 3, 8)
      val got = StreamingKnnIndex.load(spark, "knn_replay_idx")._2
        .select("src", "rk", "dst")
      val want = KnnGraph.build(emb, cs, degree = 12, nProbe = 3)
        .select("src", "rk", "dst")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0, "partial replay diverged from rebuild")
      assert(spark.table("knn_replay_idx_nodes").count() == emb.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS knn_replay_idx_nodes")
      spark.sql("DROP TABLE IF EXISTS knn_replay_idx_entries")
      ()
    }
  }

  test("maintenance rewrites ONLY touched buckets; untouched files identical") {
    // the bucket-targeted write contract (saveIndexDelta): a micro-batch
    // must rewrite exactly the bkt partitions its touched/new/deleted
    // ids hash to — every other node-record FILE stays on disk with the
    // same path, length, and mtime. Fixture sized so the touched set
    // hashes into a proper subset of buckets: 600 nodes, 64 cells,
    // 256 buckets, a ONE-vector batch — a base src is touched when its
    // 3 probe cells intersect the batch's 3, ≈13% of the corpus here.
    val emb = Tables(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") < 600)
    val cs = emb.filter(col("vec_id") < 64).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val base = emb.filter(col("vec_id") >= 1)
    val batch = emb.filter(col("vec_id") < 1)
    def fileMap(): Map[String, (Long, Long)] = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "knn_delta_idx_nodes")
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(loc, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.startsWith("part-"))
          b += f.getPath.toString -> ((f.getLen, f.getModificationTime))
      }
      b.result()
    }
    def bktOf(path: String): Int =
      "bkt=(\\d+)".r.findFirstMatchIn(path).get.group(1).toInt
    try {
      KnnGraph.saveIndex(KnnGraph.build(base, cs, degree = 12, nProbe = 3),
        base, cs, "knn_delta_idx", buckets = 256)
      val before = fileMap()
      StreamingKnnIndex.ingestBatch(batch, "knn_delta_idx", cs, 12, 3, 256)
      val after = fileMap()
      // buckets whose files changed in ANY way (path set, length, mtime)
      val changedBkts = ((before.keySet diff after.keySet) ++
        (after.keySet diff before.keySet) ++
        before.keySet.intersect(after.keySet)
          .filter(p => before(p) != after(p))).map(bktOf)
      val untouchedBkts = before.keySet.map(bktOf) diff changedBkts
      assert(untouchedBkts.size >= 128,
        s"only ${untouchedBkts.size} of ~256 buckets untouched — the " +
          "write is not delta-bounded")
      // every node record that actually CHANGED lives in a rewritten
      // bucket (the delta covers the diff)...
      val bId = graft.sources.Bucketing.bucketId(col("vec_id"), 256)
      val full = KnnGraph.build(emb, cs, degree = 12, nProbe = 3)
      // ...and the maintained index equals the rebuild (the law, on the
      // partially-rewritten table)
      val got = StreamingKnnIndex.load(spark, "knn_delta_idx")._2
        .select("src", "rk", "dst")
      val want = full.select("src", "rk", "dst")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0, "delta write diverged from rebuild")
      val changedIds = spark.table("knn_delta_idx_nodes")
        .select(col("vec_id"), bId.as("bkt"))
        .filter(col("vec_id") < 1) // the new row, at minimum
        .collect().map(r => r.getInt(1))
      assert(changedIds.toSet.subsetOf(changedBkts),
        "a new node's bucket was not rewritten")
    } finally {
      spark.sql("DROP TABLE IF EXISTS knn_delta_idx_nodes")
      spark.sql("DROP TABLE IF EXISTS knn_delta_idx_entries")
      ()
    }
  }

  test("a bucket emptied by deletes is dropped, not left stale") {
    // dynamic partition overwrite skips partitions absent from the
    // replacement frame — saveIndexDelta must DROP a bkt partition whose
    // every row the changelog deleted, or its stale records survive
    val emb = Tables(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") < 600)
    val cs = emb.filter(col("vec_id") < 64).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val bId = graft.sources.Bucketing.bucketId(col("vec_id"), 256)
    // the delete set: EVERY id hashing to one specific bucket
    val victim = emb.select(bId.as("b")).head().getInt(0)
    val dels = emb.filter(bId === victim)
    assert(dels.count() >= 1)
    try {
      KnnGraph.saveIndex(KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
        emb, cs, "knn_empty_idx", buckets = 256)
      StreamingKnnIndex.applyChangelog(dels.withColumn("op", lit("D")),
        "knn_empty_idx", cs, degree = 12, nProbe = 3, buckets = 256)
      val left = spark.table("knn_empty_idx_nodes")
      assert(left.filter(col("bkt") === victim).count() == 0,
        "stale records survived in the emptied bucket")
      val survivors = emb.filter(bId =!= victim)
      val got = StreamingKnnIndex.load(spark, "knn_empty_idx")._2
        .select("src", "rk", "dst")
      val want = KnnGraph.build(survivors, cs, degree = 12, nProbe = 3)
        .select("src", "rk", "dst")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS knn_empty_idx_nodes")
      spark.sql("DROP TABLE IF EXISTS knn_empty_idx_entries")
      ()
    }
  }

  test("changelog apply ≡ rebuild over (B∖D)∪N; replacement path fires") {
    val emb = Tables(spark, sf0001, "embeddings").select("vec_id", "embedding")
    val cs = emb.filter(col("vec_id") < 12).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    try {
      KnnGraph.saveIndex(KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
        emb, cs, "knn_cdc_idx", buckets = 8)
      // D = vec_id ≥ 12, %9 = 4; N re-inserts D's even half (%18 = 4)
      // with the original vectors — the id-in-both REPLACEMENT path
      val d = emb.filter(col("vec_id") >= 12 &&
        pmod(col("vec_id"), lit(9L)) === 4).withColumn("op", lit("D"))
      val n = emb.filter(col("vec_id") >= 12 &&
        pmod(col("vec_id"), lit(18L)) === 4).withColumn("op", lit("I"))
      assert(d.count() > n.count() && n.count() > 0, "fixture sanity")
      StreamingKnnIndex.applyChangelog(d.unionByName(n), "knn_cdc_idx", cs,
        degree = 12, nProbe = 3, buckets = 8)
      val got = StreamingKnnIndex.load(spark, "knn_cdc_idx")._2
        .select("src", "rk", "dst")
      val survivors = emb.filter(col("vec_id") < 12 ||
        pmod(col("vec_id"), lit(18L)) =!= 13)
      val want = KnnGraph.build(survivors, cs, degree = 12, nProbe = 3)
        .select("src", "rk", "dst")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0)
      // replacement non-vacuity: every re-inserted id is back as a
      // source with a full edge list
      val reIds = n.select("vec_id").withColumnRenamed("vec_id", "src")
      assert(got.join(reIds, Seq("src"), "left_semi")
        .select("src").distinct().count() == n.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS knn_cdc_idx_nodes")
      spark.sql("DROP TABLE IF EXISTS knn_cdc_idx_entries")
      ()
    }
  }
}
