package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** r19: rebucket passes node records, codebook, and entries through
  * WITHOUT the unpack→re-encode→repack round-trip (the r18 shape
  * exploded nbrs to edges, re-aggregated, and re-encoded every PQ code
  * through the unchanged codebook — all to reproduce the rows already
  * on disk). Pins the PQ side the existing rebucket spec (non-PQ
  * q284 shape) does not cover: record CONTENT is row-identical across
  * the re-layout, and PQ serving is bit-identical. */
class KnnRebucketPqSpec extends SparkSpec {

  test("PQ rebucket: records, codes, codebook, entries all pass through") {
    val emb = Tables(spark, sf0001, "embeddings")
    val cs = emb.filter(col("vec_id") < 12).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val queries = emb.filter(col("vec_id") < 5)
    KnnGraph.saveIndexPq(KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
      emb, cs, m = 8, dimsPer = 8, nCodebook = 8, cbStart = 12,
      "knn_rbpq_spec", buckets = 4)
    try {
      def snap(t: String, cols: String*) = spark.table(t)
        .select(cols.map(col): _*).collect()
        .map(_.toSeq.map {
          case s: Seq[_] => s.toList
          case x => x
        }).toSet
      def nodes() = snap("knn_rbpq_spec_nodes",
        "vec_id", "embedding", "codes", "nbrs")
      def serve() = KnnGraph.searchIndexedPq(spark, "knn_rbpq_spec",
          queries, topK = 3, beam = 16, rounds = 4, rerank = 8)
        .select("q_id", "rk", "node", "sim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val (n0, cb0, e0, s0) = (nodes(),
        snap("knn_rbpq_spec_cb", "m", "j", "sub"),
        snap("knn_rbpq_spec_entries", "node"), serve())
      KnnGraph.rebucket(spark, "knn_rbpq_spec", cs, buckets = 16)
      // row-identical content (embedding, CODES — never re-encoded —
      // and nbrs), only the id→file mapping changed
      assert(nodes() == n0, "rebucket changed node record content")
      assert(snap("knn_rbpq_spec_cb", "m", "j", "sub") == cb0,
        "rebucket changed the codebook")
      assert(snap("knn_rbpq_spec_entries", "node") == e0,
        "rebucket changed the entry medoids")
      assert(serve() == s0, "rebucket changed PQ serving results")
      // and the new layout is real: 16-bucket spec + bkt partitions
      val bspec = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("knn_rbpq_spec_nodes"))
        .bucketSpec
      assert(bspec.exists(_.numBuckets == 16), s"bucket spec: $bspec")
    } finally {
      for (t <- Seq("knn_rbpq_spec_nodes", "knn_rbpq_spec_entries",
          "knn_rbpq_spec_cb"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
