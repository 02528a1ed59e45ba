package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated blobs; blob A carries planted near-identical pairs
  private def fixture = {
    def v(x: Float, y: Float) = Array(x, y, 0f, 0f)
    Seq(
      (1L, v(1f, 0.00f)), (2L, v(1f, 0.01f)),   // near-dup pair (cos ~ 1)
      (3L, v(0.6f, 0.8f)),                      // same half-space, distinct
      (10L, v(-1f, 0.00f)), (11L, v(-1f, -0.01f)), // near-dup pair, blob B
      (12L, v(-0.6f, -0.8f))).toDF("vec_id", "embedding")
  }

  test("semdedup: within-cell pairs are true near-dups; planted pairs found") {
    val p = SemDedup.pairs(fixture, k = 2, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // precision is structural (codegen cosine rerank): only the planted
    // pairs clear 0.99
    assert(p.toSet == Set((1L, 2L), (10L, 11L)))
    // every emitted pair really is a brute near-dup pair (subset property)
    val brute = Similarity.cosineNearDupPairs(fixture, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.toSet.subsetOf(brute))
  }

  test("semdedup survivors: keep-smallest-id rule, idempotent") {
    val s1 = SemDedup.survivors(fixture, k = 2, minCosine = 0.99)
    assert(s1.select("vec_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 10L, 12L))
    // fixed point: re-deduping the survivors changes nothing
    val s2 = SemDedup.survivors(s1, k = 2, minCosine = 0.99)
    assert(s2.select("vec_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 10L, 12L))
  }

  test("semdedup recall on the planted corpus stays high vs brute") {
    val planted = graft.ScaleStress.replicateEmbeddings(
        graft.Tables(spark, sf0001, "embeddings")
          .filter(pmod(col("vec_id"), lit(8L)) === 0L),
      r = 3, eps = 0.10)
      .select("vec_id", "embedding")
    val brute = Similarity.cosineNearDupPairs(planted, minCosine = 0.9)
      .select("id_a", "id_b")
    val got = SemDedup.pairs(planted, k = 8, minCosine = 0.9)
      .select("id_a", "id_b")
    val nBrute = brute.count()
    assert(nBrute > 0, "fixture must contain true near-dup pairs")
    val hit = got.intersect(brute).count()
    // cluster-boundary losses are the documented trade; on a replica-
    // planted corpus (tight dups) recall must stay high
    assert(hit.toDouble / nBrute >= 0.8,
      s"semdedup recall ${hit.toDouble / nBrute} below 0.8 ($hit/$nBrute)")
  }
}
