package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001, "embeddings")

  test("cosine top-k: sims within [-1,1], no self-matches, k per query") {
    val res = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 3), k = 5).collect()
    assert(res.length == 15)
    assert(res.forall(r => r.getDouble(3) >= -1.0001 && r.getDouble(3) <= 1.0001))
    assert(res.forall(r => r.getLong(0) != r.getLong(2)))
    // ranks descend in similarity per query
    res.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.sameElements(byRank.sorted(Ordering[Double].reverse)))
    }
  }

  test("cosine near-dup pairs: each-direction-once, threshold exact, values match topk scoring") {
    val pairs = Similarity.cosineNearDupPairs(emb, minCosine = 0.2).collect()
    assert(pairs.nonEmpty)
    // strictly ordered ids — no symmetric duplicates, no self-pairs
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.2))
    // cross-check one pair's similarity against the independent HOF scoring
    val r = pairs.head
    def vec(id: Long): Seq[Double] =
      emb.filter(col("vec_id") === id).head().getSeq[Float](1).map(_.toDouble)
    val a = vec(r.getLong(0))
    val b = vec(r.getLong(1))
    val cos = a.zip(b).map { case (x, y) => x * y }.sum /
      math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(math.abs(BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble -
      r.getDouble(2)) <= 1e-9)
  }

  test("ANN LSH recalls >= 90% of exact L2 pairs within threshold") {
    val threshold = 1.3
    val exact = Similarity.exactL2Pairs(emb, threshold).select("id_a", "id_b")
    val n = exact.count()
    assert(n > 0, "threshold should capture some pairs")
    val ann = Similarity.annCandidates(emb, threshold, numHashTables = 6).select("id_a", "id_b")
    val found = exact.intersect(ann).count()
    assert(found.toDouble / n >= 0.9, s"recall ${found.toDouble / n} ($found/$n)")
  }
}
