package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q267's sketch set algebra (Beyer et al. 2007): union = merge-and-
  * truncate, intersection via the Jaccard of kept values. */
class KmvSetAlgebraSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val P = 1000000007L
  // keys are SPREAD like q267's user-day keys (k·48271 must wrap p many
  // times — sequential small keys make an arithmetic progression, not a
  // pseudo-uniform draw, and the kth-minimum estimator needs uniformity)
  private def key(i: Long): Long = i * 1000003L
  private def h(k: Long): Long = ((k % P) * 48271L) % P

  private def kmv(keys: Seq[Long], k: Int = 64): Seq[Long] =
    keys.map(h).distinct.toDF("h")
      .agg(expr(s"kmv_minhashes(h, $k)")).as[Seq[Long]].head()

  private def estimates(ka: Seq[Long], kb: Seq[Long], k: Int = 64)
      : (Long, Long) = {
    val ku = (ka ++ kb).distinct.sorted.take(k)
    val estU = if (ku.size < k) ku.size.toLong
      else ((k - 1).toLong * P) / ku(k - 1)
    val kBoth = ku.count(x => ka.contains(x) && kb.contains(x))
    // divide by |ku|, not k: exact in the sub-k regime (q267's rule)
    (estU, kBoth * estU / ku.size)
  }

  test("sub-k sets: union AND intersection estimates are exact") {
    val a = (1L to 30L).map(key)
    val b = (21L to 50L).map(key)
    val (estU, estI) = estimates(kmv(a), kmv(b))
    assert(estU == a.union(b).distinct.size)
    assert(estI == a.intersect(b).size)
  }

  test("past k: both estimates land within 25% of truth at k=64") {
    // 50% planted overlap, 4000 ∪ 4000 keys — relative error ~1/√k ≈
    // 12.5%; the 25% bar is 2σ
    val a = (1L to 4000L).map(key)
    val b = (2001L to 6000L).map(key)
    val (estU, estI) = estimates(kmv(a), kmv(b))
    val trueU = 6000.0
    val trueI = 2000.0
    assert(math.abs(estU - trueU) / trueU <= 0.25, s"union est $estU")
    assert(math.abs(estI - trueI) / trueI <= 0.25, s"intersect est $estI")
  }

  test("disjoint sets: intersection estimate is exactly zero") {
    val (_, estI) = estimates(kmv((1L to 3000L).map(key)),
      kmv((10001L to 13000L).map(key)))
    assert(estI == 0L)
  }

  test("union algebra ≡ sketch of the union (merge-and-truncate law)") {
    val a = (1L to 3000L).map(key)
    val b = (1500L to 4500L).map(key)
    val merged = (kmv(a) ++ kmv(b)).distinct.sorted.take(64)
    assert(merged == kmv((a ++ b).distinct))
  }
}
