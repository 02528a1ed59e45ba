package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** B30 seeded sampling properties (the engine-internal Bernoulli sampler has
  * no oracle; these bound it). Note the sampler is seeded PER PARTITION: the
  * row set is deterministic for a fixed seed AND input layout — repartition
  * legitimately changes it, which is why the reproducible cross-engine
  * variant (q40) samples by key instead. */
class SampleSpec extends SparkSpec {

  private lazy val li = Tables(spark, sf0001, "lineitem").select("l_orderkey", "l_linenumber")

  test("same seed, same layout -> identical sample; different seed moves it") {
    val a = li.sample(withReplacement = false, 0.1, seed = 42L)
    val b = li.sample(withReplacement = false, 0.1, seed = 42L)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val c = li.sample(withReplacement = false, 0.1, seed = 43L)
    assert(c.exceptAll(a).count() > 0, "a new seed should select different rows")
  }

  test("sampled fraction lands inside the binomial 4-sigma band") {
    val n = li.count().toDouble
    val k = li.sample(withReplacement = false, 0.1, seed = 42L).count().toDouble
    val sigma = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(k - 0.1 * n) <= 4 * sigma,
      s"sampled $k of $n (expected ${0.1 * n} +- ${4 * sigma})")
  }

  test("without replacement, the sample is a multiset subset of the input") {
    val s = li.sample(withReplacement = false, 0.1, seed = 42L)
    // exceptAll is multiset-aware: a row sampled more often than it occurs
    // in the input (i.e. any replacement) would survive the subtraction
    assert(s.exceptAll(li).count() == 0, "sample must be a subset")
  }
}
