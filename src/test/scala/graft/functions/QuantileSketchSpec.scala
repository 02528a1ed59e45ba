package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("bucket rule hand-computed: exact below 1000, top-3-digits above") {
    // (value, k, m)
    val cases = Seq(
      (0L, 0, 0), (7L, 0, 7), (999L, 0, 999),
      (1000L, 1, 100), (1234L, 1, 123), (9999L, 1, 999),
      (10000L, 2, 100), (123456L, 3, 123),
      (999999999999999999L, 15, 999),
      (Long.MaxValue, 16, 922))
    for ((v, k, m) <- cases) {
      val key = QuantileSketch.bucketKey(v)
      assert((key / 1000L).toInt == k && (key % 1000L).toInt == m,
        s"v=$v -> key=$key, expected k=$k m=$m")
      val lo = QuantileSketch.lowerBound(key)
      assert(lo <= v, s"lower bound $lo must not exceed $v")
      // ≤1% relative width: v < lo + 10^k and lo ≥ 100·10^k for k ≥ 1
      if (k >= 1) assert(v - lo < QuantileSketch.Pows(k))
    }
  }

  test("negative values are rejected, not silently bucketed") {
    intercept[IllegalArgumentException](QuantileSketch.bucketKey(-1L))
    val df = Seq(-5L).toDF("v")
    intercept[Exception] {
      df.agg(expr("qsketch_buckets(v)")).collect()
    }
  }

  test("sketch counts are exact per bucket; nulls skipped; empty -> []") {
    val df = Seq[java.lang.Long](5L, 5L, 1234L, 1250L, null)
      .toDF("v")
    val sk = df.agg(expr("qsketch_buckets(v)").as("sk"))
      .selectExpr("inline(sk)").as[(Int, Int, Long)].collect().toSet
    // 5 twice -> (0,5,2); 1234 and 1250 share bucket (1,12x)? no:
    // m(1234)=123, m(1250)=125 — separate buckets
    assert(sk == Set((0, 5, 2L), (1, 123, 1L), (1, 125, 1L)))
    val empty = Seq.empty[Long].toDF("v")
      .agg(expr("qsketch_buckets(v)").as("sk"))
      .selectExpr("size(sk)").as[Int].head()
    assert(empty == 0)
  }

  test("merge is lossless under any partitioning: sketch(union) ≡ sums") {
    val vs = (1 to 5000).map(i => (i.toLong * i) % 77777L)
    // one partition vs 16 vs per-batch two-level: identical bucket arrays
    def sketchOf(parts: Int): Seq[(Int, Int, Long)] =
      vs.toDF("v").repartition(parts)
        .agg(expr("qsketch_buckets(v)").as("sk"))
        .selectExpr("inline(sk)").as[(Int, Int, Long)].collect().toSeq
    val one = sketchOf(1)
    assert(one == sketchOf(16), "partial-aggregation merge must be exact")
    // relational merge (explode + re-sum) of 4 batch sketches ≡ direct
    val merged = vs.zipWithIndex.map { case (v, i) => (v, i % 4) }
      .toDF("v", "b")
      .groupBy("b").agg(expr("qsketch_buckets(v)").as("sk"))
      .select(explode(col("sk")).as("bk"))
      .groupBy(col("bk.k").as("k"), col("bk.m").as("m"))
      .agg(sum(col("bk.c")).as("c"))
      .orderBy("k", "m").as[(Int, Int, Long)].collect().toSeq
    assert(one == merged, "relational explode+re-sum merge must be exact")
  }

  test("weighted sketch ≡ sketch of w-times-replicated rows; contracts hold") {
    val rows = Seq((10L, 3L), (1500L, 2L), (1500L, 0L), (77L, 5L))
    val weighted = rows.toDF("v", "w")
      .agg(expr("qsketch_buckets(v, w)").as("sk"))
      .selectExpr("inline(sk)").as[(Int, Int, Long)].collect().toSet
    val replicated = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
      .toDF("v").agg(expr("qsketch_buckets(v)").as("sk"))
      .selectExpr("inline(sk)").as[(Int, Int, Long)].collect().toSet
    assert(weighted == replicated)
    // zero weight was a no-op (1500 has weight 2, not 2+0-ish noise)
    assert(weighted.contains((1, 150, 2L)))
    intercept[Exception] {
      Seq((5L, -1L)).toDF("v", "w")
        .agg(expr("qsketch_buckets(v, w)")).collect()
    }
    // the point of the weighted form: under a long tail the mass p50
    // sits far above the doc-count p50 (one huge value is half the mass)
    val skew = Seq.fill(99)(10L) :+ 100000L
    def p50(df: org.apache.spark.sql.DataFrame, agg: String): Long = {
      val sk = df.agg(expr(agg).as("sk")).selectExpr("inline(sk)")
        .as[(Int, Int, Long)].collect()
        .sortBy { case (k, m, _) => QuantileSketch.lowerBound(k.toLong * 1000 + m) }
      val n = sk.map(_._3).sum
      var cum = 0L
      sk.collectFirst { case (k, m, c) if { cum += c; 100 * cum >= 50 * n } =>
        QuantileSketch.lowerBound(k.toLong * 1000 + m) }.get
    }
    val d = skew.toDF("v")
    assert(p50(d, "qsketch_buckets(v)") == 10L)
    assert(p50(d, "qsketch_buckets(v, v)") == 100000L)
  }

  test("turnstile maintenance: deltas apply exactly, zeroed buckets vanish") {
    // the q268 shape: sketch(S0) + signed changelog deltas ≡ sketch(S1),
    // including a bucket whose count reaches zero and must DISAPPEAR
    val s0 = Seq(5L, 5L, 1234L, 77L).toDF("v")
    val s1vals = Seq(5L, 1234L, 900L) // delete one 5, delete 77, insert 900
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Long)] =
      df.agg(expr("qsketch_buckets(v)").as("sk"))
        .selectExpr("inline(sk)").as[(Int, Int, Long)].collect().toSet
    val base = rows(s0)
    val dels = rows(Seq(5L, 77L).toDF("v")).map { case (k, m, c) => (k, m, -c) }
    val ins = rows(Seq(900L).toDF("v"))
    val applied = (base ++ dels ++ ins).groupBy(x => (x._1, x._2))
      .map { case ((k, m), cs) => (k, m, cs.map(_._3).sum) }
      .filter(_._3 > 0).toSet
    assert(applied == rows(s1vals.toDF("v")))
    // the 77-bucket zeroed out and is absent from both sides
    assert(!applied.exists { case (k, m, _) => k == 0 && m == 77 })
  }

  test("quantile from buckets is within 1% relative of the true quantile") {
    val vs = (1 to 20000).map(i => ((i.toLong * 2654435761L) % 999983L).abs + 1L)
    val sorted = vs.sorted
    val sk = vs.toDF("v").agg(expr("qsketch_buckets(v)").as("sk"))
      .selectExpr("inline(sk)").as[(Int, Int, Long)].collect()
      .sortBy { case (k, m, _) => QuantileSketch.lowerBound(k.toLong * 1000 + m) }
    val n = vs.size.toLong
    for (p <- Seq(50, 90, 99)) {
      val r = (p * n + 99) / 100 // ceil rank
      var cum = 0L
      val est = sk.collectFirst {
        case (k, m, c) if { cum += c; cum >= r } =>
          QuantileSketch.lowerBound(k.toLong * 1000 + m)
      }.get
      val truth = sorted((r - 1).toInt)
      // est is the bucket lower bound of the rank-r value's bucket:
      // est ≤ truth < est + bucket width ≤ est·1.01 (k ≥ 1)
      assert(est <= truth && truth - est <= math.max(1L, truth / 100L),
        s"p$p: est=$est truth=$truth")
    }
  }
}
