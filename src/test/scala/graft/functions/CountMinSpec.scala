package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  import spark.implicits._

  test("never underestimates; exact when collision-free; 0 for unseen") {
    val keys = Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)
    val df = keys.toDF("k")
    val cells = CountMin.table(df, col("k"), width = 64)
    val probe = Seq(1L, 2L, 3L, 99L).toDF("k")
    val est = CountMin.estimates(cells, probe, "k", width = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 keys in a 64-wide row: the pinned hashes are collision-free here
    assert(est == Map(1L -> 5L, 2L -> 3L, 3L -> 1L, 99L -> 0L))
    val exact = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((k, e) <- est if k != 99L) assert(e >= exact(k))
  }

  test("overestimate is bounded and one-sided under forced collisions") {
    // 500 distinct keys into width 16: heavy collisions by construction
    val df = (0L until 2000L).map(i => i % 500L).toDF("k")
    val cells = CountMin.table(df, col("k"), width = 16)
    val probe = (0L until 500L).toDF("k")
    val est = CountMin.estimates(cells, probe, "k", width = 16)
    val joined = est.join(df.groupBy("k").count(), "k")
      .select(col("k"), col("est"), col("count")).collect()
    val n = 2000L
    for (r <- joined) {
      val (e, t) = (r.getLong(1), r.getLong(2))
      assert(e >= t, s"underestimate at key ${r.getLong(0)}")
      // ε = e/width ≈ 0.17 → bound 0.17·N ≈ 340; depth 4 makes a breach
      // astronomically unlikely with these pinned hashes (deterministic
      // here: this is a regression pin, not a probabilistic claim)
      assert(e - t <= (math.E / 16 * n).toLong, s"bound breached at ${r.getLong(0)}")
    }
  }

  test("join-size estimate: exact when collision-free, never below truth") {
    // groups A/B over a small key set inside a 64-wide row: inner
    // products see no collisions, so est == Σ_k fA(k)·fB(k) exactly
    val rows = Seq.fill(4)(("A", 1L)) ++ Seq.fill(2)(("A", 2L)) ++
      Seq(("A", 3L)) ++
      Seq.fill(3)(("B", 1L)) ++ Seq.fill(5)(("B", 2L)) ++ Seq(("B", 7L)) ++
      Seq.fill(2)(("C", 9L)) // C shares no key with A or B
    val df = rows.toDF("g", "k")
    val cells = CountMin.tableBy(df, col("g"), col("k"), width = 64)
    val est = CountMin.joinSizes(cells).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // |A ⋈ B| = 4·3 + 2·5 = 22; C is disjoint — at width 64 the pinned
    // hashes put C's key in its own bucket in every depth row, so the
    // zero inner products drive the min to exactly 0 (a disjoint pair
    // REPORTS est_join = 0 rather than vanishing — the join-planner
    // consumer gets a row for every pair)
    assert(est(("A", "B")) == 22L)
    assert(est(("A", "C")) == 0L && est(("B", "C")) == 0L)
    // forced collisions (width 2): still one-sided
    val cells2 = CountMin.tableBy(df, col("g"), col("k"), width = 2)
    val est2 = CountMin.joinSizes(cells2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est2(("A", "B")) >= 22L)
  }

  test("sketches merge by adding cells") {
    val a = (0L until 100L).map(_ % 7L).toDF("k")
    val b = (0L until 50L).map(_ % 5L).toDF("k")
    val merged = CountMin.table(a.union(b), col("k"), width = 32)
    val added = CountMin.table(a, col("k"), width = 32)
      .union(CountMin.table(b, col("k"), width = 32))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val s = added.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == s)
  }
}
