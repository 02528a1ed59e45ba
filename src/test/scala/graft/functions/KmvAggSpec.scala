package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvAggSpec extends SparkSpec {

  import spark.implicits._

  private def kmv(values: Seq[Long], k: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    values.toDF("h").agg(expr(s"kmv_minhashes(h, $k)").as("kmv"))
      .collect().head.getSeq[Long](0)
  }

  test("keeps the k smallest distinct values, sorted ascending") {
    assert(kmv(Seq(50L, 10L, 40L, 30L, 20L, 60L), 3) == Seq(10L, 20L, 30L))
  }

  test("duplicates collapse: KMV is a distinct sketch") {
    assert(kmv(Seq(5L, 5L, 5L, 7L, 7L, 9L), 3) == Seq(5L, 7L, 9L))
    assert(kmv(Seq(5L, 5L, 5L), 3) == Seq(5L))
  }

  test("fewer than k distinct values → all of them (exact regime)") {
    assert(kmv(Seq(3L, 1L, 2L), 64) == Seq(1L, 2L, 3L))
  }

  test("nulls are skipped; empty input yields an empty array") {
    GraftFunctions.register(spark)
    val withNull = Seq(Some(4L), None, Some(2L)).toDF("h")
      .agg(expr("kmv_minhashes(h, 8)")).collect().head.getSeq[Long](0)
    assert(withNull == Seq(2L, 4L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(expr("kmv_minhashes(h, 8)")).collect().head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("partial merges agree with the single-partition result") {
    GraftFunctions.register(spark)
    val vals = (1L to 1000L).map(i => (i * 7919L) % 1001L)
    val one = vals.toDF("h").coalesce(1)
      .agg(expr("kmv_minhashes(h, 16)")).collect().head.getSeq[Long](0)
    val many = vals.toDF("h").repartition(13)
      .agg(expr("kmv_minhashes(h, 16)")).collect().head.getSeq[Long](0)
    assert(one == many)
  }
}
