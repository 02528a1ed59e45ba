package graft.sources

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts and stringified extremes per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (None, Some("c")), (Some(2), Some("a")))
      .toDF("x", "s")
    val out = Profile.profile(df, Seq("x", "s")).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      ("s", 1L, 2L, "a", "c"),
      ("x", 1L, 2L, "1", "2")))
  }

  test("numeric profile: decimal extremes, exact sums, stddev") {
    val df = Seq(
      (Some(2.0), 10.0), (Some(4.0), 10.0), (None, 10.0), (Some(6.0), 10.0))
      .toDF("x", "c")
    val out = Profile.numericProfile(df, Seq("x", "c")).orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getDecimal(3), r.getDecimal(4), r.getDecimal(5)))
    val (cRow, xRow) = (out(0), out(1))
    assert(xRow._1 == "x" && xRow._2 == 1L)
    assert(xRow._3.doubleValue == 2.0 && xRow._4.doubleValue == 6.0)
    assert(xRow._5.doubleValue == 12.0)       // exact decimal sum, nulls skipped
    assert(xRow._6.doubleValue == 2.0)        // stddev_samp of {2,4,6}
    assert(cRow._1 == "c" && cRow._2 == 0L && cRow._5.doubleValue == 40.0)
    assert(cRow._6.doubleValue == 0.0)        // constant column
  }

  test("profile: the approximate variant keeps the schema and nears the counts") {
    val df = spark.range(1000).selectExpr("id", "id % 7 AS m")
    val exact = Profile.profile(df, Seq("id", "m")).orderBy("col_name").collect()
    val approx = Profile.profile(df, Seq("id", "m"), exact = false)
      .orderBy("col_name").collect()
    assert(exact.map(_.schema) sameElements approx.map(_.schema))
    // HLL within 5% on 1000 distincts; exact on 7
    val (ea, aa) = (exact.map(_.getLong(2)), approx.map(_.getLong(2)))
    assert(aa(1) == ea(1)) // m: 7 distinct, sketch exact at tiny cardinality
    assert(math.abs(aa(0) - ea(0)).toDouble / ea(0) < 0.05)
  }
}
