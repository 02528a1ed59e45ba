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

  test("numeric profile: decimal-folded extremes and exact moments, DOUBLE output") {
    val df = Seq(
      (Some(2.0), 10.0), (Some(4.0), 10.0), (None, 10.0), (Some(6.0), 10.0))
      .toDF("x", "c")
    val prof = Profile.numericProfile(df, Seq("x", "c")).orderBy("col_name")
    // output convention: the decimal fold stays internal; every emitted
    // statistic column is DOUBLE (engine-side DECIMAL can't hash-match)
    import org.apache.spark.sql.types.{DoubleType, DecimalType}
    assert(!prof.schema.fields.exists(_.dataType.isInstanceOf[DecimalType]))
    assert(Seq("min_d", "max_d", "sum_d", "sumsq_d")
      .forall(c => prof.schema(c).dataType == DoubleType))
    val out = prof.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val (cRow, xRow) = (out(0), out(1))
    assert(xRow._1 == "x" && xRow._2 == 3L && xRow._3 == 1L)
    assert(xRow._4 == 2.0 && xRow._5 == 6.0)
    assert(xRow._6 == 12.0)       // exact decimal sum, nulls skipped
    assert(xRow._7 == 56.0)       // Σx² of {2,4,6}
    assert(cRow._1 == "c" && cRow._2 == 4L && cRow._3 == 0L)
    assert(cRow._6 == 40.0 && cRow._7 == 400.0)
    // derived stats are exact from the moments: stddev²(x) = (56 − 144/3)/2 = 4
    val variance = (xRow._7 - math.pow(xRow._6, 2) / xRow._2) / (xRow._2 - 1)
    assert(variance == 4.0)
  }

  test("array profile: nulls, NaN/Inf elements, ragged dims, norm stats") {
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),                       // normsq 25
      (2L, Some(Seq(1.0f, 2.0f, 2.0f))),                 // ragged dim, normsq 9
      (3L, None),                                        // null array
      (4L, Some(Seq(Float.NaN, 2.0f))),                  // NaN excluded from norm
      (5L, Some(Seq(Float.PositiveInfinity, 1.0f))),     // Inf excluded
      (6L, Some(Seq.empty[Float])))                      // empty -> normsq 0
      .toDF("id", "v")
    val r = Profile.arrayProfile(df, Seq("v")).collect()(0)
    assert(r.getString(0) == "v")
    assert(r.getLong(1) == 5L && r.getLong(2) == 1L)     // n_vals, n_nulls
    assert(r.getLong(3) == 9L)                           // n_elems
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L)     // n_nan, n_inf
    assert(r.getLong(6) == 3L)                           // distinct lengths {0,2,3}
    assert(r.getInt(7) == 0 && r.getInt(8) == 3)         // min/max dim
    assert(r.getDouble(9) == 0.0)                        // empty array's normsq
    assert(r.getDouble(10) == 25.0)
    // decimal-quantized fold, DOUBLE output (same convention as numericProfile)
    assert(r.getDouble(11) == 25.0 + 9.0 + 4.0 + 1.0 + 0.0)
  }

  test("grouped numeric profile: per-group moments match per-group filters") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 10.0), ("b", 20.0), ("b", 30.0))
      .toDF("g", "x")
    val out = Profile.numericProfileBy(df, "g", Seq("x"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(6), r.getDouble(7)))
    assert(out.map(_._1).toSeq == Seq("a", "b"))
    assert(out(0)._2 == 2L && out(0)._3 == 6.0 && out(0)._4 == 20.0)
    assert(out(1)._2 == 3L && out(1)._3 == 60.0 && out(1)._4 == 1400.0)
  }

  test("profile: injection-shaped column names are rejected") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException](Profile.profile(df, Seq("a', 1, 1, '', '')--")))
    intercept[IllegalArgumentException](Profile.numericProfile(df, Seq("a`b")))
    intercept[IllegalArgumentException](Profile.profile(df, Seq("a\nb")))
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

  test("histogram: dense bins, tail clamping, nulls excluded, grouped") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("a", Some(-5.0)), ("a", Some(0.0)), ("a", Some(9.9)), ("a", Some(10.0)),
      ("a", Some(45.0)), ("a", None), ("b", Some(25.0)))
      .toDF("g", "x")
    val out = Profile.histogram(df, "x", lo = 0.0, hi = 40.0, nBins = 4,
        groupCols = Seq("g"))
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    // every (group, bin) present; -5 clamps into bin 0, 45 into bin 3,
    // 10.0 lands in bin 1 (half-open bins), null excluded
    assert(out.toSeq == Seq(
      ("a", 0, 0.0, 10.0, 3L), ("a", 1, 10.0, 20.0, 1L),
      ("a", 2, 20.0, 30.0, 0L), ("a", 3, 30.0, 40.0, 1L),
      ("b", 0, 0.0, 10.0, 0L), ("b", 1, 10.0, 20.0, 0L),
      ("b", 2, 20.0, 30.0, 1L), ("b", 3, 30.0, 40.0, 0L)))
    // ungrouped: one dense row per bin over the union
    val flat = Profile.histogram(df, "x", 0.0, 40.0, 4)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(3)))
    assert(flat.toSeq == Seq((0, 3L), (1, 1L), (2, 1L), (3, 1L)))
    intercept[IllegalArgumentException](Profile.histogram(df, "x", 5.0, 5.0, 4))
    intercept[IllegalArgumentException](Profile.histogram(df, "x", 0.0, 1.0, 0))
  }

  test("histogram: huge/Inf values clamp (no int wrap), NaN excluded, NULL group kept") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some("g"), 1.8e11), (Some("g"), Double.PositiveInfinity),
      (Some("g"), Double.NegativeInfinity), (Some("g"), Double.NaN),
      (None: Option[String], 25.0))
      .toDF("s", "x")
    val out = Profile.histogram(df, "x", 0.0, 40.0, 4, groupCols = Seq("s"))
      .orderBy(asc_nulls_first("s"), col("bin")).collect()
      .map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(4)))
    assert(out.toSeq == Seq(
      (None, 0, 0L), (None, 1, 0L), (None, 2, 1L), (None, 3, 0L), // null group counted
      (Some("g"), 0, 1L),  // -Inf clamps low
      (Some("g"), 1, 0L), (Some("g"), 2, 0L),
      (Some("g"), 3, 2L))) // 1.8e11 and +Inf clamp high — never wrap
  }

  test("join-key diagnostics: skew, fan-out and domain mismatch all visible") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("lk")   // key 1 is hot
    val right = Seq(1L, 1L, 2L, 9L).toDF("rk")      // key 9 unmatched
    val out = Profile.joinKeyDiagnostics(left, "lk", right, "rk", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, 6L),   // hot key dominates output contribution
      (2L, 1L, 1L, 1L),
      (3L, 1L, 0L, 0L),   // left-only key: zero contribution, still visible
      (9L, 0L, 1L, 0L)))  // right-only key exposes the domain mismatch
  }

  test("histogram: a group column literally named with a dot resolves") {
    import org.apache.spark.sql.functions._
    val df = Seq(("u", 5.0), ("v", 15.0)).toDF("a.b", "x")
    val out = Profile.histogram(df, "x", 0.0, 20.0, 2, groupCols = Seq("a.b"))
      .orderBy(col("`a.b`"), col("bin")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(4)))
    assert(out.toSeq == Seq(("u", 0, 1L), ("u", 1, 0L), ("v", 0, 0L), ("v", 1, 1L)))
  }
}
