package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val intervals = Tables(spark, sf0001, "part").select(
    col("p_partkey").as("band_id"),
    (col("p_partkey") * 2.0).as("lo"),
    (col("p_partkey") * 2.0 + 1 + pmod(col("p_partkey"), lit(7L))).as("hi"))

  private lazy val points = Tables(spark, sf0001, "events").select("event_id", "value")

  test("binned range join equals the naive theta join on fixture data") {
    val binned = RangeJoin.pointInInterval(points, "value", intervals, "lo", "hi", 8.0)
      .select("event_id", "band_id")
    val naive = points.join(intervals,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "band_id")
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
  }

  test("bin width does not change the result set") {
    val a = RangeJoin.pointInInterval(points, "value", intervals, "lo", "hi", 1.5)
      .select("event_id", "band_id")
    val b = RangeJoin.pointInInterval(points, "value", intervals, "lo", "hi", 64.0)
      .select("event_id", "band_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("half-open semantics: lo included, hi excluded; wide intervals and negatives work") {
    val p = Seq((1L, -3.0), (2L, 0.0), (3L, 10.0), (4L, 9.999), (5L, 250.0))
      .toDF("id", "v")
    val i = Seq((100L, -5.0, 0.0), (200L, 0.0, 10.0), (300L, -100.0, 1000.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "v", i, "lo", "hi", 7.0)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 100L), (1L, 300L),            // -3 in [-5,0) and the wide band
      (2L, 200L), (2L, 300L),            // 0 excluded from [-5,0), included in [0,10)
      (4L, 200L), (4L, 300L),            // 9.999 < 10
      (3L, 300L), (5L, 300L)))           // 10 excluded from [0,10)
  }

  test("degenerate whole-range intervals route through the broadcast side path") {
    val p = Seq.tabulate(50)(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val i = Seq(
      (1L, 10.0, 12.0),        // narrow: 1-2 bins at width 4
      (2L, -1e6, 1e6),         // degenerate: would explode to 500k bins
      (3L, 20.0, 21.0)
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, "v", i, "lo", "hi", 4.0,
      wideBinThreshold = 16)
    val naive = p.join(i, col("v") >= col("lo") && col("v") < col("hi"))
    assert(out.count() == naive.count())
    assert(out.select("id", "iid").exceptAll(naive.select("id", "iid")).count() == 0)
    // the wide interval matched every point via broadcast, not via explode
    assert(out.filter(col("iid") === 2L).count() == 50)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "wide side must take the broadcast path\n" + plan)
  }

  test("a violated maxSpan hint fails loudly; a truthful one changes nothing") {
    // the hint is a DATA CONTRACT: a wider-than-declared interval raises a
    // descriptive error from inside the scan — never silently dropped rows,
    // never the unbounded bin explosion a whole-domain interval would cause
    // once the broadcast escape hatch is compiled out
    val p = Seq.tabulate(50)(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val i = Seq((1L, 10.0, 12.0), (2L, -300.0, 300.0), (3L, 20.0, 21.0))
      .toDF("iid", "lo", "hi")
    def chainMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val lying = RangeJoin.pointInInterval(p, "v", i, "lo", "hi", 4.0,
      wideBinThreshold = 16, maxSpan = 2.0) // lie: real max span is 600
    val err = intercept[Exception](lying.count())
    assert(chainMessages(err).contains("maxSpan"),
      s"expected the maxSpan contract error, got: ${chainMessages(err)}")
    val overlapLying = RangeJoin.intervalOverlap(
        i.select(col("iid").as("id_a"), col("lo").as("lo_a"), col("hi").as("hi_a")),
        "lo_a", "hi_a",
        i.select(col("iid").as("id_b"), col("lo").as("lo_b"), col("hi").as("hi_b")),
        "lo_b", "hi_b", 4.0, wideBinThreshold = 16,
        maxSpanA = 2.0, maxSpanB = 2.0)
    val err2 = intercept[Exception](overlapLying.count())
    assert(chainMessages(err2).contains("maxSpan"))
    // a truthful hint is invisible: identical rows to the naive join, and
    // NULL-bounds rows still drop silently (the object's NULL semantics)
    // instead of tripping the contract guard
    val withNull = i.filter(col("iid") =!= 2L).unionByName(
      Seq((9L, Option.empty[Double], Option(5.0))).toDF("iid", "lo", "hi"))
    val honest = RangeJoin.pointInInterval(p, "v",
        withNull, "lo", "hi", 4.0,
        wideBinThreshold = 16, maxSpan = 2.0)
    val naive = p.join(i.filter(col("iid") =!= 2L),
      col("v") >= col("lo") && col("v") < col("hi"))
    assert(honest.count() == naive.count())
    assert(honest.select("id", "iid").exceptAll(naive.select("id", "iid")).count() == 0)
  }

  test("interval overlap equals the naive join, exactly once per pair") {
    val a = Tables(spark, sf0001, "part").select(
      col("p_partkey").as("id_a"),
      (col("p_partkey") * 2.0).as("lo_a"),
      (col("p_partkey") * 2.0 + 1 + pmod(col("p_partkey"), lit(7L))).as("hi_a"))
    val b = Tables(spark, sf0001, "supplier").select(
      col("s_suppkey").as("id_b"),
      (col("s_suppkey") * 19.0).as("lo_b"),
      (col("s_suppkey") * 19.0 + 5 + pmod(col("s_suppkey"), lit(23L))).as("hi_b"))
    val naive = a.join(b, col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
      .select("id_a", "id_b")
    for (w <- Seq(3.0, 16.0, 200.0)) {
      val binned = RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", w)
        .select("id_a", "id_b")
      // set-equal AND multiplicity-equal: the first-shared-bin rule emits
      // each overlapping pair exactly once, no distinct needed
      assert(binned.count() == naive.count(), s"width $w")
      assert(binned.exceptAll(naive).count() == 0, s"width $w")
      assert(naive.exceptAll(binned).count() == 0, s"width $w")
    }
    assert(naive.count() > 0)
  }

  test("interval overlap: a degenerate whole-range interval routes via broadcast") {
    val a = Seq((1L, 0.0, 8.0), (2L, -1e6, 1e6)).toDF("id_a", "lo_a", "hi_a")
    val b = Seq((10L, 4.0, 6.0), (20L, 500.0, 501.0)).toDF("id_b", "lo_b", "hi_b")
    val got = RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", 4.0,
      wideBinThreshold = 16)
    val naive = a.join(b, col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
    assert(got.count() == naive.count()) // exactly-once across the 3-way split
    assert(got.select("id_a", "id_b").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("interval overlap handles touching and nested intervals") {
    val a = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0)).toDF("id_a", "lo_a", "hi_a")
    val b = Seq(
      (10L, 10.0, 20.0),  // touches a1's hi: half-open => NO overlap
      (20L, 9.999, 10.0), // just inside a1
      (30L, 2.0, 3.0),    // nested in a1
      (40L, -5.0, 50.0)   // covers both
    ).toDF("id_b", "lo_b", "hi_b")
    val got = RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", 4.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 20L), (1L, 30L), (1L, 40L), (2L, 40L)))
  }

  test("property: random intervals and points match the naive join at random widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic sampled forAll — the scalatest↔scalacheck bridge isn't
    // in the offline cache (PropertySpec convention)
    val pointsGen = Gen.listOfN(40, Gen.chooseNum(-500.0, 500.0))
    val intervalGen = Gen.listOfN(15, for {
      lo <- Gen.chooseNum(-600.0, 550.0)
      s <- Gen.oneOf(Gen.chooseNum(0.0, 40.0), Gen.chooseNum(500.0, 2000.0))
    } yield (lo, lo + s))
    val widthGen = Gen.oneOf(0.7, 8.0, 64.0)
    val caseGen = Gen.zip(pointsGen, intervalGen, widthGen)
    (0 until 8).foreach { i =>
      caseGen(Gen.Parameters.default, Seed(1000L + i)).foreach {
        case (ps, is, w) =>
          val p = ps.zipWithIndex.map { case (v, id) => (id.toLong, v) }.toDF("id", "v")
          val iv = is.zipWithIndex.map { case ((lo, hi), id) => (id.toLong, lo, hi) }
            .toDF("iid", "lo", "hi")
          val naive = p.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
            .select("id", "iid")
          // low threshold so the wide/narrow split is exercised by the
          // bimodal span generator
          val binned = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", w,
            wideBinThreshold = 8).select("id", "iid")
          assert(binned.count() == naive.count(), s"case $i width $w")
          assert(binned.exceptAll(naive).count() == 0, s"case $i width $w")
          assert(naive.exceptAll(binned).count() == 0, s"case $i width $w")
      }
    }
  }

  test("property: random interval-overlap matches naive with exact multiplicity") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ivGen = (n: Int) => Gen.listOfN(n, for {
      lo <- Gen.chooseNum(-300.0, 300.0)
      s <- Gen.oneOf(Gen.chooseNum(0.0, 30.0), Gen.chooseNum(400.0, 900.0))
    } yield (lo, lo + s))
    (0 until 8).foreach { i =>
      Gen.zip(ivGen(12), ivGen(12))(Gen.Parameters.default, Seed(2000L + i)).foreach {
        case (as, bs) =>
          val a = as.zipWithIndex.map { case ((lo, hi), id) => (id.toLong, lo, hi) }
            .toDF("id_a", "lo_a", "hi_a")
          val b = bs.zipWithIndex.map { case ((lo, hi), id) => (id.toLong, lo, hi) }
            .toDF("id_b", "lo_b", "hi_b")
          val naive = a.join(b, col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
            .select("id_a", "id_b")
          val binned = RangeJoin.intervalOverlap(
              a, "lo_a", "hi_a", b, "lo_b", "hi_b", 16.0, wideBinThreshold = 8)
            .select("id_a", "id_b")
          assert(binned.count() == naive.count(), s"case $i multiplicity")
          assert(binned.exceptAll(naive).count() == 0, s"case $i")
          assert(naive.exceptAll(binned).count() == 0, s"case $i")
      }
    }
  }

  test("the plan is an equi-join: no nested-loop or cartesian node") {
    // the maxSpan hint proves the wide side empty at CONSTRUCTION time,
    // with no data scan — fixture spans are 1 + (key mod 7) <= 8
    val hinted = RangeJoin.pointInInterval(points, "value", intervals, "lo", "hi", 8.0,
      maxSpan = 8.0)
    val plan = hinted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the naive formulation, for contrast, degenerates to a nested loop
    val naive = points.join(intervals,
        col("value") >= col("lo") && col("value") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"))
  }
}
